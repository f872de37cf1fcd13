"""Lane-last engine parity: register-style step vs the generic engine.

The lane engine (dynamics/lanes.py) re-implements the smooth pipeline with
the batch axis minormost; these tests pin it to the generic step.py path
(itself oracle-exact vs MuJoCo on smooth systems, tests/test_dynamics_oracle)
to f64 round-off."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajoptkp_tpu.dynamics import step_state
from trajoptkp_tpu.dynamics.lanes import build_smooth_step, lanes_supported
from trajoptkp_tpu.tasks.toys import make_acrobot, make_pentabot


def test_lane_gate_rejects_unsupported_models():
    """Flex soft bodies stay outside lane scope (generic engine path)."""
    from trajoptkp_tpu.tasks.soft import make_push_soft

    task = make_push_soft(dtype=jnp.float64)
    assert not lanes_supported(task.model)


@pytest.mark.parametrize("make", [make_acrobot, make_pentabot])
def test_lane_step_matches_generic(make):
    task = make(dtype=jnp.float64)
    model = task.model
    assert lanes_supported(model)
    step_l = build_smooth_step(model)

    rng = np.random.default_rng(0)
    L = 16
    qp = jnp.asarray(rng.standard_normal((model.nq, L)))
    qv = jnp.asarray(0.5 * rng.standard_normal((model.nv, L)))
    ct = jnp.asarray(2.0 * rng.standard_normal((model.nu, L)))

    qp2, qv2 = jax.jit(step_l)(qp, qv, ct)

    ref = jax.vmap(
        lambda a, b, c: step_state(model, a, b, c), in_axes=1, out_axes=1
    )(qp, qv, ct)
    np.testing.assert_allclose(np.asarray(qp2), np.asarray(ref[0]),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(qv2), np.asarray(ref[1]),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.slow
def test_lane_step_matches_generic_push_contacts():
    """Panda push (free joint + plane/cylinder + cylinder/cylinder contacts
    + limits): the full lane constraint pipeline vs the generic engine on
    contact-active states from a driven rollout."""
    from trajoptkp_tpu.config.loader import make_task

    task = make_task("pushing_no_clutter", dtype=jnp.float64)
    model = task.model
    assert lanes_supported(model)
    step_l = build_smooth_step(model)

    gstep = jax.jit(lambda a, b, c: step_state(model, a, b, c))
    rng = np.random.default_rng(0)
    u_seq = 0.3 * rng.standard_normal((60, model.nu))
    qp_, qv_ = task.qpos_start, task.qvel_start
    states = []
    for t in range(60):
        if t % 10 == 0 or t > 54:
            states.append((np.asarray(qp_), np.asarray(qv_), u_seq[t]))
        qp_, qv_ = gstep(qp_, qv_, jnp.asarray(u_seq[t]))
    qp = jnp.asarray(np.stack([s[0] for s in states], axis=1))
    qv = jnp.asarray(np.stack([s[1] for s in states], axis=1))
    ct = jnp.asarray(np.stack([s[2] for s in states], axis=1))
    qp2, qv2 = jax.jit(step_l)(qp, qv, ct)
    ref = jax.vmap(
        lambda a, b, c: step_state(model, a, b, c), in_axes=1, out_axes=1
    )(qp, qv, ct)
    np.testing.assert_allclose(np.asarray(qp2), np.asarray(ref[0]),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(qv2), np.asarray(ref[1]),
                               rtol=1e-8, atol=1e-9)


@pytest.mark.slow
def test_lane_step_matches_generic_with_limits():
    """Reaching (panda, 7 limited hinges): the lane engine's joint-limit
    projected-Newton solve must reproduce the generic constraint path."""
    from trajoptkp_tpu.tasks.reaching import make_reaching

    task = make_reaching(dtype=jnp.float64)
    model = task.model
    assert lanes_supported(model)
    step_l = build_smooth_step(model)

    rng = np.random.default_rng(2)
    L = 8
    lo = np.asarray(model.jnt_range)[:, 0]
    hi = np.asarray(model.jnt_range)[:, 1]
    # half the lanes near the limits (constraints active), half interior
    qp = np.empty((model.nq, L))
    qp[:, : L // 2] = (lo + 0.02 * (hi - lo))[:, None] + 0.01 * \
        rng.standard_normal((model.nq, L // 2))
    qp[:, L // 2 :] = (0.5 * (lo + hi))[:, None] + 0.3 * \
        rng.standard_normal((model.nq, L - L // 2))
    qv = 0.5 * rng.standard_normal((model.nv, L))
    ct = 2.0 * rng.standard_normal((model.nu, L))

    qp2, qv2 = jax.jit(step_l)(
        jnp.asarray(qp), jnp.asarray(qv), jnp.asarray(ct)
    )
    ref = jax.vmap(
        lambda a, b, c: step_state(model, a, b, c), in_axes=1, out_axes=1
    )(jnp.asarray(qp), jnp.asarray(qv), jnp.asarray(ct))
    np.testing.assert_allclose(np.asarray(qp2), np.asarray(ref[0]),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(qv2), np.asarray(ref[1]),
                               rtol=1e-9, atol=1e-11)


def test_lane_step_jacobian_matches_ad():
    """jacfwd through the lane step == the generic engine's AD Jacobian."""
    from trajoptkp_tpu.derivs import jobs_from_mask, keypoint_jacobians
    from trajoptkp_tpu.state import full_state_vector

    task = make_acrobot(dtype=jnp.float64)
    model = task.model
    sv = full_state_vector(model)
    step_l = build_smooth_step(model)
    rng = np.random.default_rng(1)
    qp = jnp.asarray(rng.standard_normal((model.nq,)))
    qv = jnp.asarray(0.5 * rng.standard_normal((model.nv,)))
    ct = jnp.asarray(rng.standard_normal((model.nu,)))

    n = sv.ndof

    def g(z):
        dq = z[:n]
        dv = z[n : 2 * n]
        du = z[2 * n :]
        qp2, qv2 = step_l(
            (qp + dq)[:, None], (qv + dv)[:, None], (ct + du)[:, None]
        )
        return jnp.concatenate([qp2[:, 0], qv2[:, 0]])

    J = jax.jacfwd(g)(jnp.zeros((2 * n + model.nu,)))

    mask = jnp.ones((1, n), dtype=bool)
    jobs = jobs_from_mask(mask, n)
    A, B, _ = keypoint_jacobians(
        model, sv, qp[None], qv[None], ct[None], jobs, mode="ad"
    )
    np.testing.assert_allclose(np.asarray(J[:, : 2 * n]), np.asarray(A[0]),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(J[:, 2 * n :]), np.asarray(B[0]),
                               rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("maker", ["threed_push", "box_sweep"])
def test_lane_step_matches_generic_box_contacts(maker):
    """Box-vs-primitive lane colliders (plane-box 4-deepest-corner manifold,
    cylinder-box endpoint probes) vs the generic engine on contact-active
    states from a driven rollout — the threeD_push / box_sweep families
    (VERDICT r3 #10)."""
    from trajoptkp_tpu.tasks.manipulation import (make_box_sweep,
                                                  make_threed_push)

    make = make_threed_push if maker == "threed_push" else make_box_sweep
    task = make(dtype=jnp.float64)
    model = task.model
    assert lanes_supported(model)
    step_l = build_smooth_step(model)

    gstep = jax.jit(lambda a, b, c: step_state(model, a, b, c))
    rng = np.random.default_rng(3)
    u_seq = 0.4 * rng.standard_normal((50, model.nu))
    qp_, qv_ = task.qpos_start, task.qvel_start
    states = []
    for t in range(50):
        if t % 10 == 0 or t > 45:
            states.append((np.asarray(qp_), np.asarray(qv_), u_seq[t]))
        qp_, qv_ = gstep(qp_, qv_, jnp.asarray(u_seq[t]))
    # add a tilted-box state: roll the free-joint quaternion 20 degrees so
    # only 2 corners penetrate (the tilt regime of tests/test_box_tilt.py)
    qp_t = np.asarray(task.qpos_start).copy()
    free_j = [j for j, t_ in enumerate(np.asarray(model.jnt_type))
              if int(t_) == 0]
    qadr = int(np.asarray(model.jnt_qposadr)[free_j[0]])
    a = np.deg2rad(20.0) / 2
    qp_t[qadr + 3 : qadr + 7] = [np.cos(a), np.sin(a), 0, 0]
    states.append((qp_t, np.asarray(task.qvel_start), u_seq[0]))

    qp = jnp.asarray(np.stack([s[0] for s in states], axis=1))
    qv = jnp.asarray(np.stack([s[1] for s in states], axis=1))
    ct = jnp.asarray(np.stack([s[2] for s in states], axis=1))
    qp2, qv2 = jax.jit(step_l)(qp, qv, ct)
    ref = jax.vmap(
        lambda a_, b_, c_: step_state(model, a_, b_, c_),
        in_axes=1, out_axes=1,
    )(qp, qv, ct)
    # tolerance: the 4-deepest-corner selection (sorting network here,
    # argsort in collision.plane_box) sums contact rows in a different
    # order — ~1e-7 f64 reassociation noise through the Newton solve
    np.testing.assert_allclose(np.asarray(qp2), np.asarray(ref[0]),
                               rtol=3e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(qv2), np.asarray(ref[1]),
                               rtol=3e-6, atol=1e-7)


@pytest.mark.slow
def test_lane_contact_jacobian_matches_generic_implicit():
    """Lane jacfwd at CONTACT-ACTIVE panda push states == the generic
    engine's implicit-AD Jacobians (keypoint_jacobians mode="ad").  Both
    engines differentiate the constraint solve with the implicit-function
    rule at the converged point (contact._newton_solver;
    lanes._solve_rows_x custom_jvp), so the agreement here pins the lane
    implicit tangent — the round-5 replacement for forward-mode through the
    Newton scan."""
    from trajoptkp_tpu.config.loader import make_task
    from trajoptkp_tpu.derivs import jobs_from_mask, keypoint_jacobians

    task = make_task("pushing_no_clutter", dtype=jnp.float64)
    model, sv = task.model, task.sv
    step_l = build_smooth_step(model)
    n = sv.ndof

    gstep = jax.jit(lambda a, b, c: step_state(model, a, b, c))
    rng = np.random.default_rng(0)
    u_seq = 0.3 * rng.standard_normal((60, model.nu))
    qp_, qv_ = task.qpos_start, task.qvel_start
    states = []
    for t in range(60):
        if t in (0, 30, 55, 58):  # free flight + contact-active tail
            states.append((np.asarray(qp_), np.asarray(qv_), u_seq[t]))
        qp_, qv_ = gstep(qp_, qv_, jnp.asarray(u_seq[t]))

    from trajoptkp_tpu.dynamics.lanes import build_tangent_ops
    tangent_apply, tangent_diff = build_tangent_ops(model)
    order = jnp.array([int(i) for i in sv.order])

    for qp_np, qv_np, u_np in states:
        qp = jnp.asarray(qp_np)[:, None]
        qv = jnp.asarray(qv_np)[:, None]
        ct = jnp.asarray(u_np)[:, None]
        qp_nom, qv_nom = step_l(qp, qv, ct)

        def g(z):
            dq = jnp.zeros((model.nv, 1), qp.dtype).at[order, 0].set(z[:n])
            dv = jnp.zeros((model.nv, 1), qp.dtype).at[order, 0].set(
                z[n : 2 * n]
            )
            qp2, qv2 = step_l(
                tangent_apply(qp, dq), qv + dv, ct + z[2 * n :][:, None]
            )
            dpos = tangent_diff(qp_nom, qp2)[order, 0]
            dvel = (qv2 - qv_nom)[order, 0]
            return jnp.concatenate([dpos, dvel])

        J = jax.jacfwd(g)(jnp.zeros((2 * n + model.nu,)))

        mask = jnp.ones((1, n), dtype=bool)
        jobs = jobs_from_mask(mask, n)
        A, B, _ = keypoint_jacobians(
            model, sv, qp[:, 0][None], qv[:, 0][None], ct[:, 0][None],
            jobs, mode="ad",
        )
        np.testing.assert_allclose(
            np.asarray(J[:, : 2 * n]), np.asarray(A[0]),
            rtol=1e-6, atol=1e-8,
        )
        np.testing.assert_allclose(
            np.asarray(J[:, 2 * n :]), np.asarray(B[0]),
            rtol=1e-6, atol=1e-8,
        )
