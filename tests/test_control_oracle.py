"""Control-sequence equivalence vs a MuJoCo-stepped oracle iLQR.

The BASELINE.json acceptance criterion: at the same horizon + keypoint
schedule, the framework's optimised control sequence must match a trusted
re-implementation whose DYNAMICS come from MuJoCo itself (mj_step rollouts,
mjd_transitionFD Jacobians) while the OPTIMISER algebra (Riccati backward
pass, lambda schedule, (i/6)^2 line search, interpolation) is the repo's
own.  Any systematic dynamics or interpolation discrepancy shows up as
control divergence here; agreement certifies the whole pipeline end-to-end
on the reference's saved scene (TestTasks/acrobot/0.csv).

Pattern per `/root/reference/src/tests/Derivs_Test.cpp:12-122` (oracle
comparison), extended from Jacobians to full control sequences.
"""

import os

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from trajoptkp_tpu.config.loader import load_scenes_for_task
from trajoptkp_tpu.keypoints.interpolate import interpolate_derivatives
from trajoptkp_tpu.solver.ilqr import (ILQRConfig, backward_pass_lambda_loop,
                                       default_alphas, optimise)
from trajoptkp_tpu.tasks.base import (control_limits, cost_derivatives_gn,
                                      residual_derivatives)
from trajoptkp_tpu.tasks.toys import make_acrobot

pytestmark = pytest.mark.slow

_XML = os.path.join(
    os.path.dirname(__file__), "..", "trajoptkp_tpu", "models", "acrobot.xml"
)


def _mj_rollout(mjm, mjd, task, qpos0, qvel0, U):
    """mj_step rollout collecting states + our residual costs."""
    H = U.shape[0]
    mujoco.mj_resetData(mjm, mjd)
    mjd.qpos[:] = qpos0
    mjd.qvel[:] = qvel0
    qps = np.zeros((H + 1, mjm.nq))
    qvs = np.zeros((H + 1, mjm.nv))
    costs = np.zeros(H)
    w = np.asarray(task.weights)
    wt = np.asarray(task.weights_terminal)
    tg = np.asarray(task.residual_targets)
    for t in range(H):
        qps[t] = mjd.qpos
        qvs[t] = mjd.qvel
        r = np.concatenate([
            mjd.qpos[:2] - tg[:2], mjd.qvel[:2] - tg[2:4], U[t] - tg[4:5],
        ])
        ww = wt if t == H - 1 else w
        costs[t] = float(np.sum(ww * r * r))
        mjd.ctrl[:] = U[t]
        mujoco.mj_step(mjm, mjd)
    qps[H] = mjd.qpos
    qvs[H] = mjd.qvel
    return qps, qvs, costs


def _mj_AB(mjm, mjd, qpos, qvel, ctrl):
    A = np.zeros((2 * mjm.nv, 2 * mjm.nv))
    B = np.zeros((2 * mjm.nv, mjm.nu))
    mjd.qpos[:] = qpos
    mjd.qvel[:] = qvel
    mjd.ctrl[:] = ctrl
    mujoco.mjd_transitionFD(mjm, mjd, 1e-6, 1, A, B, None, None)
    return A, B


def test_control_sequence_matches_mujoco_oracle():
    task = make_acrobot(dtype=jnp.float64)
    task = task.replace(
        keypoint_cfg=task.keypoint_cfg.replace(name="set_interval", min_N=5)
    )
    H, n_iter = 100, 5
    qpos, qvel, targets = load_scenes_for_task(
        task, "/root/reference/TestTasks/acrobot", 1
    )
    task = task.replace(residual_targets=jnp.asarray(targets[0]))
    qpos0, qvel0 = qpos[0], qvel[0]
    cfg = ILQRConfig(max_iterations=n_iter, min_iterations=n_iter,
                     deriv_mode="fd")

    # ---- ours
    U0 = jnp.zeros((H, task.model.nu), jnp.float64)
    traj, stats = optimise(task, qpos0, qvel0, U0, cfg)
    U_ours = np.asarray(traj.ctrl)

    # ---- oracle: MuJoCo dynamics + the repo's optimiser algebra
    mjm = mujoco.MjModel.from_xml_path(_XML)
    mjd = mujoco.MjData(mjm)
    alphas = np.asarray(default_alphas(cfg.num_parallel_rollouts))
    lims = np.asarray(control_limits(task))
    kp_ts = np.array(sorted(set(range(0, H - 1, 5)) | {H - 1}))
    mask = np.zeros((H, 2), bool)
    mask[kp_ts] = True

    U = np.zeros((H, mjm.nu))
    qps, qvs, costs = _mj_rollout(mjm, mjd, task, qpos0, qvel0, U)
    old_cost = costs.sum()
    lamb = jnp.asarray(cfg.lambda_init)
    bp = jax.jit(
        lambda A, B, lx, lxx, lu, luu, lm: backward_pass_lambda_loop(
            A, B, lx, lxx, lu, luu, lm, cfg
        )
    )
    for _ in range(n_iter):
        A_kp = np.zeros((H, 4, 4))
        B_kp = np.zeros((H, 4, 1))
        for t in kp_ts:
            A_kp[t], B_kp[t] = _mj_AB(mjm, mjd, qps[t], qvs[t], U[t])
        A, Bm = interpolate_derivatives(
            jnp.asarray(A_kp), jnp.asarray(B_kp), jnp.asarray(mask), 1
        )
        r, r_x, r_u = jax.vmap(
            lambda qp, qv, u: residual_derivatives(task, qp, qv, u)
        )(jnp.asarray(qps[:H]), jnp.asarray(qvs[:H]), jnp.asarray(U))
        terminal = jnp.arange(H) == H - 1
        l_x, l_xx, l_u, l_uu = jax.vmap(
            lambda rr, rx, ru, tm: cost_derivatives_gn(task, rr, rx, ru, tm)
        )(r, r_x, r_u, terminal)
        k, K, dJ, lamb, lam_exit = bp(A, Bm, l_x, l_xx, l_u, l_uu, lamb)
        assert not bool(lam_exit)
        k = np.asarray(k)
        K = np.asarray(K)

        # line search with mj_step rollouts (ForwardsPassParallel semantics)
        best_cost, best = np.inf, None
        for a in alphas:
            mujoco.mj_resetData(mjm, mjd)
            mjd.qpos[:] = qpos0
            mjd.qvel[:] = qvel0
            Unew = np.zeros_like(U)
            total = 0.0
            w = np.asarray(task.weights)
            wt = np.asarray(task.weights_terminal)
            tg = np.asarray(task.residual_targets)
            for t in range(H):
                dx = np.concatenate([
                    mjd.qpos - qps[t], mjd.qvel - qvs[t]
                ])
                u = U[t] + a * k[t] + K[t] @ dx
                u = np.clip(u, lims[:, 0], lims[:, 1])
                Unew[t] = u
                r = np.concatenate([
                    mjd.qpos[:2] - tg[:2], mjd.qvel[:2] - tg[2:4],
                    u - tg[4:5],
                ])
                ww = wt if t == H - 1 else w
                total += float(np.sum(ww * r * r))
                mjd.ctrl[:] = u
                mujoco.mj_step(mjm, mjd)
            if total < best_cost:
                best_cost, best = total, Unew
        if best_cost < old_cost:
            U = best
            qps, qvs, costs = _mj_rollout(mjm, mjd, task, qpos0, qvel0, U)
            old_cost = costs.sum()
        else:
            lamb = jnp.clip(
                lamb * cfg.lambda_factor**2, cfg.min_lambda, cfg.max_lambda
            )

    # same scene, same schedule, dynamics agreeing to ~1e-10 -> control
    # tapes should agree to FD / line-search noise, far below control scale
    scale = max(1.0, np.max(np.abs(U)))
    np.testing.assert_allclose(
        U_ours, U, atol=5e-3 * scale,
        err_msg="optimised control sequence vs MuJoCo-stepped oracle iLQR",
    )
