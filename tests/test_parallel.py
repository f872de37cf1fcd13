"""Mesh / sharding tests on 8 virtual CPU devices (SURVEY §4: the standard
way to test collective code without a pod)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajoptkp_tpu.derivs import jobs_from_mask, keypoint_jacobians
from trajoptkp_tpu.parallel.mesh import make_batch_optimise, make_mesh
from trajoptkp_tpu.parallel.shard import sharded_keypoint_jacobians
from trajoptkp_tpu.solver import ilqr as il
from trajoptkp_tpu.solver.fused import make_fused_optimise
from trajoptkp_tpu.solver.ilqr import ILQRConfig
from trajoptkp_tpu.tasks.toys import make_acrobot

import pytest

pytestmark = pytest.mark.slow  # heavy integration module (README: test tiers)


@pytest.fixture(scope="module")
def task():
    t = make_acrobot()
    return t.replace(
        weights=jnp.array([0.0, 0.0, 0.001, 0.001, 0.01]),
        weights_terminal=jnp.array([100.0, 100.0, 1.0, 1.0, 0.01]),
        keypoint_cfg=t.keypoint_cfg.replace(name="set_interval", min_N=2),
    )


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_batch_optimise_sharded_matches_serial(task):
    H = 50
    cfg = ILQRConfig(max_iterations=2, min_iterations=2, deriv_mode="ad")
    mesh = make_mesh(jax.devices())  # 8-way scene axis
    opt = make_batch_optimise(task, cfg, H, mesh)
    B = 8
    key = jax.random.PRNGKey(0)
    qpos0 = task.qpos_start + 0.2 * jax.random.normal(key, (B, 2))
    qvel0 = jnp.zeros((B, 2))
    U0 = jnp.zeros((B, H, 1))
    targets = jnp.tile(task.residual_targets, (B, 1))
    res = opt(qpos0, qvel0, U0, targets)
    assert res.final_cost.shape == (B,)

    # serial reference for scene 3
    fused = make_fused_optimise(task, cfg, H)
    ref = fused(qpos0[3], qvel0[3], U0[3])
    np.testing.assert_allclose(
        float(res.final_cost[3]), float(ref.final_cost), rtol=1e-10
    )


def test_sharded_jacobians_match_single_device(task):
    H = 16
    U = 0.2 * jnp.ones((H, 1))
    traj = il.rollout(task, task.qpos_start, task.qvel_start, U)
    mask = jnp.ones((H, 2), dtype=bool)
    jobs = jobs_from_mask(mask, H * 2)  # 32 jobs, divisible by 8

    A1, B1, t1 = keypoint_jacobians(
        task.model, task.sv, traj.qpos[:H], traj.qvel[:H], traj.ctrl, jobs
    )
    mesh = make_mesh(jax.devices(), scene_axis=1)  # 1x8: all on "job"
    A2, B2, t2 = sharded_keypoint_jacobians(
        mesh, task.model, task.sv,
        traj.qpos[:H], traj.qvel[:H], traj.ctrl, jobs,
    )
    np.testing.assert_allclose(np.asarray(A1), np.asarray(A2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(B1), np.asarray(B2), atol=1e-12)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_2d_mesh_shapes():
    mesh = make_mesh(jax.devices(), scene_axis=2)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("scene", "job")


def test_phase_batched_matches_fused():
    """solver/batched.py (the XLA-crash workaround path) must produce the
    same optimisation outcome as the fused single-dispatch solver when early
    exit is disabled (min_iterations == max_iterations)."""
    import numpy as np

    from trajoptkp_tpu.solver.batched import make_batched_phase_optimise
    from trajoptkp_tpu.solver.fused import make_fused_optimise
    from trajoptkp_tpu.solver.ilqr import ILQRConfig
    from trajoptkp_tpu.tasks.toys import make_acrobot

    task = make_acrobot()
    H, B = 100, 3
    cfg = ILQRConfig(max_iterations=3, min_iterations=3, deriv_mode="ad")
    key = jax.random.PRNGKey(0)
    qpB = task.qpos_start + 0.2 * jax.random.normal(key, (B, task.model.nq))
    qvB = jnp.zeros((B, task.model.nv))
    UB = jnp.zeros((B, H, task.model.nu))
    tgB = jnp.tile(task.residual_targets, (B, 1))

    run = make_batched_phase_optimise(task, cfg, H)
    res_b = run(qpB, qvB, UB, tgB)

    fused = make_fused_optimise(task, cfg, H)
    fused_b = jax.jit(jax.vmap(fused))
    res_f = fused_b(qpB, qvB, UB)

    np.testing.assert_allclose(
        np.asarray(res_b.final_cost), np.asarray(res_f.final_cost),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(res_b.initial_cost), np.asarray(res_f.initial_cost),
        rtol=1e-9,
    )


def test_sharded_batch_optimise_matches_single_device():
    """Scene x job sharded fused solve (make_sharded_batch_optimise) equals
    the unsharded vmapped fused solve — the job-axis derivative sharding must
    be a pure re-layout of compute."""
    import numpy as np

    from trajoptkp_tpu.parallel.mesh import (make_mesh,
                                             make_sharded_batch_optimise)
    from trajoptkp_tpu.solver.fused import make_fused_optimise
    from trajoptkp_tpu.solver.ilqr import ILQRConfig
    from trajoptkp_tpu.tasks.toys import make_acrobot

    task = make_acrobot()
    task = task.replace(
        keypoint_cfg=task.keypoint_cfg.replace(name="set_interval", min_N=2)
    )
    H, B = 100, 4
    cfg = ILQRConfig(max_iterations=2, min_iterations=2, deriv_mode="ad_time")
    mesh = make_mesh(jax.devices(), scene_axis=2)  # 2 scenes x 4 job shards
    key = jax.random.PRNGKey(1)
    qpB = task.qpos_start + 0.2 * jax.random.normal(key, (B, task.model.nq))
    qvB = jnp.zeros((B, task.model.nv))
    UB = jnp.zeros((B, H, task.model.nu))
    tgB = jnp.tile(task.residual_targets, (B, 1))

    sharded = make_sharded_batch_optimise(task, cfg, H, mesh)
    res_s = sharded(qpB, qvB, UB, tgB)

    fused_b = jax.jit(jax.vmap(make_fused_optimise(task, cfg, H)))
    res_f = fused_b(qpB, qvB, UB)

    np.testing.assert_allclose(
        np.asarray(res_s.final_cost), np.asarray(res_f.final_cost), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(res_s.traj.ctrl), np.asarray(res_f.traj.ctrl), atol=1e-9
    )
