"""Lane-last sync-MPC executor parity vs the generic fused MPC executor.

Quick tier: this is the path behind the walker replan-rate headline
(BASELINE.md walker table; `/root/reference/src/GenTestingData.cpp:275-326`),
so its correctness gate runs on every test invocation.  With exploration
noise off the two executors run the same algorithm (one iLQR iteration per
replan, shift-pad, apply) in different layouts; trajectories must agree to
FP-reassociation tolerance in f64.
"""

import jax
import jax.numpy as jnp
import numpy as np

from trajoptkp_tpu.mpc.sync import make_lane_sync_mpc, make_sync_mpc
from trajoptkp_tpu.solver.ilqr import ILQRConfig
from trajoptkp_tpu.tasks.toys import make_acrobot


def test_lane_sync_mpc_matches_generic():
    task = make_acrobot(dtype=jnp.float64)
    task = task.replace(
        keypoint_cfg=task.keypoint_cfg.replace(name="set_interval", min_N=1)
    )
    H, n_replans, num_apply = 40, 6, 2
    cfg = ILQRConfig(max_iterations=1, min_iterations=1,
                     deriv_mode="ad_time", deriv_chunk=64)
    key = jax.random.PRNGKey(3)
    U0 = jnp.zeros((H, task.model.nu), jnp.float64)

    gen = make_sync_mpc(task, cfg, H, num_apply=num_apply, noise_pct=0.0)
    res_g = jax.jit(lambda qp, qv, U, k: gen(qp, qv, U, n_replans, k))(
        task.qpos_start, task.qvel_start, U0, key
    )
    lane = make_lane_sync_mpc(task, cfg, H, num_apply=num_apply,
                              noise_pct=0.0)
    res_l = jax.jit(
        lambda qp, qv, U, tg, k: lane(qp, qv, U, tg, n_replans, k)
    )(
        task.qpos_start[None], task.qvel_start[None], U0[None],
        task.residual_targets[None], key,
    )
    qp_l = np.asarray(res_l.qpos_hist)[..., 0]
    qp_g = np.asarray(res_g.qpos_hist)
    np.testing.assert_allclose(qp_l, qp_g, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res_l.replan_costs)[:, 0],
        np.asarray(res_g.replan_costs), rtol=1e-6,
    )


def test_host_lane_sync_mpc_matches_scanned():
    """The host-driven lane MPC executor (one jitted replan, host loop —
    the walker-scale compile-wall fix) reproduces the scan-over-replans
    executor exactly: same algorithm, same PRNG stream, different program
    structure only."""
    from trajoptkp_tpu.mpc.sync import make_lane_sync_mpc_host

    task = make_acrobot(dtype=jnp.float64)
    task = task.replace(
        keypoint_cfg=task.keypoint_cfg.replace(name="set_interval", min_N=1)
    )
    H, n_replans, num_apply = 40, 5, 2
    cfg = ILQRConfig(max_iterations=1, min_iterations=1,
                     deriv_mode="ad_time", deriv_chunk=64)
    key = jax.random.PRNGKey(11)
    U0 = jnp.zeros((1, H, task.model.nu), jnp.float64)
    args = (task.qpos_start[None], task.qvel_start[None], U0,
            task.residual_targets[None])

    lane = make_lane_sync_mpc(task, cfg, H, num_apply=num_apply,
                              noise_pct=5.0)
    res_s = jax.jit(
        lambda qp, qv, U, tg, k: lane(qp, qv, U, tg, n_replans, k)
    )(*args, key)
    host = make_lane_sync_mpc_host(task, cfg, H, num_apply=num_apply,
                                   noise_pct=5.0)
    res_h = host(*args, n_replans, key)

    np.testing.assert_allclose(
        np.asarray(res_h.qpos_hist), np.asarray(res_s.qpos_hist), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(res_h.ctrl_hist), np.asarray(res_s.ctrl_hist), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(res_h.replan_costs), np.asarray(res_s.replan_costs),
        rtol=1e-9,
    )
    assert len(host.last_replan_ms) == n_replans
