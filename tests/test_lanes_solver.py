"""Lane-solver parity vs the generic phase-batched solver.

The lane solver re-implements the whole iLQR in lane-last layout; these
tests pin its per-scene cost reductions to solver/batched.py (identical
algorithm semantics, FP reassociation differences only).  A chaotic scene
can diverge on an accept decision once costs agree to ~1e-6; the assertion
therefore requires MOST scenes to match tightly rather than all."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajoptkp_tpu.solver.batched import make_batched_phase_optimise
from trajoptkp_tpu.solver.ilqr import ILQRConfig
from trajoptkp_tpu.solver.lanes import (lane_solver_supported,
                                        make_lane_batch_optimise)

pytestmark = pytest.mark.slow


def _run_both(task, cfg, H, qpB, qvB, UB, tgB):
    lane = jax.jit(make_lane_batch_optimise(task, cfg, H))
    res = lane(qpB, qvB, UB, tgB)
    ref = make_batched_phase_optimise(
        task, cfg, H, batch_size=UB.shape[0]
    )(qpB, qvB, UB, tgB)
    return np.asarray(res.cost_reduction), np.asarray(ref.cost_reduction)


def test_lane_solver_matches_batched_acrobot():
    from trajoptkp_tpu.tasks.toys import make_acrobot

    task = make_acrobot(dtype=jnp.float64)
    task = task.replace(
        keypoint_cfg=task.keypoint_cfg.replace(name="set_interval", min_N=1)
    )
    assert lane_solver_supported(task)
    H, B = 500, 8
    cfg = ILQRConfig(max_iterations=10, min_iterations=10,
                     deriv_mode="ad_time", deriv_chunk=64)
    key = jax.random.PRNGKey(0)
    qpB = task.qpos_start + 0.3 * jax.random.normal(
        key, (B, task.model.nq), jnp.float64
    )
    qvB = jnp.zeros((B, task.model.nv), jnp.float64)
    UB = jnp.zeros((B, H, task.model.nu), jnp.float64)
    tgB = jnp.tile(task.residual_targets, (B, 1))
    r_lane, r_ref = _run_both(task, cfg, H, qpB, qvB, UB, tgB)
    agree = np.abs(r_lane - r_ref) < 1e-4
    assert agree.sum() >= B - 1, (r_lane, r_ref)


def test_lane_solver_adaptive_jerk_matches_batched():
    """AJ keypoints on the lane path (per-lane dynamic union times, per-dof
    column lerp) == the generic batched solver's AJ schedule.  The two paths
    share the keypoint algebra (keypoints/methods.py) but nothing else."""
    from trajoptkp_tpu.tasks.toys import make_acrobot

    task = make_acrobot(dtype=jnp.float64)
    task = task.replace(
        keypoint_cfg=task.keypoint_cfg.replace(
            name="adaptive_jerk", min_N=5, max_N=50, auto_adjust=False
        )
    )
    from trajoptkp_tpu.solver.lanes import lane_solver_supported as sup

    assert sup(task)
    H, B = 300, 6
    cfg = ILQRConfig(max_iterations=8, min_iterations=8,
                     deriv_mode="ad_time", deriv_chunk=64)
    key = jax.random.PRNGKey(7)
    qpB = task.qpos_start + 0.3 * jax.random.normal(
        key, (B, task.model.nq), jnp.float64
    )
    qvB = jnp.zeros((B, task.model.nv), jnp.float64)
    UB = jnp.zeros((B, H, task.model.nu), jnp.float64)
    tgB = jnp.tile(task.residual_targets, (B, 1))
    r_lane, r_ref = _run_both(task, cfg, H, qpB, qvB, UB, tgB)
    agree = np.abs(r_lane - r_ref) < 1e-4
    assert agree.sum() >= B - 1, (r_lane, r_ref)


def test_lane_solver_velocity_change_matches_batched():
    """VC keypoints, same setup as the AJ test."""
    from trajoptkp_tpu.tasks.toys import make_acrobot

    task = make_acrobot(dtype=jnp.float64)
    task = task.replace(
        keypoint_cfg=task.keypoint_cfg.replace(
            name="velocity_change", min_N=2, max_N=50, auto_adjust=False
        )
    )
    H, B = 300, 6
    cfg = ILQRConfig(max_iterations=8, min_iterations=8,
                     deriv_mode="ad_time", deriv_chunk=64)
    key = jax.random.PRNGKey(11)
    qpB = task.qpos_start + 0.3 * jax.random.normal(
        key, (B, task.model.nq), jnp.float64
    )
    qvB = jnp.zeros((B, task.model.nv), jnp.float64)
    UB = jnp.zeros((B, H, task.model.nu), jnp.float64)
    tgB = jnp.tile(task.residual_targets, (B, 1))
    r_lane, r_ref = _run_both(task, cfg, H, qpB, qvB, UB, tgB)
    agree = np.abs(r_lane - r_ref) < 1e-4
    assert agree.sum() >= B - 1, (r_lane, r_ref)


def test_lane_solver_gate_accepts_push():
    """The lane solver covers the panda push family (free joint + cylinder
    contacts + FK residuals) under SI keypoints.  Full solver-level push
    parity runs on TPU only (the arm-scale lane program exceeds the CPU
    LLVM compile budget); step-level contact parity is pinned by
    tests/test_lanes.py and the probe logs in STATUS.md."""
    from trajoptkp_tpu.config.loader import make_task

    task = make_task("pushing_no_clutter", dtype=jnp.float64)
    task = task.replace(
        keypoint_cfg=task.keypoint_cfg.replace(name="set_interval", min_N=5)
    )
    assert lane_solver_supported(task)
