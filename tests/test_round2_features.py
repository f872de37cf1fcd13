"""Round-2 feature tests: reference-scene loading, costDerivsFD,
fused-vs-host equivalence (incl. auto_adjust in the fused path), and the
derivative-budget overflow guard."""

import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajoptkp_tpu.config.loader import load_scenes_for_task, make_task
from trajoptkp_tpu.keypoints.methods import generate_keypoints
from trajoptkp_tpu.solver.fused import make_fused_optimise
from trajoptkp_tpu.solver.ilqr import (ILQRConfig, compute_derivatives,
                                       optimise, rollout)
from trajoptkp_tpu.tasks.toys import make_acrobot

REF_SCENES = "/root/reference/TestTasks"


@pytest.mark.skipif(
    not os.path.isdir(REF_SCENES), reason="reference scenes not mounted"
)
def test_reference_scene_loading():
    """TestTasks CSVs load verbatim (LoadTaskFromFile semantics,
    `/root/reference/src/FileHandler/FileHandler.cpp:471-578`)."""
    t = make_task("acrobot")
    qp, qv, tg = load_scenes_for_task(t, f"{REF_SCENES}/acrobot", 10)
    assert qp.shape == (10, 2) and tg.shape == (10, 5)
    # scene 0 is the canonical start (acrobot/0.csv)
    np.testing.assert_allclose(qp[0], [0.248245, 2.08504])
    np.testing.assert_allclose(tg[0][:2], [3.14152, 0.0])

    t2 = make_task("pushing_no_clutter")
    qp2, _, tg2 = load_scenes_for_task(t2, f"{REF_SCENES}/push_ncl", 3)
    assert qp2.shape[1] == t2.model.nq
    # free-joint goal body: position written, quaternion normalised
    gj = t2.model.joint_names.index("goal")
    qadr = t2.model.jnt_qposadr[gj]
    np.testing.assert_allclose(qp2[0][qadr:qadr + 3], [0.4, -0.0365033, 0.032])
    np.testing.assert_allclose(np.linalg.norm(qp2[0][qadr + 3:qadr + 7]), 1.0)
    np.testing.assert_allclose(tg2[0], [0.619891, 0.136985])


def test_cost_derivs_fd_matches_exact_at_full_mask():
    """With every step a keypoint, interpolated residual Jacobians equal the
    exact per-step ones (costDerivsFD == exact in the SI_1 limit)."""
    task = make_acrobot()
    H = 60
    traj = rollout(task, task.qpos_start, task.qvel_start,
                   0.1 * jnp.ones((H, 1)))
    mask = jnp.ones((H, task.sv.ndof), bool)
    budget = H * task.sv.ndof
    out_exact = compute_derivatives(task, traj, mask, budget, mode="fd")
    out_fd = compute_derivatives(task, traj, mask, budget, mode="fd",
                                 cost_derivs_fd=True)
    for a, b in zip(out_exact[2:6], out_fd[2:6]):  # l_x, l_xx, l_u, l_uu
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-9)


def test_cost_derivs_fd_optimises():
    task = make_acrobot().replace(
        keypoint_cfg=make_acrobot().keypoint_cfg.replace(
            name="set_interval", min_N=5
        )
    )
    H = 150
    _, stats = optimise(
        task, task.qpos_start, task.qvel_start, jnp.zeros((H, 1)),
        ILQRConfig(max_iterations=6, min_iterations=6, cost_derivs_fd=True),
    )
    assert stats.cost_reduction > 0.5


@pytest.mark.parametrize("method,min_N", [("set_interval", 5),
                                          ("velocity_change", 1)])
def test_fused_matches_host_loop(method, min_N):
    """Fused while_loop solver and the host-driven loop agree per keypoint
    method (same derivatives, BP, line search — only loop plumbing differs)."""
    task = make_acrobot()
    task = task.replace(
        keypoint_cfg=task.keypoint_cfg.replace(name=method, min_N=min_N)
    )
    H = 120
    cfg = ILQRConfig(max_iterations=5, min_iterations=5)
    U0 = jnp.zeros((H, 1))
    _, stats = optimise(task, task.qpos_start, task.qvel_start, U0, cfg)
    fused = jax.jit(make_fused_optimise(task, cfg, H))
    res = fused(task.qpos_start, task.qvel_start, U0)
    assert abs(float(res.final_cost) - stats.final_cost) < 1e-5 * max(
        1.0, stats.final_cost
    )


def test_fused_auto_adjust_runs_and_reduces():
    """auto_adjust inside the fused while_loop (AdjustKeyPointMethod,
    `KeyPointGenerator.cpp:137-207`) optimises and reports a %derivs that
    the surprise controller actually moved."""
    task = make_acrobot()
    task = task.replace(
        keypoint_cfg=task.keypoint_cfg.replace(
            name="set_interval", min_N=2, max_N=20, auto_adjust=True
        )
    )
    H = 120
    cfg = ILQRConfig(max_iterations=6, min_iterations=6)
    fused = jax.jit(make_fused_optimise(task, cfg, H))
    res = fused(task.qpos_start, task.qvel_start, jnp.zeros((H, 1)))
    assert float(res.cost_reduction) > 0.5
    assert 0.0 < float(res.pct_derivs) <= 100.0


def test_budget_overflow_warns():
    task = make_acrobot()
    H = 80
    cfg = ILQRConfig(max_iterations=1, min_iterations=1, deriv_budget=10)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        optimise(task, task.qpos_start, task.qvel_start,
                 jnp.zeros((H, 1)), cfg)
    assert any("deriv budget" in str(x.message) for x in w)
