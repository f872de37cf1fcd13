"""Tests for iterative_error keypoints, filtering, iLQR_SVR, sync MPC,
config/scene IO, and the campaign harness."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajoptkp_tpu.config import (SceneSpec, apply_scene, load_scene_csv,
                                  make_task, save_scene_csv)
from trajoptkp_tpu.keypoints.filtering import filter_dynamics, fir, low_pass
from trajoptkp_tpu.keypoints.iterative import iterative_error_keypoints
from trajoptkp_tpu.mpc import make_sync_mpc
from trajoptkp_tpu.solver import ilqr as il
from trajoptkp_tpu.solver.ilqr import ILQRConfig, optimise
from trajoptkp_tpu.solver.ilqr_svr import SVRConfig, make_svr_optimise
from trajoptkp_tpu.tasks.toys import make_acrobot

import pytest

pytestmark = pytest.mark.slow  # heavy integration module (README: test tiers)


@pytest.fixture(scope="module")
def task():
    t = make_acrobot()
    return t.replace(
        weights=jnp.array([0.0, 0.0, 0.001, 0.001, 0.01]),
        weights_terminal=jnp.array([100.0, 100.0, 1.0, 1.0, 0.01]),
    )


# ---------------------------------------------------------------------------
# iterative_error
# ---------------------------------------------------------------------------


def test_iterative_error_keypoints(task):
    H = 64
    U = 0.3 * jnp.ones((H, 1))
    traj = il.rollout(task, task.qpos_start, task.qvel_start, U)
    mask, A_kp, B_kp, computed = iterative_error_keypoints(
        task, traj.qpos[:H], traj.qvel[:H], traj.ctrl,
        min_N=2, threshold=1e-4,
    )
    mask = np.asarray(mask)
    # ends always computed; a smooth passive trajectory needs few keypoints
    assert mask[0].all() and mask[H - 1].all()
    assert mask.sum() < H * 2  # sparser than full FD
    # mask == computed (every evaluated column is a keypoint)
    np.testing.assert_array_equal(mask, np.asarray(computed))


def test_iterative_error_tightens_with_threshold(task):
    H = 64
    U = 0.3 * jnp.ones((H, 1))
    traj = il.rollout(task, task.qpos_start, task.qvel_start, U)
    counts = []
    for thr in (1e-1, 1e-6):
        mask, *_ = iterative_error_keypoints(
            task, traj.qpos[:H], traj.qvel[:H], traj.ctrl, 1, thr
        )
        counts.append(int(np.asarray(mask).sum()))
    assert counts[1] > counts[0]


def test_optimise_with_iterative_error(task):
    t = task.replace(
        keypoint_cfg=task.keypoint_cfg.replace(
            name="iterative_error", min_N=2, iterative_error_threshold=1e-4
        )
    )
    H = 100
    traj, stats = optimise(
        t, t.qpos_start, t.qvel_start, jnp.zeros((H, 1)),
        ILQRConfig(max_iterations=4),
    )
    assert np.isfinite(stats.final_cost)
    assert stats.final_cost <= stats.initial_cost + 1e-9


# ---------------------------------------------------------------------------
# filtering
# ---------------------------------------------------------------------------


def test_low_pass_matches_reference_recurrence():
    x = jnp.asarray(np.random.default_rng(0).standard_normal(20))
    y = np.asarray(low_pass(x, 0.25))
    yn1, xn1 = float(x[0]), float(x[0])
    for i in range(20):
        xn = float(x[i])
        yn = 0.75 * yn1 + 0.25 * (xn + xn1) / 2
        assert abs(y[i] - yn) < 1e-12
        yn1, xn1 = yn, xn


def test_fir_matches_reference_convolution():
    coeffs = (0.1, 0.15, 0.5, 0.15, 0.1)
    x = np.random.default_rng(1).standard_normal(15)
    y = np.asarray(fir(jnp.asarray(x), coeffs))
    for i in range(15):
        expect = sum(
            x[i - j] * c for j, c in enumerate(coeffs) if i - j >= 0
        )
        assert abs(y[i] - expect) < 1e-12


def test_filter_dynamics_only_touches_velocity_rows():
    A = jnp.asarray(np.random.default_rng(2).standard_normal((10, 4, 4)))
    out = np.asarray(filter_dynamics(A, "low_pass"))
    np.testing.assert_allclose(out[:, :2, :], np.asarray(A)[:, :2, :])
    assert not np.allclose(out[:, 2:, :], np.asarray(A)[:, 2:, :])


# ---------------------------------------------------------------------------
# iLQR_SVR
# ---------------------------------------------------------------------------


def test_svr_runs_and_reduces(task):
    H = 150
    cfg = ILQRConfig(max_iterations=6, deriv_mode="ad")
    svr = SVRConfig(num_dofs_readd=1, K_matrix_threshold=1e-8)
    opt = jax.jit(make_svr_optimise(task, cfg, svr, H))
    res = opt(
        task.qpos_start, task.qvel_start, jnp.zeros((H, 1)),
        jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(res.final_cost))
    assert float(res.final_cost) <= float(res.initial_cost)
    # protected actuated dof stays active
    assert float(res.active[0]) == 1.0


def test_svr_removes_low_importance_dofs(task):
    """With a huge threshold every unprotected dof gets removed."""
    H = 60
    cfg = ILQRConfig(max_iterations=2, min_iterations=2, deriv_mode="ad")
    svr = SVRConfig(num_dofs_readd=0, K_matrix_threshold=1e12)
    opt = make_svr_optimise(task, cfg, svr, H)
    res = opt(
        task.qpos_start, task.qvel_start, jnp.zeros((H, 1)),
        jax.random.PRNGKey(1),
    )
    active = np.asarray(res.active)
    assert active[0] == 1.0      # protected (actuated)
    assert active[1] == 0.0      # elbow removed


# ---------------------------------------------------------------------------
# sync MPC
# ---------------------------------------------------------------------------


def test_sync_mpc_runs(task):
    H = 40
    mpc = make_sync_mpc(task, ILQRConfig(deriv_mode="ad"), H, num_apply=4,
                        noise_pct=0.0)
    res = jax.jit(lambda qp, qv, U, k: mpc(qp, qv, U, 5, k))(
        task.qpos_start, task.qvel_start, jnp.zeros((H, 1)),
        jax.random.PRNGKey(0),
    )
    assert res.ctrl_hist.shape == (20, 1)
    assert res.qpos_hist.shape == (21, 2)
    assert bool(jnp.all(jnp.isfinite(res.qpos_hist)))
    # controls within limits
    assert float(jnp.max(jnp.abs(res.ctrl_hist))) <= 100.0 + 1e-9


# ---------------------------------------------------------------------------
# config / scene IO
# ---------------------------------------------------------------------------


def test_scene_csv_roundtrip(tmp_path):
    scene = SceneSpec(
        robot_start=np.array([0.1, -0.2]),
        body_starts=[np.array([1, 2, 3, 0.1, 0.2, 0.3])],
        residual_targets=np.array([3.14, 0.0, 0.0]),
    )
    path = str(tmp_path / "scenes" / "0.csv")
    save_scene_csv(path, scene)
    loaded = load_scene_csv(path, 2, 1, 3)
    np.testing.assert_allclose(loaded.robot_start, scene.robot_start)
    np.testing.assert_allclose(loaded.body_starts[0], scene.body_starts[0])
    np.testing.assert_allclose(loaded.residual_targets, scene.residual_targets)


def test_load_reference_scene_csv():
    """The reference's own TestTasks CSVs parse verbatim."""
    path = "/root/reference/TestTasks/acrobot/0.csv"
    if not os.path.exists(path):
        pytest.skip("reference scenes not mounted")
    scene = load_scene_csv(path, 2, 0, 5)
    assert scene.robot_start.shape == (2,)
    assert scene.residual_targets.shape == (5,)


def test_apply_scene(task):
    scene = SceneSpec(
        robot_start=np.array([1.0, 2.0]),
        body_starts=[],
        residual_targets=np.array([3.0, 0.0, 0.0, 0.0, 0.0]),
    )
    t2 = apply_scene(task, scene)
    np.testing.assert_allclose(np.asarray(t2.qpos_start), [1.0, 2.0])
    assert float(t2.residual_targets[0]) == 3.0


def test_task_registry():
    t = make_task("acrobot")
    assert t.name == "acrobot"
    with pytest.raises(KeyError):
        make_task("nonexistent")


# ---------------------------------------------------------------------------
# PredictiveSampling + GradDescent
# ---------------------------------------------------------------------------


def test_predictive_sampling_improves(task):
    from trajoptkp_tpu.solver.sampling import (SamplingConfig,
                                               make_sampling_optimise)

    H = 100
    opt = jax.jit(make_sampling_optimise(task, SamplingConfig(
        max_iterations=8, num_rollouts=8), H))
    res = opt(task.qpos_start, task.qvel_start, jnp.zeros((H, 1)),
              jax.random.PRNGKey(0))
    assert float(res.final_cost) < float(res.initial_cost)
    # controls within limits
    assert float(jnp.max(jnp.abs(res.traj.ctrl))) <= 100.0 + 1e-9


def test_grad_descent_improves(task):
    from trajoptkp_tpu.solver.sampling import (GradDescentConfig,
                                               make_grad_descent_optimise)

    H = 100
    opt = jax.jit(make_grad_descent_optimise(
        task, GradDescentConfig(max_iterations=5), H))
    res = opt(task.qpos_start, task.qvel_start, jnp.zeros((H, 1)))
    assert float(res.final_cost) < float(res.initial_cost)


def test_svr_svd_ranking_mode(task):
    """eigen_vector_method (SVD importance, iLQR_SVR.cpp:901-932): runs,
    reduces cost, and with a huge threshold removes unprotected dofs."""
    H = 60
    cfg = ILQRConfig(max_iterations=2, min_iterations=2, deriv_mode="ad")
    svr = SVRConfig(num_dofs_readd=0, K_matrix_threshold=1e12,
                    eigen_vector_method=True)
    opt = make_svr_optimise(task, cfg, svr, H)
    res = opt(
        task.qpos_start, task.qvel_start, jnp.zeros((H, 1)),
        jax.random.PRNGKey(1),
    )
    active = np.asarray(res.active)
    assert active[0] == 1.0
    assert active[1] == 0.0
    assert bool(jnp.all(jnp.isfinite(res.traj.qpos)))


def test_svd_importance_agrees_on_rank1():
    """For a rank-1 K the SVD ranking equals the |K| column-sum ranking up to
    scale, so both must order dofs identically."""
    from trajoptkp_tpu.solver.ilqr_svr import (dof_importances,
                                               dof_importances_svd)

    rng = np.random.default_rng(0)
    n, nu, H = 4, 1, 12
    K = jnp.asarray(rng.standard_normal((H, nu, 2 * n)))
    active = jnp.ones((n,))
    a = np.asarray(dof_importances(K, active, 1))
    b = np.asarray(dof_importances_svd(K, active, 1))
    assert list(np.argsort(a)) == list(np.argsort(b))
