"""iLQR solver tests: end-to-end swing-up, line-search/BP invariants.

The golden-trajectory regression the reference lacks (SURVEY §4): a fixed
task + config must reproduce cost trajectories within tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajoptkp_tpu.solver import ilqr as il
from trajoptkp_tpu.solver.ilqr import ILQRConfig, optimise
from trajoptkp_tpu.tasks.toys import make_acrobot


@pytest.fixture(scope="module")
def acrobot_cheap_ctrl():
    task = make_acrobot()
    return task.replace(
        weights=jnp.array([0.0, 0.0, 0.001, 0.001, 0.01]),
        weights_terminal=jnp.array([100.0, 100.0, 1.0, 1.0, 0.01]),
    )


def test_rollout_cost_decomposition(acrobot_cheap_ctrl):
    task = acrobot_cheap_ctrl
    H = 50
    U = jnp.zeros((H, 1))
    traj = il.rollout(task, task.qpos_start, task.qvel_start, U)
    assert traj.qpos.shape == (H + 1, 2)
    assert traj.costs.shape == (H,)
    assert float(traj.total_cost) > 0


def test_swingup_end_to_end(acrobot_cheap_ctrl):
    """Acrobot reaches its scene goal with cheap control: >80% cost
    reduction and the chain ends near the target pose (canonical scene =
    TestTasks/acrobot/0.csv: start [0.248, 2.085], goal stable-down
    [pi, 0])."""
    task = acrobot_cheap_ctrl
    H = 500
    U0 = jnp.zeros((H, 1))
    traj, stats = optimise(
        task, task.qpos_start, task.qvel_start, U0, ILQRConfig(max_iterations=15)
    )
    assert stats.cost_reduction > 0.8, stats.cost_reduction
    final = np.asarray(traj.qpos[-1])
    goal = np.asarray(task.residual_targets[:2])
    assert abs(final[0] - goal[0]) < 0.3 and abs(final[1] - goal[1]) < 0.3
    # cost history is monotonically non-increasing (accepted steps only)
    hist = np.array(stats.cost_history)
    assert np.all(np.diff(hist) <= 1e-9)


def test_keypoint_modes_consistent(acrobot_cheap_ctrl):
    """SI_5 + interpolation achieves nearly the SI_1 full-FD cost reduction
    (the reference's comparison metric — summary.csv column 1; final costs
    themselves are near zero at convergence so their ratio is ill-posed)."""
    task = acrobot_cheap_ctrl
    H = 300
    U0 = jnp.zeros((H, 1))
    cfgs = {}
    for minN in (1, 5):
        t = task.replace(
            keypoint_cfg=task.keypoint_cfg.replace(name="set_interval", min_N=minN)
        )
        _, stats = optimise(
            t, t.qpos_start, t.qvel_start, U0, ILQRConfig(max_iterations=8)
        )
        cfgs[minN] = stats.cost_reduction
    assert cfgs[1] > 0.8, cfgs
    assert abs(cfgs[5] - cfgs[1]) < 0.05, cfgs


def test_backward_pass_pd_failure_raises_lambda(acrobot_cheap_ctrl):
    """Indefinite Quu (negative l_uu) must be flagged invalid, and the lambda
    loop must recover or exit (iLQR.cpp:636-657 semantics)."""
    task = acrobot_cheap_ctrl
    H = 20
    U = jnp.zeros((H, 1))
    traj = il.rollout(task, task.qpos_start, task.qvel_start, U)
    mask = jnp.ones((H, 2), dtype=bool)
    A, B, lx, lxx, lu, luu, _ = il.compute_derivatives(task, traj, mask, H * 2)
    luu_bad = luu - 100.0  # force indefinite
    k, K, dJ, valid = il.backward_pass(A, B, lx, lxx, lu, luu_bad, 1e-4)
    assert not bool(valid)
    cfg = ILQRConfig()
    k, K, dJ, lamb, lambda_exit = il.backward_pass_lambda_loop(
        A, B, lx, lxx, lu, luu_bad, jnp.asarray(1e-4), cfg
    )
    # either it found a lambda that regularises, or it exited
    assert bool(lambda_exit) or bool(jnp.all(jnp.isfinite(k)))


def test_forward_pass_rejects_bad_step(acrobot_cheap_ctrl):
    """With k = 0 the line search cannot beat the nominal cost; the nominal
    trajectory must be kept."""
    task = acrobot_cheap_ctrl
    H = 30
    U = 0.5 * jnp.ones((H, 1))
    traj = il.rollout(task, task.qpos_start, task.qvel_start, U)
    k = jnp.zeros((H, 1))
    K = jnp.zeros((H, 1, 4))
    alphas = il.default_alphas(6)
    new_traj, new_cost, accepted, _ = il.forward_pass(
        task, traj, k, K, alphas, traj.total_cost
    )
    assert not bool(accepted)
    np.testing.assert_allclose(
        np.asarray(new_traj.ctrl), np.asarray(traj.ctrl), atol=1e-12
    )
    assert float(new_cost) == pytest.approx(float(traj.total_cost))


def test_control_limits_respected(acrobot_cheap_ctrl):
    task = acrobot_cheap_ctrl
    H = 400
    U0 = jnp.zeros((H, 1))
    traj, _ = optimise(
        task, task.qpos_start, task.qvel_start, U0, ILQRConfig(max_iterations=6)
    )
    U = np.asarray(traj.ctrl)
    assert np.all(U <= 100.0 + 1e-9) and np.all(U >= -100.0 - 1e-9)
