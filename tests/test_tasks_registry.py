"""Smoke tests over the full task registry + viz + checkpoint."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajoptkp_tpu.config import available_tasks, make_task
from trajoptkp_tpu.solver import ilqr as il

import pytest

pytestmark = pytest.mark.slow  # heavy integration module (README: test tiers)

ALL_TASKS = available_tasks()
# soft-body scenes (100+ dofs, panda + lattice) compile for minutes on the
# CPU test platform; they have dedicated small-scale coverage in test_soft.py
_SLOW_SOFT = {"push_soft", "push_soft_rigid"}


@pytest.mark.parametrize("name", [t for t in ALL_TASKS if t not in _SLOW_SOFT])
def test_task_builds_and_rolls_out(name):
    if name in ("hopper", "box_push_toppling"):
        # reference stubs (src/main.cpp:783-786, :799-802)
        with pytest.raises(NotImplementedError):
            make_task(name)
        return
    task = make_task(name)
    assert task.nres == len(np.asarray(task.weights))
    assert task.sv.ndof >= 1
    H = 20
    traj = il.rollout(
        task, task.qpos_start, task.qvel_start,
        jnp.zeros((H, task.model.nu), task.model.dtype),
    )
    assert bool(jnp.all(jnp.isfinite(traj.qpos))), name
    assert bool(jnp.all(jnp.isfinite(traj.costs))), name
    # residual derivatives are finite at the start state
    from trajoptkp_tpu.tasks.base import residual_derivatives

    r, r_x, r_u = residual_derivatives(
        task, task.qpos_start, task.qvel_start,
        jnp.zeros((task.model.nu,), task.model.dtype),
    )
    assert bool(jnp.all(jnp.isfinite(r_x))), name
    assert bool(jnp.all(jnp.isfinite(r_u))), name


def test_pushing_init_controls():
    from trajoptkp_tpu.tasks.pushing import jacobian_ee_init_controls

    task = make_task("pushing_no_clutter")
    U = jacobian_ee_init_controls(task, 50)
    assert U.shape == (50, 7)
    assert bool(jnp.all(jnp.isfinite(U)))


def test_render_frame(tmp_path):
    from trajoptkp_tpu.viz.render import render_frame, render_trajectory

    task = make_task("acrobot")
    out = str(tmp_path / "frame.png")
    render_frame(task.model, task.qpos_start, out_path=out)
    import os

    assert os.path.exists(out)
    paths = render_trajectory(
        task.model,
        np.tile(np.asarray(task.qpos_start), (12, 1)),
        str(tmp_path / "seq"),
        every=6,
    )
    assert len(paths) == 2


def test_checkpoint_roundtrip(tmp_path):
    from trajoptkp_tpu.utils.checkpoint import (load_trajectory,
                                                save_trajectory)

    task = make_task("acrobot")
    traj = il.rollout(
        task, task.qpos_start, task.qvel_start, jnp.zeros((10, 1))
    )
    path = str(tmp_path / "ckpt.npz")
    save_trajectory(path, traj, lamb=0.01)
    loaded, lamb = load_trajectory(path)
    np.testing.assert_allclose(np.asarray(loaded.qpos), np.asarray(traj.qpos))
    np.testing.assert_allclose(np.asarray(loaded.ctrl), np.asarray(traj.ctrl))
    assert lamb == 0.01
