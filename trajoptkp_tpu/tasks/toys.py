"""Toy tasks: acrobot, pendulum, pentabot (joint-space swing-up family).

Mirrors the reference task subclasses in `/root/reference/src/ModelTranslator/`
(Acrobot.cpp, Pentabot.cpp): residuals are per-joint position error, per-joint
velocity, and per-actuator control magnitude, with target layouts matching the
reference YAML configs (`TaskConfigs/toys/*.yaml`).
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from ..dynamics.mjcf import load_mjcf
from ..keypoints.methods import KeypointConfig
from ..state.statevector import full_state_vector
from .base import Task

_MODELS_DIR = os.path.join(os.path.dirname(__file__), "..", "models")


def _joint_space_residuals(njoint: int, nctrl: int):
    """Residuals: [joint_i - target_i]*nj, [vel_i - tvel_i]*nj, [ctrl_i]*nu.

    Matches Acrobot::Residuals (`src/ModelTranslator/Acrobot.cpp:26-55`):
    targets layout = [pos targets (nj), vel targets (nj), ctrl targets (nu)].
    """

    def residual_fn(model, data, targets):
        pos = data.qpos[:njoint] - targets[:njoint]
        vel = data.qvel[:njoint] - targets[njoint : 2 * njoint]
        ctrl = data.ctrl[:nctrl] - targets[2 * njoint : 2 * njoint + nctrl]
        return jnp.concatenate([pos, vel, ctrl])

    def task_complete_fn(model, data, targets):
        dist = jnp.sum(jnp.abs(data.qpos[:njoint] - targets[:njoint]))
        return dist < 0.01, dist

    return residual_fn, task_complete_fn


def make_acrobot(dtype=jnp.float64) -> Task:
    """Acrobot (reference Acrobot.cpp + TaskConfigs/toys/acrobot.yaml):
    drive the chain to a goal pose; weights 0/100 on joints, 0.001/1 on
    velocities, 100/100 on torque; velocity_change keypoints minN=1 maxN=100.
    The canonical scene is TestTasks/acrobot/0.csv verbatim: start
    [0.248245, 2.08504], goal the stable down pose [pi, 0] (goals are drawn
    from {down, half-up, up}, `Acrobot.cpp:64-82`)."""
    model = load_mjcf(os.path.join(_MODELS_DIR, "acrobot.xml"), dtype=dtype)
    sv = full_state_vector(model, dtype=dtype)
    residual_fn, complete_fn = _joint_space_residuals(2, 1)
    return Task(
        name="acrobot",
        residual_names=(
            "joint_0", "joint_1", "joint_0_vel", "joint_1_vel", "joint_0_torque",
        ),
        residual_fn=residual_fn,
        task_complete_fn=complete_fn,
        model=model,
        sv=sv,
        residual_targets=jnp.array(
            [3.14152, 0.0, 0.0, 0.0, 0.0], dtype=dtype
        ),
        weights=jnp.array([0.0, 0.0, 0.001, 0.001, 100.0], dtype=dtype),
        weights_terminal=jnp.array([100.0, 100.0, 1.0, 1.0, 100.0], dtype=dtype),
        qpos_start=jnp.array([0.248245, 2.08504], dtype=dtype),
        qvel_start=jnp.zeros((2,), dtype=dtype),
        keypoint_cfg=KeypointConfig(
            name="velocity_change",
            min_N=1,
            max_N=100,
            jerk_thresholds=jnp.full((2,), 150.0, dtype=dtype),
            accel_thresholds=jnp.full((2,), 150.0, dtype=dtype),
            velocity_change_thresholds=jnp.full((2,), 6.0, dtype=dtype),
        ),
        openloop_horizon=500,
        mpc_horizon=100,
    )


def make_pentabot(dtype=jnp.float64) -> Task:
    """Pentabot: 5-link chain, 3 actuated joints (1, 3, 5)
    (reference Pentabot.cpp + TaskConfigs/toys/pentabot.yaml: torque limits
    +-1... the yaml's torqueLimits=[1,1,1] conflict with the acrobot-class
    +-100 model range; we keep the model's range and the yaml's weights)."""
    import os as _os

    model = load_mjcf(_os.path.join(_MODELS_DIR, "pentabot.xml"), dtype=dtype)
    sv = full_state_vector(model, dtype=dtype)
    nj, nu = 5, 3

    def residual_fn(m, data, targets):
        pos = data.qpos[:nj] - targets[:nj]
        vel = data.qvel[:nj] - targets[nj : 2 * nj]
        ctrl = data.ctrl[:nu] - targets[2 * nj : 2 * nj + nu]
        return jnp.concatenate([pos, vel, ctrl])

    return Task(
        name="pentabot",
        residual_names=tuple(
            [f"joint_{i}" for i in range(nj)]
            + [f"joint_{i}_vel" for i in range(nj)]
            + [f"torque_{i}" for i in range(nu)]
        ),
        residual_fn=residual_fn,
        task_complete_fn=None,
        model=model,
        sv=sv,
        residual_targets=jnp.zeros((2 * nj + nu,), dtype=dtype),
        weights=jnp.array([0.0] * nj + [0.001] * nj + [0.2] * nu, dtype=dtype),
        weights_terminal=jnp.array(
            [100.0] * nj + [1.0] * nj + [0.2] * nu, dtype=dtype
        ),
        qpos_start=jnp.array([3.1415, 0, 0, 0, 0], dtype=dtype),
        qvel_start=jnp.zeros((nj,), dtype=dtype),
        keypoint_cfg=KeypointConfig(
            name="set_interval",
            min_N=1,
            max_N=10,
            jerk_thresholds=jnp.full((nj,), 0.001, dtype),
            accel_thresholds=jnp.full((nj,), 0.001, dtype),
            velocity_change_thresholds=jnp.full((nj,), 0.2, dtype),
        ),
        openloop_horizon=500,
        mpc_horizon=100,
    )


def make_piston_block(dtype=jnp.float64) -> Task:
    """PistonBlock: 1-D toy contact (reference PistonBlock.cpp +
    TaskConfigs/toys/piston_box.yaml): residuals are the block's y position
    vs target (0 / 100) and y velocity (0.1 / 0.1); state vector = piston
    slide + block linear y only."""
    import os as _os

    from ..state.statevector import state_vector_from_names

    model = load_mjcf(_os.path.join(_MODELS_DIR, "piston_box.xml"), dtype=dtype)
    sv = state_vector_from_names(
        model, ["piston_slide", "goal_lin_y"], dtype=dtype
    )
    goal_body = model.body_names.index("goal")
    goal_j = model.joint_names.index("goal")
    gd = model.jnt_dofadr[goal_j]

    def residual_fn(m, data, targets):
        return jnp.stack(
            [data.xpos[goal_body][1] - targets[0], data.qvel[gd + 1] - targets[1]]
        )

    def complete_fn(m, data, targets):
        dist = jnp.abs(data.xpos[goal_body][1] - targets[0])
        return dist < 0.02, dist

    return Task(
        name="piston_block",
        residual_names=("box_x_pos", "box_x_vel"),
        residual_fn=residual_fn,
        task_complete_fn=complete_fn,
        model=model,
        sv=sv,
        residual_targets=jnp.array([0.9, 0.0], dtype=dtype),
        weights=jnp.array([0.0, 0.1], dtype=dtype),
        weights_terminal=jnp.array([100.0, 0.1], dtype=dtype),
        qpos_start=jnp.asarray(model.qpos0, dtype=dtype),
        qvel_start=jnp.zeros((model.nv,), dtype=dtype),
        keypoint_cfg=KeypointConfig(
            name="set_interval",
            min_N=1,
            max_N=500,
            jerk_thresholds=jnp.ones((2,), dtype),
            accel_thresholds=jnp.ones((2,), dtype),
            velocity_change_thresholds=jnp.full((2,), 0.1, dtype),
        ),
        openloop_horizon=2000,
        mpc_horizon=100,
    )


def make_floating_cube(dtype=jnp.float64) -> Task:
    """FloatingCube: orient a free cube to a target attitude via torque
    motors (reference FloatingCube.cpp): residuals are the 3-vector
    quaternion-difference to the target orientation + angular velocity."""
    import os as _os

    from ..utils import math as _tm

    model = load_mjcf(
        _os.path.join(_MODELS_DIR, "floating_cube.xml"), dtype=dtype
    )
    sv = full_state_vector(model, dtype=dtype)
    cube = model.body_names.index("floating_cube")

    def residual_fn(m, data, targets):
        target_quat = _tm.quat_exp(targets[:3])
        diff = _tm.quat_log(
            _tm.quat_mul(_tm.quat_conj(data.xquat[cube]), target_quat)
        )
        return jnp.concatenate([diff, data.qvel[3:6] - targets[3:6]])

    def complete_fn(m, data, targets):
        target_quat = _tm.quat_exp(targets[:3])
        d = _tm.quat_log(
            _tm.quat_mul(_tm.quat_conj(data.xquat[cube]), target_quat)
        )
        dist = jnp.linalg.norm(d)
        return dist < 0.05, dist

    return Task(
        name="floating_cube",
        residual_names=(
            "orient_x", "orient_y", "orient_z",
            "angvel_x", "angvel_y", "angvel_z",
        ),
        residual_fn=residual_fn,
        task_complete_fn=complete_fn,
        model=model,
        sv=sv,
        residual_targets=jnp.array([1.0, 1.0, 1.0, 0, 0, 0], dtype=dtype),
        weights=jnp.array([0.1] * 3 + [0.01] * 3, dtype=dtype),
        weights_terminal=jnp.array([100.0] * 3 + [1.0] * 3, dtype=dtype),
        qpos_start=jnp.asarray(model.qpos0, dtype=dtype),
        qvel_start=jnp.zeros((model.nv,), dtype=dtype),
        keypoint_cfg=KeypointConfig(
            name="set_interval",
            min_N=1,
            max_N=20,
            jerk_thresholds=jnp.ones((6,), dtype),
            accel_thresholds=jnp.ones((6,), dtype),
            velocity_change_thresholds=jnp.ones((6,), dtype),
        ),
        openloop_horizon=300,
        mpc_horizon=20,
    )
