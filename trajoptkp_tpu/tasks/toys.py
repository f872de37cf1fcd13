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
    """Acrobot swing-up (reference Acrobot.cpp + TaskConfigs/toys/acrobot.yaml):
    start [3.1415, 0.3], goal [0, 0]; weights 0/100 on joints, 0.001/1 on
    velocities, 100/100 on torque; velocity_change keypoints minN=1 maxN=100."""
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
        residual_targets=jnp.array([0.0, 0.0, 0.0, 0.0, 0.0], dtype=dtype),
        weights=jnp.array([0.0, 0.0, 0.001, 0.001, 100.0], dtype=dtype),
        weights_terminal=jnp.array([100.0, 100.0, 1.0, 1.0, 100.0], dtype=dtype),
        qpos_start=jnp.array([3.1415, 0.3], dtype=dtype),
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
