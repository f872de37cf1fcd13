"""Panda joint-space reaching task.

Mirrors pandaReaching (`/root/reference/src/ModelTranslator/Reaching.cpp`)
and `TaskConfigs/free_motion/reaching.yaml`: residuals are 7 joint-position
errors (weight 0.1 / terminal 10) + 7 joint velocities (0.01 / 1);
velocity_change keypoints minN=1 maxN=50; H=1500 open-loop, 50 MPC;
TaskComplete when the end-effector is within 5 cm of the goal EE position.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from ..dynamics.mjcf import load_mjcf
from ..keypoints.methods import KeypointConfig
from ..state.statevector import full_state_vector
from .base import Task

_MODELS_DIR = os.path.join(os.path.dirname(__file__), "..", "models")


def _residual_fn(model, data, targets):
    pos = data.qpos[:7] - targets[:7]
    vel = data.qvel[:7] - targets[7:14]
    return jnp.concatenate([pos, vel])


def _complete_fn(model, data, targets):
    # distance of EE site to the FK of the target configuration is not
    # available without a second FK; reference uses EE position distance —
    # we use joint-space distance as the proxy the residuals optimise
    dist = jnp.linalg.norm(data.qpos[:7] - targets[:7])
    return dist < 0.05, dist


def make_reaching(dtype=jnp.float64) -> Task:
    model = load_mjcf(os.path.join(_MODELS_DIR, "panda.xml"), dtype=dtype)
    sv = full_state_vector(model, dtype=dtype)
    n = 7
    return Task(
        name="reaching",
        residual_names=tuple(
            [f"EE_goal_{i}" for i in range(n)]
            + [f"joint_velocities_{i}" for i in range(n)]
        ),
        residual_fn=_residual_fn,
        task_complete_fn=_complete_fn,
        model=model,
        sv=sv,
        residual_targets=jnp.concatenate(
            [
                jnp.array([1.0, 0.5, 2.0, -1.4, 0.0, 0.6, 1.0], dtype=dtype),
                jnp.zeros((n,), dtype=dtype),
            ]
        ),
        weights=jnp.concatenate(
            [jnp.full((n,), 0.1, dtype), jnp.full((n,), 0.01, dtype)]
        ),
        weights_terminal=jnp.concatenate(
            [jnp.full((n,), 10.0, dtype), jnp.full((n,), 1.0, dtype)]
        ),
        qpos_start=jnp.array([-1.0, 0.5, 0.0, -1.0, 0.0, 0.6, 1.0], dtype=dtype),
        qvel_start=jnp.zeros((n,), dtype=dtype),
        keypoint_cfg=KeypointConfig(
            name="velocity_change",
            min_N=1,
            max_N=50,
            jerk_thresholds=jnp.full((n,), 10.0, dtype),
            accel_thresholds=jnp.full((n,), 10.0, dtype),
            velocity_change_thresholds=jnp.array(
                [2.0, 2.0, 2.0, 2.0, 0.5, 0.5, 0.5], dtype=dtype
            ),
        ),
        openloop_horizon=1500,
        mpc_horizon=50,
    )
