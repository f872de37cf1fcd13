"""Planar walker locomotion tasks (walker_walk / walker_run).

Mirrors walker (`/root/reference/src/ModelTranslator/Walker.cpp:59-88`) and
`TaskConfigs/locomotion/*.yaml`: residuals are body height (rootz), body
orientation (rooty), forward velocity (rootx qvel) and 6 control residuals;
set_interval keypoints minN=1 maxN=20, dt=0.005, MPC horizons 20-80.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from ..dynamics.mjcf import load_mjcf
from ..keypoints.methods import KeypointConfig
from ..state.statevector import full_state_vector
from .base import Task

_MODELS_DIR = os.path.join(os.path.dirname(__file__), "..", "models")

_NDOF = 9
_NU = 6


def _residual_fn(model, data, targets):
    # joint order: rootz, rootx, rooty, then legs (walker.xml declaration)
    height = data.qpos[0] - targets[0]
    orient = data.qpos[2] - targets[1]
    fwd_vel = data.qvel[1] - targets[2]
    ctrl = data.ctrl - targets[3 : 3 + _NU]
    return jnp.concatenate(
        [jnp.stack([height, orient, fwd_vel]), ctrl]
    )


def _complete_fn(model, data, targets):
    # locomotion never "completes" (Walker.cpp:27-30)
    return jnp.zeros((), bool), jnp.zeros((), data.qpos.dtype)


def make_walker(run: bool = False, dtype=jnp.float64) -> Task:
    model = load_mjcf(os.path.join(_MODELS_DIR, "walker.xml"), dtype=dtype)
    sv = full_state_vector(model, dtype=dtype)
    target_vel = 1.1 if run else 0.5
    return Task(
        name="walker_run" if run else "walker_walk",
        residual_names=(
            "body_height", "body_orientation", "body_velocity",
            *(f"body_controls_{i}" for i in range(_NU)),
        ),
        residual_fn=_residual_fn,
        task_complete_fn=_complete_fn,
        model=model,
        sv=sv,
        residual_targets=jnp.concatenate(
            [
                jnp.array([0.0, 0.0, target_vel], dtype=dtype),
                jnp.zeros((_NU,), dtype=dtype),
            ]
        ),
        weights=jnp.array(
            [1.0, 0.1, 0.1] + [0.0] * _NU, dtype=dtype
        ),
        weights_terminal=jnp.array(
            [1.0, 0.1, 0.1] + [0.0] * _NU, dtype=dtype
        ),
        qpos_start=jnp.array(
            [0.0, 0.0, 0.0, 1.0, -1.0, 0.2, 0.0, 0.0, 0.0], dtype=dtype
        ),
        qvel_start=jnp.zeros((_NDOF,), dtype=dtype),
        keypoint_cfg=KeypointConfig(
            name="set_interval",
            min_N=1,
            max_N=20,
            jerk_thresholds=jnp.full((_NDOF,), 1e-15, dtype),
            accel_thresholds=jnp.full((_NDOF,), 1e-15, dtype),
            velocity_change_thresholds=jnp.array(
                [0.1, 0.1, 0.01, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0], dtype=dtype
            ),
        ),
        openloop_horizon=500,
        mpc_horizon=40,
    )
