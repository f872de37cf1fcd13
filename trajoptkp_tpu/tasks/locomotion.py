"""Planar walker locomotion tasks (walker_walk / walker_run).

Mirrors walker (`/root/reference/src/ModelTranslator/Walker.cpp:59-88`) and
`TaskConfigs/locomotion/*.yaml`: residuals are body height (rootz), body
orientation (rooty), forward velocity (rootx qvel) and 6 control residuals;
set_interval keypoints minN=1 maxN=20, dt=0.005, MPC horizons 20-80.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from ..dynamics.mjcf import load_mjcf, load_mjcf_string
from ..keypoints.methods import KeypointConfig
from ..state.statevector import full_state_vector
from .base import Task

_MODELS_DIR = os.path.join(os.path.dirname(__file__), "..", "models")

_NDOF = 9
_NU = 6


def _uneven_terrain_xml(n_tiles: int = 24, seed: int = 3) -> str:
    """Static bump field in the walking direction (the reference's
    walker_uneven.xml terrain, `walk_uneven.yaml:1-2`; heightfield geometry
    realised here as a deterministic strip of shallow boxes — same collision
    behaviour through the plane/box narrow phase, no new primitive)."""
    import numpy as _np

    rng = _np.random.default_rng(seed)
    tiles = []
    x = 0.8
    for i in range(n_tiles):
        w = rng.uniform(0.25, 0.5)
        h = rng.uniform(0.01, 0.05)
        tiles.append(
            f'<geom name="bump_{i}" type="box" pos="{x + w:.3f} 0 {h / 2:.3f}"'
            f' size="{w:.3f} 1.0 {h / 2:.3f}"'
            ' friction="0.9 0.005 0.0001" rgba="0.5 0.4 0.3 1"/>'
        )
        x += 2 * w + rng.uniform(0.1, 0.4)
    return "\n    ".join(tiles)


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


def make_walker(run: bool = False, uneven: bool = False,
                dtype=jnp.float64) -> Task:
    xml_path = os.path.join(_MODELS_DIR, "walker.xml")
    if uneven:
        xml = open(xml_path).read()
        xml = xml.replace(
            '<geom name="floor" type="plane" size="50 2 0.1" '
            'friction="0.9 0.005 0.0001"/>',
            '<geom name="floor" type="plane" size="50 2 0.1" '
            'friction="0.9 0.005 0.0001"/>\n    ' + _uneven_terrain_xml(),
        )
        model = load_mjcf_string(xml, dtype=dtype)
    else:
        model = load_mjcf(xml_path, dtype=dtype)
    sv = full_state_vector(model, dtype=dtype)
    target_vel = 1.1 if run else 0.5
    name = "walker_run" if run else "walker_walk"
    if uneven:
        name = "walker_uneven"
    return Task(
        name=name,
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
