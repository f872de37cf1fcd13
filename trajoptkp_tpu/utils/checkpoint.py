"""Trajectory / optimiser-state checkpointing.

The reference's only in-memory "checkpoint" is the mjData snapshot list +
rollout buffers (`/root/reference/src/Optimiser/Optimiser.cpp:416-469`,
`include/MuJoCoHelper.h:22-31`), with no persistence.  Here the nominal
trajectory is already a pytree, so checkpoint/resume is a save/load of
(qpos, qvel, ctrl, costs) plus optimiser scalars — enabling warm-started
re-optimisation and MPC hand-offs across processes, a capability the
reference lacks (SURVEY §5 "Checkpoint / resume").
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np


def save_trajectory(path: str, traj, lamb: Optional[float] = None,
                    meta: Optional[dict] = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "qpos": np.asarray(traj.qpos),
        "qvel": np.asarray(traj.qvel),
        "ctrl": np.asarray(traj.ctrl),
        "costs": np.asarray(traj.costs),
    }
    if getattr(traj, "warm", None) is not None:
        payload["warm"] = np.asarray(traj.warm)
    if lamb is not None:
        payload["lamb"] = np.asarray(lamb)
    for k, v in (meta or {}).items():
        payload[f"meta_{k}"] = np.asarray(v)
    np.savez(path, **payload)


def load_trajectory(path: str, dtype=None):
    """Returns (Trajectory, lamb or None)."""
    from ..solver.ilqr import Trajectory

    z = np.load(path)
    cast = (lambda x: jnp.asarray(x, dtype)) if dtype else jnp.asarray
    traj = Trajectory(
        qpos=cast(z["qpos"]),
        qvel=cast(z["qvel"]),
        ctrl=cast(z["ctrl"]),
        costs=cast(z["costs"]),
        warm=cast(z["warm"]) if "warm" in z else None,
    )
    lamb = float(z["lamb"]) if "lamb" in z else None
    return traj, lamb
