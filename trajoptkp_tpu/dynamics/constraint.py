"""Constraint forces: joint limits + contacts (MuJoCo-style soft constraints).

This module fills data.qfrc_constraint.  Round-1 milestone order per
SURVEY.md §7: smooth dynamics first (this file starts as a zero hook), then
the primitive-contact solver (sphere/capsule/box vs plane & pairwise) for the
PistonBlock → TwoDPushing tasks.
"""

from __future__ import annotations

import jax.numpy as jnp

from .model import Data, Model


def constraint_force(model: Model, data: Data, qfrc_smooth: jnp.ndarray,
                     solver_iters: int = None) -> Data:
    if not model.contact_pairs and not any(model.jnt_limited):
        return data.replace(qfrc_constraint=jnp.zeros_like(qfrc_smooth))
    # real solver lands with the contact milestone
    from .contact import solve_constraints  # local import to avoid cycles

    return solve_constraints(model, data, qfrc_smooth, solver_iters)
