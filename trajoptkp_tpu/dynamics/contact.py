"""Contact + joint-limit constraint solver (stub — lands with milestone 2).

Will implement: primitive narrow-phase (plane-sphere/capsule/box,
sphere-sphere, capsule-capsule, box-plane via corner points), MuJoCo-style
soft-constraint model (solref/solimp) with pyramidal friction, solved by a
fixed-iteration projected Gauss-Seidel / CG in dual space — static shapes
over the precomputed candidate pair list.
"""

from __future__ import annotations

import jax.numpy as jnp

from .model import Data, Model


def solve_constraints(model: Model, data: Data, qfrc_smooth: jnp.ndarray) -> Data:
    return data.replace(qfrc_constraint=jnp.zeros_like(qfrc_smooth))
