"""State-vector abstraction: named DoF selection + tangent-space coordinates.

TPU-native equivalent of the reference's `stateVectorList`
(`/root/reference/include/StdInclude.h:110-188`) and the ModelTranslator
get/set machinery (`src/ModelTranslator/ModelTranslator.cpp:882-1546`,
`ComputeStateDofAdrIndices` `:1548-1705`).

Design differences (deliberate, for XLA):
  - Trajectories are stored as full (qpos, qvel) arrays; the optimiser's state
    x lives on the *tangent space* of the configuration manifold (dimension
    nv), matching the reference's A-matrix semantics which already uses
    mj_differentiatePos for quaternion position rows.
  - State-vector reduction (iLQR_SVR) is a boolean `active` mask over tangent
    dofs with static shapes — masking replaces the reference's dynamic matrix
    reallocation (`src/Optimiser/iLQR.cpp:37-200`), which XLA cannot do.

A "state dof" is identified 1:1 with a qvel index; names are derived from
joint names (scalar joints), or body name + lin_{x,y,z}/ang_{x,y,z} for free
joints, mirroring the reference's naming scheme
(`ModelTranslator_Test.cpp:27-43` conventions).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..dynamics.integrate import differentiate_pos, integrate_pos
from ..dynamics.model import BALL, FREE, HINGE, SLIDE, Model

_FREE_SUFFIX = ("lin_x", "lin_y", "lin_z", "ang_x", "ang_y", "ang_z")
_BALL_SUFFIX = ("ang_x", "ang_y", "ang_z")


def dof_names(model: Model) -> Tuple[str, ...]:
    """One name per qvel index."""
    names = [""] * model.nv
    for j in range(model.njnt):
        jt = model.jnt_type[j]
        dadr = model.jnt_dofadr[j]
        jname = model.joint_names[j]
        bname = model.body_names[model.jnt_bodyid[j]]
        if jt in (HINGE, SLIDE):
            names[dadr] = jname
        elif jt == BALL:
            for k, s in enumerate(_BALL_SUFFIX):
                names[dadr + k] = f"{bname}_{s}"
        elif jt == FREE:
            for k, s in enumerate(_FREE_SUFFIX):
                names[dadr + k] = f"{bname}_{s}"
    return tuple(names)


@struct.dataclass
class StateVector:
    """Selection of tangent dofs forming the optimisation state.

    `order` (static): tangent-dof indices included in the state, in state
    order — fixed for a given task topology.  `active` (traced, (ndof,)):
    1.0/0.0 per *state* dof, flipped online by iLQR_SVR; shapes never change.
    """

    names: Tuple[str, ...] = struct.field(pytree_node=False)
    order: Tuple[int, ...] = struct.field(pytree_node=False)  # qvel indices
    active: jnp.ndarray = None  # (ndof,) float mask

    @property
    def ndof(self) -> int:
        return len(self.order)

    @property
    def nx(self) -> int:
        return 2 * self.ndof

    def name_index(self, name: str) -> int:
        return self.names.index(name)


def full_state_vector(model: Model, dtype=jnp.float64) -> StateVector:
    names = dof_names(model)
    return StateVector(
        names=names,
        order=tuple(range(model.nv)),
        active=jnp.ones((model.nv,), dtype=dtype),
    )


def state_vector_from_names(
    model: Model, selected: Sequence[str], dtype=jnp.float64
) -> StateVector:
    all_names = dof_names(model)
    order = tuple(all_names.index(n) for n in selected)
    return StateVector(
        names=tuple(selected),
        order=order,
        active=jnp.ones((len(order),), dtype=dtype),
    )


# ---------------------------------------------------------------------------
# Tangent-space coordinates
# ---------------------------------------------------------------------------


def to_tangent(
    model: Model,
    sv: StateVector,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    qpos_ref: jnp.ndarray,
    qvel_ref: jnp.ndarray,
) -> jnp.ndarray:
    """dx = [d_pos(qpos_ref -> qpos); qvel - qvel_ref][selected], masked.

    The position block uses the quaternion-aware difference — exactly the
    reference's delta_x construction in the forward pass
    (`/root/reference/src/Optimiser/iLQR.cpp:845-890`).
    """
    idx = jnp.array(sv.order)
    dpos = differentiate_pos(model, qpos_ref, qpos)[idx]
    dvel = (qvel - qvel_ref)[idx]
    return jnp.concatenate([dpos * sv.active, dvel * sv.active])


def apply_tangent(
    model: Model,
    sv: StateVector,
    qpos_ref: jnp.ndarray,
    qvel_ref: jnp.ndarray,
    dx: jnp.ndarray,
):
    """(qpos, qvel) = ref (+) dx: scatter the reduced tangent into full coords."""
    nd = sv.ndof
    idx = jnp.array(sv.order)
    dpos_full = jnp.zeros((model.nv,), dtype=dx.dtype).at[idx].set(
        dx[:nd] * sv.active
    )
    dvel_full = jnp.zeros((model.nv,), dtype=dx.dtype).at[idx].set(
        dx[nd:] * sv.active
    )
    qpos = integrate_pos(model, qpos_ref, dpos_full, 1.0)
    qvel = qvel_ref + dvel_full
    return qpos, qvel


def positions_of(sv: StateVector, qpos: jnp.ndarray, model: Model) -> jnp.ndarray:
    """Absolute scalar positions of the selected dofs (valid for scalar joints
    and free-joint translations; quaternion dofs return tangent-from-qpos0)."""
    ref = model.qpos0
    dpos = differentiate_pos(model, ref, qpos)
    # scalar joints: differentiate against qpos0 then add qpos0 value back to
    # recover absolute coordinates where they exist
    out = []
    vel_to_qpos = {}
    for j in range(model.njnt):
        jt = model.jnt_type[j]
        if jt in (HINGE, SLIDE):
            vel_to_qpos[model.jnt_dofadr[j]] = model.jnt_qposadr[j]
        elif jt == FREE:
            for k in range(3):
                vel_to_qpos[model.jnt_dofadr[j] + k] = model.jnt_qposadr[j] + k
    for i in sv.order:
        if i in vel_to_qpos:
            out.append(qpos[vel_to_qpos[i]])
        else:
            out.append(dpos[i])
    return jnp.stack(out)
