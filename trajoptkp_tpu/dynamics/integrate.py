"""Position-space integration on the configuration manifold.

TPU equivalents of mj_integratePos / mj_differentiatePos, which the reference
FD engine uses for quaternion-aware position perturbations and for expressing
position rows of the A matrix on the tangent space
(`/root/reference/src/Differentiator/Differentiator.cpp:170,288,388`).

All scalar (hinge/slide) joints are processed in one vectorised gather /
scatter; only quaternion joints (ball, free) get per-joint treatment — this
keeps the op count (and XLA compile time) low for arm/walker-class models.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils import math as tm
from .model import BALL, FREE, HINGE, SLIDE, Model


def _scalar_maps(model: Model):
    qadr, dadr = [], []
    quat_joints = []
    for j in range(model.njnt):
        jt = model.jnt_type[j]
        if jt in (HINGE, SLIDE):
            qadr.append(model.jnt_qposadr[j])
            dadr.append(model.jnt_dofadr[j])
        else:
            quat_joints.append(j)
    return np.array(qadr, dtype=np.int32), np.array(dadr, dtype=np.int32), quat_joints


def integrate_pos(model: Model, qpos: jnp.ndarray, qvel: jnp.ndarray, dt):
    """qpos' = qpos (+) qvel * dt  — quaternion joints via the exp map.

    Free-joint linear velocity is world-frame; free/ball angular velocity is
    child-body-frame (MuJoCo convention), applied as a right-multiplied
    quaternion increment.
    """
    qadr, dadr, quat_joints = _scalar_maps(model)
    out = qpos
    if len(qadr):
        out = out.at[qadr].add(dt * qvel[dadr])
    for j in quat_joints:
        jt = model.jnt_type[j]
        qa, da = model.jnt_qposadr[j], model.jnt_dofadr[j]
        if jt == BALL:
            q = tm.quat_integrate(qpos[qa : qa + 4], qvel[da : da + 3], dt)
            out = out.at[qa : qa + 4].set(q)
        elif jt == FREE:
            out = out.at[qa : qa + 3].add(dt * qvel[da : da + 3])
            q = tm.quat_integrate(
                qpos[qa + 3 : qa + 7], qvel[da + 3 : da + 6], dt
            )
            out = out.at[qa + 3 : qa + 7].set(q)
    return out


def differentiate_pos(model: Model, qpos1: jnp.ndarray, qpos2: jnp.ndarray, dt=1.0):
    """Velocity v with qpos2 = qpos1 (+) v*dt  (mj_differentiatePos: (p2-p1)/dt)."""
    qadr, dadr, quat_joints = _scalar_maps(model)
    out = jnp.zeros((model.nv,), dtype=qpos1.dtype)
    if len(qadr):
        out = out.at[dadr].set((qpos2[qadr] - qpos1[qadr]) / dt)
    for j in quat_joints:
        jt = model.jnt_type[j]
        qa, da = model.jnt_qposadr[j], model.jnt_dofadr[j]
        if jt == BALL:
            out = out.at[da : da + 3].set(
                tm.quat_sub(qpos2[qa : qa + 4], qpos1[qa : qa + 4]) / dt
            )
        elif jt == FREE:
            out = out.at[da : da + 3].set(
                (qpos2[qa : qa + 3] - qpos1[qa : qa + 3]) / dt
            )
            out = out.at[da + 3 : da + 6].set(
                tm.quat_sub(
                    qpos2[qa + 3 : qa + 7], qpos1[qa + 3 : qa + 7]
                )
                / dt
            )
    return out
