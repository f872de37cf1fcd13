"""Position-space integration on the configuration manifold.

TPU equivalents of mj_integratePos / mj_differentiatePos, which the reference
FD engine uses for quaternion-aware position perturbations and for expressing
position rows of the A matrix on the tangent space
(`/root/reference/src/Differentiator/Differentiator.cpp:170,288,388`).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import math as tm
from .model import BALL, FREE, HINGE, SLIDE, Model


def integrate_pos(model: Model, qpos: jnp.ndarray, qvel: jnp.ndarray, dt):
    """qpos' = qpos (+) qvel * dt  — quaternion joints via the exp map.

    Free-joint linear velocity is world-frame; free/ball angular velocity is
    child-body-frame (MuJoCo convention), applied as a right-multiplied
    quaternion increment.
    """
    out = []
    for j in range(model.njnt):
        jt = model.jnt_type[j]
        qadr, dadr = model.jnt_qposadr[j], model.jnt_dofadr[j]
        if jt in (HINGE, SLIDE):
            out.append(qpos[qadr : qadr + 1] + dt * qvel[dadr : dadr + 1])
        elif jt == BALL:
            q = tm.quat_integrate(qpos[qadr : qadr + 4], qvel[dadr : dadr + 3], dt)
            out.append(q)
        elif jt == FREE:
            out.append(qpos[qadr : qadr + 3] + dt * qvel[dadr : dadr + 3])
            q = tm.quat_integrate(
                qpos[qadr + 3 : qadr + 7], qvel[dadr + 3 : dadr + 6], dt
            )
            out.append(q)
    if not out:
        return qpos
    return jnp.concatenate(out)


def differentiate_pos(model: Model, qpos1: jnp.ndarray, qpos2: jnp.ndarray, dt=1.0):
    """Velocity v with qpos2 = qpos1 (+) v*dt  (mj_differentiatePos: (p2-p1)/dt)."""
    out = []
    for j in range(model.njnt):
        jt = model.jnt_type[j]
        qadr = model.jnt_qposadr[j]
        if jt in (HINGE, SLIDE):
            out.append((qpos2[qadr : qadr + 1] - qpos1[qadr : qadr + 1]) / dt)
        elif jt == BALL:
            out.append(
                tm.quat_sub(qpos2[qadr : qadr + 4], qpos1[qadr : qadr + 4]) / dt
            )
        elif jt == FREE:
            out.append((qpos2[qadr : qadr + 3] - qpos1[qadr : qadr + 3]) / dt)
            out.append(
                tm.quat_sub(
                    qpos2[qadr + 3 : qadr + 7], qpos1[qadr + 3 : qadr + 7]
                )
                / dt
            )
    if not out:
        return jnp.zeros((0,), dtype=qpos1.dtype)
    return jnp.concatenate(out)
