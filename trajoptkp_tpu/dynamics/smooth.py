"""Smooth (unconstrained) dynamics: mass matrix, bias forces, actuation.

TPU-native replacement for MuJoCo's mj_crb / mj_rne / mj_fwdActuation stages.
Instead of sequential Featherstone recursions, everything is expressed as
masked einsums over the precomputed ancestor/prefix topology masks
(`Model.ancestor_mask`, `Model.dof_dot_mask`):

    M        = sum_b (anc_b * cdof)^T  I_b  (anc_b * cdof)      (CRBA)
    cvel_b   = sum_i anc[b,i] cdof_i qvel_i
    cdofdot_i= cvel_pre(i) x cdof_i
    cacc_b   = [0;-g] + sum_i anc[b,i] cdofdot_i qvel_i
    bias_i   = sum_b anc[b,i] cdof_i . (I_b cacc_b + cvel_b x* I_b cvel_b)

This removes all sequential dependencies from the hot path (nv<=~30 here), so
the step function vmaps over thousands of FD perturbation columns /
line-search alphas / scenario instances with zero re-tracing — the TPU
analogue of the reference's per-thread mjData replicas
(`/root/reference/src/PhysicsSimulators/MuJoCoHelper.cpp:917-921`).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.math import cross_force, cross_motion
from .model import Data, Model, HINGE, SLIDE


def mass_matrix(model: Model, data: Data) -> jnp.ndarray:
    """Joint-space inertia matrix via the masked-einsum CRBA (nv, nv)."""
    X = model.ancestor_mask[:, :, None] * data.cdof[None, :, :]  # (nb, nv, 6)
    M = jnp.einsum("bif,bfg,bjg->ij", X, data.cinert, X)
    return M + jnp.diag(model.dof_armature)


def bias_force(model: Model, data: Data) -> jnp.ndarray:
    """Coriolis + centrifugal + gravity generalized force (mj_rne analogue)."""
    qvel = data.qvel
    cdof_v = data.cdof * qvel[:, None]                      # (nv, 6)
    cvel = model.ancestor_mask @ cdof_v                     # (nbody, 6)
    cvel_pre = model.dof_dot_mask @ cdof_v               # (nv, 6)
    cdofdot = cross_motion(cvel_pre, data.cdof)             # (nv, 6)
    a0 = jnp.concatenate(
        [jnp.zeros(3, dtype=qvel.dtype), -model.gravity]
    )
    cacc = a0[None, :] + model.ancestor_mask @ (cdofdot * qvel[:, None])
    Iv = jnp.einsum("bfg,bg->bf", data.cinert, cvel)
    cfrc = jnp.einsum("bfg,bg->bf", data.cinert, cacc) + cross_force(cvel, Iv)
    return jnp.einsum("bi,if,bf->i", model.ancestor_mask, data.cdof, cfrc)


def passive_force(model: Model, data: Data) -> jnp.ndarray:
    """Joint springs + dampers (mj_passive analogue, smooth part only).

    Scalar-joint springs are one vectorised gather/scatter; ball/free springs
    are unused by the task suite."""
    frc = -model.dof_damping * data.qvel
    if model.flex_edges:
        from .flex import flex_passive_force

        frc = frc + flex_passive_force(model, data)
    qadr = [model.jnt_qposadr[j] for j in range(model.njnt)
            if model.jnt_type[j] in (HINGE, SLIDE)]
    if not qadr:
        return frc
    dadr = jnp.array([model.jnt_dofadr[j] for j in range(model.njnt)
                      if model.jnt_type[j] in (HINGE, SLIDE)])
    jidx = jnp.array([j for j in range(model.njnt)
                      if model.jnt_type[j] in (HINGE, SLIDE)])
    qadr = jnp.array(qadr)
    spring = -model.jnt_stiffness[jidx] * (
        data.qpos[qadr] - model.qpos_spring[qadr]
    )
    return frc.at[dadr].add(spring)


def actuator_force(model: Model, data: Data) -> jnp.ndarray:
    """Direct-drive motors: qfrc_actuator from clamped ctrl (mj_fwdActuation).

    Control limits are respected exactly as the reference relies on them
    (`/root/reference/src/Differentiator/Differentiator.cpp:98-143` skips
    out-of-range FD nudges because MuJoCo clamps).
    """
    frc = jnp.zeros((model.nv,), dtype=data.qpos.dtype)
    if model.nu == 0:
        return frc
    lo = model.actuator_ctrlrange[:, 0]
    hi = model.actuator_ctrlrange[:, 1]
    limited = jnp.array(
        [1.0 if l else 0.0 for l in model.actuator_ctrllimited],
        dtype=data.qpos.dtype,
    )
    ctrl = jnp.where(
        limited > 0, jnp.clip(data.ctrl, lo, hi), data.ctrl
    )
    # scatter gear rows over each actuator's joint dof span
    from .model import dof_width as _dw

    dof_idx, act_idx, gear_col = [], [], []
    for a in range(model.nu):
        j = model.actuator_trnid[a]
        dadr = model.jnt_dofadr[j]
        for k in range(_dw(model.jnt_type[j])):
            dof_idx.append(dadr + k)
            act_idx.append(a)
            gear_col.append(k)
    force = ctrl[jnp.array(act_idx)] * model.actuator_gear[
        jnp.array(act_idx), jnp.array(gear_col)
    ]
    return frc.at[jnp.array(dof_idx)].add(force)


def fwd_velocity_smooth(model: Model, data: Data) -> Data:
    """Fill qM, qfrc_bias, qfrc_passive, qfrc_actuator on data."""
    return data.replace(
        qM=mass_matrix(model, data),
        qfrc_bias=bias_force(model, data),
        qfrc_passive=passive_force(model, data),
        qfrc_actuator=actuator_force(model, data),
    )
