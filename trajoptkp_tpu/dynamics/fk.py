"""Forward kinematics + composite motion/inertia quantities.

Replaces MuJoCo's mj_kinematics / mj_comPos stage for the TPU engine.  The
body loop is unrolled at trace time (topology is static and small: 2-20
bodies); all arithmetic is jnp, so the whole FK fuses into the surrounding
XLA computation and vmaps cleanly over batches of states (FD columns,
line-search alphas, scenario instances).

World-frame spatial vectors use the [angular; linear-at-origin] convention;
``cdof`` rows are per-dof twists about the world origin, and ``cinert`` is the
6x6 world-frame spatial inertia of each body about the world origin.  Unlike
MuJoCo (which centers at the subtree CoM for conditioning) we center at the
origin — algebraically equivalent, cheaper to batch; scenes here span a few
meters so conditioning is a non-issue in f32/f64.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import math as tm
from .model import BALL, FREE, HINGE, SLIDE, Data, Model, dof_width, qpos_width


def _joint_transform(model: Model, j: int, qpos, xpos, xquat):
    """Apply joint j's transform to the accumulated body frame (xpos, xquat).

    Mirrors mj_kinematics' per-joint update: the anchor/axis are evaluated in
    the frame accumulated so far, then the joint motion is applied about them.
    """
    jt = model.jnt_type[j]
    qadr = model.jnt_qposadr[j]
    if jt == FREE:
        # global pose of the body frame
        xpos = qpos[qadr : qadr + 3]
        xquat = tm.quat_normalize(qpos[qadr + 3 : qadr + 7])
        return xpos, xquat
    anchor = tm.quat_rotate(xquat, model.jnt_pos[j]) + xpos
    if jt == SLIDE:
        axis_w = tm.quat_rotate(xquat, model.jnt_axis[j])
        ref = model.qpos0[qadr]
        xpos = xpos + axis_w * (qpos[qadr] - ref)
    elif jt == HINGE:
        ref = model.qpos0[qadr]
        qloc = tm.quat_exp(model.jnt_axis[j] * (qpos[qadr] - ref))
        xquat = tm.quat_mul(xquat, qloc)
        xpos = anchor - tm.quat_rotate(xquat, model.jnt_pos[j])
    elif jt == BALL:
        qloc = tm.quat_normalize(qpos[qadr : qadr + 4])
        xquat = tm.quat_mul(xquat, qloc)
        xpos = anchor - tm.quat_rotate(xquat, model.jnt_pos[j])
    return xpos, xquat


def _chain_segments(model: Model):
    """Host-side: partition bodies 1..nbody-1 into maximal scannable chains.

    A chain is a run of consecutive body ids where each body has exactly one
    HINGE or SLIDE joint and its parent is the previous body in the run.
    Serial manipulators (the panda) collapse into a single lax.scan whose
    body is traced once — cutting the step function's op count (and XLA
    compile time) by ~an order of magnitude vs full unrolling.
    """
    body_joints = [[] for _ in range(model.nbody)]
    for j, b in enumerate(model.jnt_bodyid):
        body_joints[b].append(j)

    segments = []  # ("chain", [b...]) | ("body", b)
    b = 1
    while b < model.nbody:
        run = []
        cur = b
        while (
            cur < model.nbody
            and len(body_joints[cur]) == 1
            and model.jnt_type[body_joints[cur][0]] in (HINGE, SLIDE)
            and (model.body_parent[cur] == cur - 1 if run else True)
            and (not run or model.body_parent[cur] == run[-1])
        ):
            run.append(cur)
            cur += 1
        if len(run) >= 3:
            segments.append(("chain", run))
            b = run[-1] + 1
        else:
            segments.append(("body", b))
            b += 1
    return segments, body_joints


def _scan_chain(model: Model, qpos, xp0, xq0, bodies, body_joints):
    """FK over a hinge/slide chain via lax.scan.

    Returns (xpos (k,3), xquat (k,4), cdof (k,6)) in chain order, plus the
    final frame.
    """
    dtype = qpos.dtype
    js = [body_joints[b][0] for b in bodies]
    b_pos = model.body_pos[jnp.array(bodies)]
    b_quat = model.body_quat[jnp.array(bodies)]
    j_pos = model.jnt_pos[jnp.array(js)]
    j_axis = model.jnt_axis[jnp.array(js)]
    q = jnp.stack([qpos[model.jnt_qposadr[j]] for j in js])
    ref = jnp.stack([model.qpos0[model.jnt_qposadr[j]] for j in js])
    is_slide = jnp.array(
        [1.0 if model.jnt_type[j] == SLIDE else 0.0 for j in js], dtype=dtype
    )

    def body_fn(carry, inp):
        xp_p, xq_p = carry
        bp, bq, jp, ja, qv, rf, slide = inp
        xq = tm.quat_mul(xq_p, bq)
        xp = xp_p + tm.quat_rotate(xq_p, bp)
        anchor = tm.quat_rotate(xq, jp) + xp
        # hinge branch
        qloc = tm.quat_exp(ja * (qv - rf))
        xq_h = tm.quat_mul(xq, qloc)
        xp_h = anchor - tm.quat_rotate(xq_h, jp)
        a_h = tm.quat_rotate(xq_h, ja)
        cdof_h = jnp.concatenate([a_h, jnp.cross(anchor, a_h)])
        # slide branch
        axis_w = tm.quat_rotate(xq, ja)
        xp_s = xp + axis_w * (qv - rf)
        cdof_s = jnp.concatenate([jnp.zeros(3, dtype=dtype), axis_w])
        xq_n = jnp.where(slide > 0, xq, xq_h)
        xp_n = jnp.where(slide > 0, xp_s, xp_h)
        cdof = jnp.where(slide > 0, cdof_s, cdof_h)
        return (xp_n, xq_n), (xp_n, xq_n, cdof)

    # unroll: chains are short (<=10 links); a rolled scan inside the step
    # function costs a nested-loop dispatch per link, which dominates the
    # per-step latency of rollout/line-search scans on TPU
    (xpf, xqf), (xps, xqs, cdofs) = jax.lax.scan(
        body_fn, (xp0, xq0), (b_pos, b_quat, j_pos, j_axis, q, ref, is_slide),
        unroll=True,
    )
    return xps, xqs, cdofs, xpf, xqf


def forward_kinematics(model: Model, data: Data) -> Data:
    """Compute world poses for bodies/geoms/sites and the cdof/cinert tables."""
    qpos = data.qpos
    dtype = qpos.dtype

    xpos_list = [jnp.zeros(3, dtype=dtype)]
    xquat_list = [tm.quat_identity(dtype)]

    segments, body_joints = _chain_segments(model)
    cdof_rows = [None] * model.nv

    for kind, item in segments:
        if kind == "chain":
            bodies = item
            p = model.body_parent[bodies[0]]
            xps, xqs, cdofs, _, _ = _scan_chain(
                model, qpos, xpos_list[p], xquat_list[p], bodies, body_joints
            )
            for i, b in enumerate(bodies):
                xpos_list.append(xps[i])
                xquat_list.append(xqs[i])
                cdof_rows[model.jnt_dofadr[body_joints[b][0]]] = cdofs[i]
            continue
        b = item
        p = model.body_parent[b]
        xq = tm.quat_mul(xquat_list[p], model.body_quat[b])
        xp = xpos_list[p] + tm.quat_rotate(xquat_list[p], model.body_pos[b])
        for j in body_joints[b]:
            # anchor/axis in the frame accumulated so far — also the cdof frame
            jt = model.jnt_type[j]
            dadr = model.jnt_dofadr[j]
            if jt == FREE:
                xp, xq = _joint_transform(model, j, qpos, xp, xq)
                # 3 translational dofs: world-aligned
                eye = jnp.eye(3, dtype=dtype)
                zero = jnp.zeros(3, dtype=dtype)
                for k in range(3):
                    cdof_rows[dadr + k] = jnp.concatenate([zero, eye[k]])
                # 3 rotational dofs: child-frame axes (MuJoCo convention),
                # rotation about the body frame origin
                R = tm.quat_to_mat(xq)
                for k in range(3):
                    a = R[:, k]
                    cdof_rows[dadr + 3 + k] = jnp.concatenate(
                        [a, jnp.cross(xp, a)]
                    )
            elif jt in (HINGE, BALL):
                anchor = tm.quat_rotate(xq, model.jnt_pos[j]) + xp
                xp, xq = _joint_transform(model, j, qpos, xp, xq)
                if jt == HINGE:
                    a = tm.quat_rotate(xq, model.jnt_axis[j])
                    cdof_rows[dadr] = jnp.concatenate([a, jnp.cross(anchor, a)])
                else:  # BALL: axes are child-frame axes after rotation
                    R = tm.quat_to_mat(xq)
                    for k in range(3):
                        a = R[:, k]
                        cdof_rows[dadr + k] = jnp.concatenate(
                            [a, jnp.cross(anchor, a)]
                        )
            elif jt == SLIDE:
                axis_w = tm.quat_rotate(xq, model.jnt_axis[j])
                xp, xq = _joint_transform(model, j, qpos, xp, xq)
                cdof_rows[dadr] = jnp.concatenate(
                    [jnp.zeros(3, dtype=dtype), axis_w]
                )
        xpos_list.append(xp)
        xquat_list.append(xq)

    xpos = jnp.stack(xpos_list)
    xquat = jnp.stack(xquat_list)
    cdof = (
        jnp.stack(cdof_rows)
        if model.nv
        else jnp.zeros((0, 6), dtype=dtype)
    )

    # inertial frames
    R_body = tm.quat_to_mat(xquat)
    xipos = xpos + jnp.einsum("bij,bj->bi", R_body, model.body_ipos)
    ximat = jnp.einsum(
        "bij,bjk->bik", R_body, tm.quat_to_mat(model.body_iquat)
    )

    # world-frame spatial inertia about the origin:
    #   [[I_c + m chat chat^T, m chat], [m chat^T, m I]]
    Ic = jnp.einsum(
        "bij,bj,bkj->bik", ximat, model.body_inertia, ximat
    )
    m = model.body_mass
    chat = tm.hat(xipos)
    upper_left = Ic + m[:, None, None] * jnp.einsum(
        "bij,bkj->bik", chat, chat
    )
    upper_right = m[:, None, None] * chat
    lower_left = -upper_right  # m * chat^T
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (model.nbody, 3, 3))
    lower_right = m[:, None, None] * eye3
    cinert = jnp.concatenate(
        [
            jnp.concatenate([upper_left, upper_right], axis=2),
            jnp.concatenate([lower_left, lower_right], axis=2),
        ],
        axis=1,
    )

    # sites / geoms
    if model.nsite:
        sb = jnp.array(model.site_bodyid)
        site_xpos = xpos[sb] + jnp.einsum(
            "sij,sj->si", R_body[sb], model.site_pos
        )
        site_xmat = jnp.einsum(
            "sij,sjk->sik", R_body[sb], tm.quat_to_mat(model.site_quat)
        )
    else:
        site_xpos = jnp.zeros((0, 3), dtype=dtype)
        site_xmat = jnp.zeros((0, 3, 3), dtype=dtype)
    if model.ngeom:
        gb = jnp.array(model.geom_bodyid)
        geom_xpos = xpos[gb] + jnp.einsum(
            "gij,gj->gi", R_body[gb], model.geom_pos
        )
        geom_xmat = jnp.einsum(
            "gij,gjk->gik", R_body[gb], tm.quat_to_mat(model.geom_quat)
        )
    else:
        geom_xpos = jnp.zeros((0, 3), dtype=dtype)
        geom_xmat = jnp.zeros((0, 3, 3), dtype=dtype)

    return data.replace(
        xpos=xpos,
        xquat=xquat,
        xipos=xipos,
        ximat=ximat,
        site_xpos=site_xpos,
        site_xmat=site_xmat,
        geom_xpos=geom_xpos,
        geom_xmat=geom_xmat,
        cdof=cdof,
        cinert=cinert,
    )


def body_jacobian(model: Model, data: Data, body_id: int, point: jnp.ndarray):
    """Translational + rotational Jacobian of a world-frame point on a body.

    TPU equivalent of MuJoCoHelper's mj_jacBody wrapper
    (`/root/reference/src/PhysicsSimulators/MuJoCoHelper.cpp:562-587`), used by
    the pushing tasks' IK-servo init-control generator.

    Returns (jacp, jacr): (3, nv) each.
    """
    mask = data.cdof.dtype.type(1) * model.ancestor_mask[body_id]  # (nv,)
    w = data.cdof[:, :3]  # angular parts
    v = data.cdof[:, 3:]  # linear-at-origin parts
    # velocity of `point`: v + w x point
    jacp = (v + jnp.cross(w, jnp.broadcast_to(point, w.shape))) * mask[:, None]
    jacr = w * mask[:, None]
    return jacp.T, jacr.T
