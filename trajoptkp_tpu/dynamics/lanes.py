"""Lane-last ("register-style") smooth dynamics: the TPU throughput engine.

Why this exists — the generic engine (fk.py / smooth.py / step.py) is written
per-state and batched with `vmap`, which puts the batch on the LEADING axis of
every intermediate.  TPU tiles the two MINORMOST dimensions of every
materialised buffer to (8, 128): a vmapped intermediate shaped
(lanes, nbody, 6, 6) pads 6->8 and 6->128, a ~28x inflation, and the
derivative/line-search phases become pure HBM-bandwidth burns on padding
(measured: the acrobot derivative phase accesses 53 GB to do 1.2 GFLOP).

Here the physics is written the other way round: the BATCH dimension is the
MINORMOST axis of everything.  Every logical scalar of the computation is a
"register" — a jnp array of shape (..., L) over L lanes — and all structure
(bodies, joints, 3-vectors, quaternions, matrix entries) lives in Python
tuples/lists that unroll at trace time.  Every HLO op is elementwise over the
lane axis: XLA fuses long chains of them into a handful of VPU kernels with
zero tile padding, and `jax.jvp`/`jacfwd` tangents batch as a small leading
axis (k, L) — still lane-minor.  This is the speed-of-light layout for
small-n robotics models on TPU.

Round 5 added a SECOND style for the hot inner algebra (CRBA / mass matrix
/ Newton constraint solve): STACKED lane-last tensors ((nv, nv, L) etc.)
with einsum contractions.  The register form traces ~36k StableHLO ops per
arm-scale step — which stalled the TPU compiler (41-minute jacobian-phase
compiles) and made B=1 MPC replans launch-latency-bound — while the
stacked form is ~2x smaller in graph and wins at small batch; the register
form still wins large-batch rollout/line-search throughput, where XLA
fuses the scalar chains into few kernels.  `build_smooth_step(stacked=...)`
selects; solver phases pick per role (see ILQRConfig.lane_step_stacked).
Constraint-solve tangents use the implicit-function rule in BOTH styles
(custom_jvp at the converged point, matching contact._newton_solver).

Semantics are IDENTICAL to step.py's smooth path (mj_kinematics / mj_crb /
mj_rne / mj_fwdActuation / implicit-damping Euler — the function the
reference differentiates, `/root/reference/src/Differentiator/
Differentiator.cpp:8-462`); tests/test_lanes.py pins lane-engine outputs to
the generic engine to 1e-10 in f64.

Scope: HINGE/SLIDE/FREE joints, joint limits, and contacts between
plane/sphere/capsule/cylinder primitives plus boxes against those
primitives (plane-box 4-deepest-corner manifold, sphere/capsule/cylinder-
box closest-point probes) — the acrobot/reaching/pushing/threeD_push/
box_sweep task families.  Limits and contacts run through a register-style
projected-Newton constraint solve matching dynamics/contact.py exactly.
`lanes_supported(model)` gates dispatch; ball joints, flex and box-box
contact pairs fall back to the generic engine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .model import (GEOM_BOX, GEOM_CAPSULE, GEOM_CYLINDER, GEOM_PLANE,
                    GEOM_SPHERE, FREE, HINGE, SLIDE, Model)

__all__ = [
    "lanes_supported", "build_smooth_step", "build_fk_products",
    "build_tangent_ops",
]


# contact-pair type combinations the lane narrow phase implements
_LANE_COLLIDERS = {
    (GEOM_PLANE, GEOM_CYLINDER),
    (GEOM_PLANE, GEOM_CAPSULE),
    (GEOM_PLANE, GEOM_SPHERE),
    (GEOM_SPHERE, GEOM_SPHERE),
    (GEOM_SPHERE, GEOM_CYLINDER),
    (GEOM_SPHERE, GEOM_CAPSULE),
    (GEOM_CAPSULE, GEOM_CAPSULE),
    (GEOM_CAPSULE, GEOM_CYLINDER),
    (GEOM_CYLINDER, GEOM_CYLINDER),
    (GEOM_PLANE, GEOM_BOX),
    (GEOM_SPHERE, GEOM_BOX),
    (GEOM_CAPSULE, GEOM_BOX),
    (GEOM_CYLINDER, GEOM_BOX),
}


def lanes_supported(model: Model) -> bool:
    """True when the lane engine covers this model's dynamics exactly:
    HINGE/SLIDE/FREE joints, joint limits, and contacts between the
    primitive pairs in _LANE_COLLIDERS (plane/sphere/capsule/cylinder
    family plus box-vs-primitive — the pushing/reaching/threeD_push/
    box_sweep task suite); no ball joints, no flex, no box-box pairs
    (box stacking falls back to the generic SAT+clipping engine).
    """
    jt = [int(t) for t in np.asarray(model.jnt_type)]
    if any(t not in (HINGE, SLIDE, FREE) for t in jt):
        return False
    tp = [int(t) for t in np.asarray(model.geom_type)]
    for (g1, g2) in model.contact_pairs:
        pair = (tp[g1], tp[g2])
        if pair not in _LANE_COLLIDERS and pair[::-1] not in _LANE_COLLIDERS:
            return False
    if model.flex_edges:
        return False
    if model.nu:
        # actuators must drive scalar joints (direct-drive gear row 0)
        for a in range(model.nu):
            j = int(np.asarray(model.actuator_trnid)[a])
            if int(np.asarray(model.jnt_type)[j]) not in (HINGE, SLIDE):
                return False
    return True


# --- register-vector helpers (tuples of (..., L) arrays) --------------------


def _v3(*xs):
    return tuple(xs)


def _vadd(a, b):
    return tuple(x + y for x, y in zip(a, b))


def _vsub(a, b):
    return tuple(x - y for x, y in zip(a, b))


def _vscale(a, s):
    return tuple(x * s for x in a)


def _vdot(a, b):
    return sum(x * y for x, y in zip(a, b))


def _vcross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _qmul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    )


def _qrot(q, v):
    """Rotate register 3-vector v by register quaternion q (matches
    utils.math.quat_rotate: v + 2w (u x v) + 2 u x (u x v))."""
    w = q[0]
    u = (q[1], q[2], q[3])
    uv = _vcross(u, v)
    uuv = _vcross(u, uv)
    return (
        v[0] + 2.0 * (w * uv[0] + uuv[0]),
        v[1] + 2.0 * (w * uv[1] + uuv[1]),
        v[2] + 2.0 * (w * uv[2] + uuv[2]),
    )


def _qmat(q):
    """Quaternion -> 3x3 rotation (nested tuple), matches quat_to_mat."""
    w, x, y, z = q
    return (
        (1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)),
        (2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)),
        (2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)),
    )


def _mat_vec(R, v):
    return tuple(sum(R[i][j] * v[j] for j in range(3)) for i in range(3))


def _qnorm(q):
    n = jnp.sqrt(jnp.maximum(
        q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3], 1e-24
    ))
    return tuple(x / n for x in q)


def _qexp_reg(v):
    """Rotation-vector registers -> quaternion registers
    (utils.math.quat_exp, same double-where autodiff guards)."""
    sumsq = v[0] * v[0] + v[1] * v[1] + v[2] * v[2]
    small = sumsq < 1e-18
    angle = jnp.sqrt(jnp.where(small, 1.0, sumsq))
    half = 0.5 * angle
    sinc_half = jnp.where(small, 0.5 - sumsq / 48.0, jnp.sin(half) / angle)
    w = jnp.where(small, 1.0 - sumsq / 8.0, jnp.cos(half))
    return (w, v[0] * sinc_half, v[1] * sinc_half, v[2] * sinc_half)


def _qlog_reg(q):
    """Quaternion registers -> rotation-vector registers
    (utils.math.quat_log: normalize, short geodesic, guarded scale)."""
    q = _qnorm(q)
    sgn = jnp.where(q[0] < 0, -1.0, 1.0)
    q = tuple(sgn * x for x in q)
    w = jnp.clip(q[0], -1.0, 1.0)
    sumsq = q[1] * q[1] + q[2] * q[2] + q[3] * q[3]
    small = sumsq < 1e-18
    sin_half = jnp.sqrt(jnp.where(small, 1.0, sumsq))
    angle = 2.0 * jnp.arctan2(sin_half, w)
    scale = jnp.where(small, 2.0 + sumsq / 3.0, angle / sin_half)
    return (q[1] * scale, q[2] * scale, q[3] * scale)


def _qconj(q):
    return (q[0], -q[1], -q[2], -q[3])


# --- topology extraction (host side, all python floats) ---------------------


class _Topo:
    """Static model description as python constants (folded into the trace)."""

    def __init__(self, model: Model):
        f = lambda a: np.asarray(a, dtype=np.float64)
        self.jnt_limited = [bool(b) for b in np.asarray(model.jnt_limited)]
        self.jnt_range = f(model.jnt_range)
        self.jnt_margin = f(model.jnt_margin)
        self.jnt_solimp = f(model.jnt_solimp)
        self.jnt_solref = f(model.jnt_solref)
        self.dof_invweight0 = f(model.dof_invweight0)
        self.nbody = model.nbody
        self.nv = model.nv
        self.nq = model.nq
        self.nu = model.nu
        self.parent = [int(p) for p in model.body_parent]
        self.body_pos = f(model.body_pos)
        self.body_quat = f(model.body_quat)
        self.body_ipos = f(model.body_ipos)
        self.body_iquat = f(model.body_iquat)
        self.body_mass = f(model.body_mass)
        self.body_inertia = f(model.body_inertia)
        self.jnt_type = [int(t) for t in np.asarray(model.jnt_type)]
        self.jnt_bodyid = [int(b) for b in np.asarray(model.jnt_bodyid)]
        self.jnt_qposadr = [int(a) for a in np.asarray(model.jnt_qposadr)]
        self.jnt_dofadr = [int(a) for a in np.asarray(model.jnt_dofadr)]
        self.jnt_pos = f(model.jnt_pos)
        self.jnt_axis = f(model.jnt_axis)
        self.jnt_stiffness = f(model.jnt_stiffness)
        self.qpos_spring = f(model.qpos_spring)
        self.qpos0 = f(model.qpos0)
        self.dof_damping = f(model.dof_damping)
        self.dof_armature = f(model.dof_armature)
        self.gravity = f(model.gravity)
        self.timestep = float(model.timestep)
        self.anc = np.asarray(model.ancestor_mask) > 0.5     # (nbody, nv)
        self.gear = f(model.actuator_gear)
        self.trnid = [int(t) for t in np.asarray(model.actuator_trnid)] \
            if model.nu else []
        self.ctrllimited = [bool(b) for b in np.asarray(
            model.actuator_ctrllimited)] if model.nu else []
        self.ctrlrange = f(model.actuator_ctrlrange) if model.nu else None
        # per-body joint list (in joint order)
        self.body_joints = [[] for _ in range(model.nbody)]
        for j, b in enumerate(self.jnt_bodyid):
            self.body_joints[b].append(j)
        # geoms / sites / contact pairs (for FK products + narrow phase)
        self.ngeom = model.ngeom
        self.nsite = model.nsite
        self.geom_bodyid = [int(b) for b in np.asarray(model.geom_bodyid)] \
            if model.ngeom else []
        self.geom_type = [int(t) for t in np.asarray(model.geom_type)] \
            if model.ngeom else []
        self.geom_pos = f(model.geom_pos) if model.ngeom else None
        self.geom_quat = f(model.geom_quat) if model.ngeom else None
        self.geom_size = f(model.geom_size) if model.ngeom else None
        self.geom_solref = f(model.geom_solref) if model.ngeom else None
        self.geom_solimp = f(model.geom_solimp) if model.ngeom else None
        self.geom_friction = f(model.geom_friction) if model.ngeom else None
        self.geom_margin = f(model.geom_margin) if model.ngeom else None
        self.site_bodyid = [int(b) for b in np.asarray(model.site_bodyid)] \
            if model.nsite else []
        self.site_pos = f(model.site_pos) if model.nsite else None
        self.site_quat = f(model.site_quat) if model.nsite else None
        self.contact_pairs = tuple(model.contact_pairs)
        self.body_invweight0 = f(model.body_invweight0)


def _fk_registers(T: _Topo, q):
    """FK over the unrolled body tree.

    q: list of nq registers.  Returns (xpos[b] 3-tuples, xquat[b] 4-tuples,
    cdof[i] 6-tuples [angular; linear-at-origin]) — exactly fk.py's
    convention (origin-centered spatial algebra)."""
    one = 1.0
    xpos = [(0.0, 0.0, 0.0)]
    xquat = [(one, 0.0, 0.0, 0.0)]
    cdof = [None] * T.nv
    for b in range(1, T.nbody):
        p = T.parent[b]
        bq = tuple(T.body_quat[b])
        bp = tuple(T.body_pos[b])
        xq = _qmul(xquat[p], bq)
        xp = _vadd(xpos[p], _qrot(xquat[p], bp))
        for j in T.body_joints[b]:
            qadr, dadr = T.jnt_qposadr[j], T.jnt_dofadr[j]
            jt = T.jnt_type[j]
            if jt == FREE:
                # global pose (fk.py FREE branch): world-aligned linear
                # dofs, child-frame rotational axes about the body origin
                xp = (q[qadr], q[qadr + 1], q[qadr + 2])
                xq = _qnorm(
                    (q[qadr + 3], q[qadr + 4], q[qadr + 5], q[qadr + 6])
                )
                for k in range(3):
                    e = tuple(1.0 if m == k else 0.0 for m in range(3))
                    cdof[dadr + k] = (0.0, 0.0, 0.0) + e
                R = _qmat(xq)
                for k in range(3):
                    a = (R[0][k], R[1][k], R[2][k])
                    cdof[dadr + 3 + k] = a + _vcross(xp, a)
                continue
            ja = tuple(T.jnt_axis[j])
            jp = tuple(T.jnt_pos[j])
            ang = q[qadr] - T.qpos0[qadr]
            if jt == HINGE:
                anchor = _vadd(_qrot(xq, jp), xp)
                half = 0.5 * ang
                qloc = (jnp.cos(half),) + _vscale(ja, jnp.sin(half))
                xq = _qmul(xq, qloc)
                xp = _vsub(anchor, _qrot(xq, jp))
                a_w = _qrot(xq, ja)
                cdof[dadr] = a_w + _vcross(anchor, a_w)
            else:  # SLIDE
                axis_w = _qrot(xq, ja)
                xp = _vadd(xp, _vscale(axis_w, ang))
                cdof[dadr] = (0.0, 0.0, 0.0) + axis_w
        xpos.append(xp)
        xquat.append(xq)
    return xpos, xquat, cdof


def _joint_dofs(T: _Topo, j):
    w = 6 if T.jnt_type[j] == FREE else 1
    return list(range(T.jnt_dofadr[j], T.jnt_dofadr[j] + w))


def _spatial_inertia(T: _Topo, b, xpos_b, xquat_b):
    """World-frame 6x6 spatial inertia of body b about the ORIGIN (register
    nested list), matching fk.py's cinert block structure."""
    xiq = _qmul(xquat_b, tuple(T.body_iquat[b]))
    R = _qmat(xiq)
    c = _vadd(xpos_b, _qrot(xquat_b, tuple(T.body_ipos[b])))
    m = float(T.body_mass[b])
    I3 = [float(x) for x in T.body_inertia[b]]
    # Ic = R diag(I3) R^T
    Ic = [[sum(R[i][k] * I3[k] * R[j][k] for k in range(3))
           for j in range(3)] for i in range(3)]
    cx, cy, cz = c
    # chat (skew of c) rows
    chat = ((0.0, -cz, cy), (cz, 0.0, -cx), (-cy, cx, 0.0))
    # upper-left: Ic + m * chat @ chat^T
    UL = [[Ic[i][j] + m * _vdot(chat[i], chat[j]) for j in range(3)]
          for i in range(3)]
    UR = [[m * chat[i][j] for j in range(3)] for i in range(3)]
    LL = [[-m * chat[i][j] for j in range(3)] for i in range(3)]  # m chat^T
    LR = [[m if i == j else 0.0 for j in range(3)] for i in range(3)]
    return [
        [
            (UL[i][j] if j < 3 else UR[i][j - 3])
            if i < 3
            else (LL[i - 3][j] if j < 3 else LR[i - 3][j - 3])
            for j in range(6)
        ]
        for i in range(6)
    ]


def _mat6_vec(I6, v):
    return tuple(sum(I6[i][j] * v[j] for j in range(6)) for i in range(6))


def _cross_motion(v, m):
    """Spatial motion cross v x m, [w; lin] blocks (utils.math.cross_motion)."""
    w, vl = v[:3], v[3:]
    mw, ml = m[:3], m[3:]
    return _vcross(w, mw) + _vadd(_vcross(w, ml), _vcross(vl, mw))


def _cross_force(v, f):
    """Spatial force cross v x* f (utils.math.cross_force)."""
    w, vl = v[:3], v[3:]
    fw, fl = f[:3], f[3:]
    return _vadd(_vcross(w, fw), _vcross(vl, fl)) + _vcross(w, fl)


def _stack_regs(entries, dtype=None):
    """Broadcast a flat list of registers / python scalars to a common lane
    shape and stack as (len, *lane_shape)."""
    arrs = [jnp.asarray(e, dtype) for e in entries]
    shape = jnp.broadcast_shapes(*[a.shape for a in arrs])
    return jnp.stack([jnp.broadcast_to(a, shape) for a in arrs])


def _bcast_lane(st, lane_shape):
    """Broadcast stacked (lead, *L1) to (lead, *lane_shape) with the lane
    dims right-aligned (numpy broadcasting semantics on the lane part)."""
    L1 = st.shape[1:]
    st = st.reshape(st.shape[:1] + (1,) * (len(lane_shape) - len(L1)) + L1)
    return jnp.broadcast_to(st, st.shape[:1] + lane_shape)


def _chol_solve_stacked(S, B):
    """Cholesky solve on STACKED lane-last operands:
    S (n, n, *L), B (n, *L) -> (n, *L).

    Unrolled register algorithm over the stacked rows: every op is
    elementwise over the lane axis, so XLA fuses the whole factorisation
    into a handful of VPU kernels with zero layout changes.  (XLA's batched
    `jnp.linalg.cholesky` + triangular_solve was tried here in round 5 and
    is ~10x SLOWER on many tiny lane-last matrices — it loops columns with
    dynamic-slice updates and forces (L, n, n) transposes; the unrolled
    form costs ~n^3/3 graph ops, which is acceptable now that the rest of
    the step is stacked.)"""
    n = S.shape[0]
    A = [[S[i, j] for j in range(n)] for i in range(n)]
    b = [B[i] for i in range(n)]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(s)
        inv = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = A[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def _cross_motion_s(v6, m6):
    """Stacked spatial motion cross v x m on (6, *L) tensors."""
    w, vl = v6[:3], v6[3:]
    mw, ml = m6[:3], m6[3:]
    return jnp.concatenate(
        [jnp.cross(w, mw, axis=0),
         jnp.cross(w, ml, axis=0) + jnp.cross(vl, mw, axis=0)], axis=0
    )


def _cross_force_s(v6, f6):
    """Stacked spatial force cross v x* f on (6, *L) tensors."""
    w, vl = v6[:3], v6[3:]
    fw, fl = f6[:3], f6[3:]
    return jnp.concatenate(
        [jnp.cross(w, fw, axis=0) + jnp.cross(vl, fl, axis=0),
         jnp.cross(w, fl, axis=0)], axis=0
    )


def _spatial_inertia_stacked(T: _Topo, b, xpos_b, xquat_b, lane_shape,
                             dtype):
    """World-frame 6x6 spatial inertia of body b about the ORIGIN as a
    stacked (6, 6, *L) tensor (einsum blocks instead of ~350 unrolled
    register ops per body; same formulas as fk.py's cinert structure)."""
    xiq = _qmul(xquat_b, tuple(T.body_iquat[b]))
    R = _qmat(xiq)
    c = _vadd(xpos_b, _qrot(xquat_b, tuple(T.body_ipos[b])))
    m = float(T.body_mass[b])
    I3 = jnp.asarray(T.body_inertia[b], dtype)
    Rs = _bcast_lane(
        _stack_regs([R[i][j] for i in range(3) for j in range(3)], dtype),
        lane_shape,
    ).reshape((3, 3) + lane_shape)
    cs = _bcast_lane(_stack_regs(list(c), dtype), lane_shape)
    Ic = jnp.einsum("ik...,k,jk...->ij...", Rs, I3, Rs)
    z = jnp.zeros(lane_shape, dtype)
    cx, cy, cz = cs[0], cs[1], cs[2]
    chat = jnp.stack([
        jnp.stack([z, -cz, cy]),
        jnp.stack([cz, z, -cx]),
        jnp.stack([-cy, cx, z]),
    ])                                                   # (3, 3, *L)
    UL = Ic + m * jnp.einsum("ik...,jk...->ij...", chat, chat)
    eye3 = jnp.eye(3, dtype=dtype).reshape(
        (3, 3) + (1,) * len(lane_shape)
    )
    LR = _bcast_lane(
        (m * eye3).reshape((9,) + (1,) * len(lane_shape)), lane_shape
    ).reshape((3, 3) + lane_shape)
    top = jnp.concatenate([UL, m * chat], axis=1)        # (3, 6, *L)
    bot = jnp.concatenate([-m * chat, LR], axis=1)
    return jnp.concatenate([top, bot], axis=0)           # (6, 6, *L)


def _smooth_force_and_M(T: _Topo, q, v, u):
    """STACKED qfrc_smooth (nv, *L) + mass matrix (nv, nv, *L) (CRBA + RNE,
    matching smooth.py's masked-einsum formulation exactly; the register
    form — ~7k unrolled HLOs at arm scale — is what stalled the TPU
    compiler and made B=1 MPC launch-latency-bound, round-5 probes)."""
    xpos, xquat, cdof = _fk_registers(T, q)
    nv = T.nv
    v_s = _stack_regs(v)
    dtype = v_s.dtype
    cdofs = _stack_regs(
        [c for i in range(nv) for c in cdof[i]], dtype
    )
    lane_shape = jnp.broadcast_shapes(cdofs.shape[1:], v_s.shape[1:])
    cdofs = _bcast_lane(cdofs, lane_shape).reshape((nv, 6) + lane_shape)
    v_s = _bcast_lane(v_s, lane_shape)
    ln = len(lane_shape)

    # world-frame spatial inertias (shared by CRBA composites and RNE)
    I_b = [None] * T.nbody
    for b in range(1, T.nbody):
        I_b[b] = _spatial_inertia_stacked(
            T, b, xpos[b], xquat[b], lane_shape, dtype
        )

    # composite rigid-body inertias: accumulate subtree sums up the tree
    crb = [None] + [I_b[b] for b in range(1, T.nbody)]
    for b in range(T.nbody - 1, 0, -1):
        p = T.parent[b]
        if p > 0:
            crb[p] = crb[p] + crb[b]

    # dof -> body (host constants)
    dof_body = [None] * nv
    for j in range(len(T.jnt_type)):
        for i in _joint_dofs(T, j):
            dof_body[i] = T.jnt_bodyid[j]

    # M = cdof_i . crb[body(j)] cdof_j on the ancestor mask
    crb_dof = jnp.stack([crb[dof_body[jd]] for jd in range(nv)])
    f = jnp.einsum("nij...,nj...->ni...", crb_dof, cdofs)   # (nv, 6, *L)
    raw = jnp.einsum("mi...,ni...->mn...", cdofs, f)        # (nv, nv, *L)
    W = np.zeros((nv, nv))
    for jd in range(nv):
        bj = dof_body[jd]
        for idx in range(nv):
            if T.anc[bj, idx] and idx <= jd:
                W[idx, jd] = 1.0
    Wl = jnp.asarray(W, dtype).reshape((nv, nv) + (1,) * ln)
    eye = jnp.eye(nv, dtype=dtype).reshape((nv, nv) + (1,) * ln)
    Mr = Wl * raw
    M = Mr + jnp.swapaxes(Mr, 0, 1) - eye * Mr
    M = M + eye * jnp.asarray(T.dof_armature, dtype).reshape(
        (nv, 1) + (1,) * ln
    )

    # bias (RNE over the origin-centered quantities; smooth.py formulas)
    cdof_v = cdofs * v_s[:, None]                           # (nv, 6, *L)
    zero6 = jnp.zeros((6,) + lane_shape, dtype)
    cvel = [zero6] * T.nbody
    for b in range(1, T.nbody):
        acc = cvel[T.parent[b]]
        for j in T.body_joints[b]:
            for i in _joint_dofs(T, j):
                acc = acc + cdof_v[i]
        cvel[b] = acc
    # cdofdot rules (model._path_dofs dotmask semantics):
    #   hinge/slide dof i: cross with everything STRICTLY before i;
    #   free translation dofs: world-fixed axes, derivative zero;
    #   free rotation dofs: body-fixed axes, cross with the FULL body twist.
    g = [float(x) for x in T.gravity]
    a0w = jnp.zeros((6,) + lane_shape, dtype).at[3].set(-g[0]) \
        .at[4].set(-g[1]).at[5].set(-g[2])
    cacc = [a0w] * T.nbody
    for b in range(1, T.nbody):
        pre = cvel[T.parent[b]]
        acc_b = cacc[T.parent[b]]
        for j in T.body_joints[b]:
            if T.jnt_type[j] == FREE:
                dofs = _joint_dofs(T, j)
                full = pre
                for i in dofs:
                    full = full + cdof_v[i]
                for i in dofs[3:]:
                    dd = _cross_motion_s(full, cdofs[i])
                    acc_b = acc_b + dd * v_s[i]
                pre = full
            else:
                i = T.jnt_dofadr[j]
                dd = _cross_motion_s(pre, cdofs[i])
                acc_b = acc_b + dd * v_s[i]
                pre = pre + cdof_v[i]
        cacc[b] = acc_b

    # per-body force, accumulated up the tree; bias_i = cdof_i . F_subtree
    cfrc = [zero6] * T.nbody
    for b in range(1, T.nbody):
        Iv = jnp.einsum("ij...,j...->i...", I_b[b], cvel[b])
        Ia = jnp.einsum("ij...,j...->i...", I_b[b], cacc[b])
        cfrc[b] = Ia + _cross_force_s(cvel[b], Iv)
    for b in range(T.nbody - 1, 0, -1):
        p = T.parent[b]
        if p > 0:
            cfrc[p] = cfrc[p] + cfrc[b]
    cfrc_dof = jnp.stack([cfrc[dof_body[i]] for i in range(nv)])
    bias = jnp.einsum("ni...,ni...->n...", cdofs, cfrc_dof)  # (nv, *L)

    # passive: damping + joint springs (smooth.py passive_force)
    passive = -jnp.asarray(T.dof_damping, dtype).reshape(
        (nv,) + (1,) * ln
    ) * v_s
    for j in range(len(T.jnt_type)):
        k = float(T.jnt_stiffness[j])
        if k != 0.0 and T.jnt_type[j] in (HINGE, SLIDE):
            qa, da = T.jnt_qposadr[j], T.jnt_dofadr[j]
            passive = passive.at[da].add(
                -k * (q[qa] - float(T.qpos_spring[qa]))
            )

    # actuators: direct-drive gear on the joint dof (smooth.py actuator_force)
    if T.nu:
        u_s = _bcast_lane(_stack_regs(u, dtype), lane_shape)
        lo = np.array([
            T.ctrlrange[a][0] if T.ctrllimited[a] else -np.inf
            for a in range(T.nu)
        ])
        hi = np.array([
            T.ctrlrange[a][1] if T.ctrllimited[a] else np.inf
            for a in range(T.nu)
        ])
        u_c = jnp.clip(
            u_s,
            jnp.asarray(lo, dtype).reshape((T.nu,) + (1,) * ln),
            jnp.asarray(hi, dtype).reshape((T.nu,) + (1,) * ln),
        )
        act = np.zeros((nv, T.nu))
        for a in range(T.nu):
            act[T.jnt_dofadr[T.trnid[a]], a] = float(T.gear[a][0])
        qfrc_act = jnp.einsum(
            "vu,u...->v...", jnp.asarray(act, dtype), u_c
        )
    else:
        qfrc_act = jnp.zeros((nv,) + lane_shape, dtype)

    qfrc_smooth = passive + qfrc_act - bias
    return qfrc_smooth, M, {"xpos": xpos, "xquat": xquat, "cdof": cdof}


def _impedance_reg(solimp, pos):
    """contact._impedance on a register `pos` (solimp python constants)."""
    d0, dwidth, width, mid, power = [float(x) for x in solimp]
    x = jnp.clip(jnp.abs(pos) / max(width, 1e-12), 0.0, 1.0)
    mp = min(max(mid, 1e-6), 1.0 - 1e-6)
    pw = max(power, 1.0)
    y_lo = (x**pw) / (mp ** (pw - 1.0))
    y_hi = 1.0 - ((1.0 - x) ** pw) / ((1.0 - mp) ** (pw - 1.0))
    y = jnp.where(x <= mp, y_lo, y_hi)
    return d0 + y * (dwidth - d0)


_LIMIT_NEWTON_ITERS = 8  # contact._NEWTON_ITERS (cold start)
_ALPHA_LADDER = (1.0, 0.5, 0.25, 0.1, 0.04, 0.01)


def _limit_rows_regs(T: _Topo, q, v):
    """Joint-limit constraint rows (contact._limit_rows semantics).

    Row format (shared with contact rows): (dofs, coeffs, aref, invR) where
    `dofs` is a static tuple of supported dof indices and `coeffs` the
    matching J-entries (registers or python floats)."""
    rows = []
    for j in range(len(T.jnt_type)):
        if not T.jnt_limited[j] or T.jnt_type[j] not in (HINGE, SLIDE):
            continue
        qa, da = T.jnt_qposadr[j], T.jnt_dofadr[j]
        lo, hi = float(T.jnt_range[j][0]), float(T.jnt_range[j][1])
        margin = float(T.jnt_margin[j])
        inv_w = max(float(T.dof_invweight0[da]), 1e-9)
        for sign, dist in ((1.0, q[qa] - lo), (-1.0, hi - q[qa])):
            include = (dist < margin).astype(q[qa].dtype)
            imp_pos = dist - margin
            d = _impedance_reg(T.jnt_solimp[j], imp_pos)
            dmax = float(T.jnt_solimp[j][1])
            tc = max(float(T.jnt_solref[j][0]), 1e-8)
            dr = max(float(T.jnt_solref[j][1]), 1e-8)
            b = 2.0 / (dmax * tc)
            k = d / (dmax * dmax * tc * tc * dr * dr)
            aref = -b * (sign * v[da]) - k * imp_pos
            R = jnp.maximum(
                (1.0 - d) / jnp.maximum(d, 1e-6), 1e-9
            ) * inv_w
            rows.append(((da,), (sign,), aref, include / R))
    return rows


# --- narrow phase on registers (collision.py formulas, lane-last) -----------


def _frame_from_normal_reg(n):
    """(normal, t1, t2) rows from a register unit normal
    (collision._frame_from_normal)."""
    cond = jnp.abs(n[0]) < 0.5
    one = jnp.where(cond, 1.0, 0.0)
    ref = (one, 1.0 - one, jnp.zeros_like(n[0]))
    t1 = _vcross(n, ref)
    t1n = jnp.maximum(
        jnp.sqrt(t1[0] * t1[0] + t1[1] * t1[1] + t1[2] * t1[2]), 1e-12
    )
    t1 = tuple(x / t1n for x in t1)
    t2 = _vcross(n, t1)
    return (n, t1, t2)


def _sphere_sphere_core_reg(p1, r1, p2, r2):
    d = _vsub(p2, p1)
    L = jnp.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2])
    safeL = jnp.maximum(L, 1e-9)
    deg = L < 1e-9
    n = (
        jnp.where(deg, 0.0, d[0] / safeL),
        jnp.where(deg, 0.0, d[1] / safeL),
        jnp.where(deg, 1.0, d[2] / safeL),
    )
    dist = L - r1 - r2
    pos = _vadd(p1, _vscale(n, r1 + 0.5 * dist))
    return dist, pos, n


def _closest_seg_point_reg(a0, a1, p):
    d = _vsub(a1, a0)
    t = _vdot(_vsub(p, a0), d) / jnp.maximum(_vdot(d, d), 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    return _vadd(a0, _vscale(d, t))


def _closest_seg_seg_reg(p0, p1, q0, q1):
    d1 = _vsub(p1, p0)
    d2 = _vsub(q1, q0)
    r = _vsub(p0, q0)
    a = _vdot(d1, d1)
    e = _vdot(d2, d2)
    f = _vdot(d2, r)
    c = _vdot(d1, r)
    b = _vdot(d1, d2)
    denom = a * e - b * b
    s = jnp.where(
        denom > 1e-12,
        jnp.clip((b * f - c * e) / jnp.maximum(denom, 1e-12), 0.0, 1.0),
        0.0,
    )
    t = (b * s + f) / jnp.maximum(e, 1e-12)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.clip((b * t_cl - c) / jnp.maximum(a, 1e-12), 0.0, 1.0)
    return _vadd(p0, _vscale(d1, s)), _vadd(q0, _vscale(d2, t_cl))


def _sphere_box_core_reg(p, r, xp2, xm2, s2):
    """Sphere (center register p, python-float radius r) vs box (center xp2,
    rotation xm2, half-sizes s2): (dist, pos, n) with n from the sphere INTO
    the box — collision.sphere_box semantics including the
    center-inside-box least-margin-face case."""
    def bcol(k):
        return (xm2[0][k], xm2[1][k], xm2[2][k])

    d = _vsub(p, xp2)
    p_local = tuple(_vdot(bcol(k), d) for k in range(3))
    sz = [float(s2[k]) for k in range(3)]
    clamped = tuple(jnp.clip(p_local[k], -sz[k], sz[k]) for k in range(3))
    delta = _vsub(p_local, clamped)
    L = jnp.sqrt(jnp.maximum(_vdot(delta, delta), 0.0))
    outside = L > 1e-9
    safeL = jnp.maximum(L, 1e-9)
    n_out = _vscale(delta, 1.0 / safeL)
    dist_out = L - r

    # center inside the box: push out along the least-penetration face
    margins = tuple(sz[k] - jnp.abs(p_local[k]) for k in range(3))
    is0 = (margins[0] <= margins[1]) & (margins[0] <= margins[2])
    is1 = jnp.logical_and(~is0, margins[1] <= margins[2])
    is2 = ~(is0 | is1)
    m_min = jnp.where(is0, margins[0],
                      jnp.where(is1, margins[1], margins[2]))
    sgn = tuple(jnp.where(p_local[k] < 0, -1.0, 1.0) for k in range(3))
    masks = (is0, is1, is2)
    n_in = tuple(jnp.where(masks[k], sgn[k], 0.0) for k in range(3))
    dist_in = -(m_min + r)
    pos_in = tuple(
        p_local[k] - n_in[k] * (dist_in * 0.5 + r) for k in range(3)
    )

    n_local = tuple(jnp.where(outside, n_out[k], n_in[k]) for k in range(3))
    dist = jnp.where(outside, dist_out, dist_in)
    pos_local = tuple(
        jnp.where(outside, clamped[k], pos_in[k]) for k in range(3)
    )
    # back to world: v_world = sum_k col(k) * v_local[k]
    n_world = _vadd(_vadd(_vscale(bcol(0), n_local[0]),
                          _vscale(bcol(1), n_local[1])),
                    _vscale(bcol(2), n_local[2]))
    pos_world = _vadd(xp2, _vadd(_vadd(_vscale(bcol(0), pos_local[0]),
                                       _vscale(bcol(1), pos_local[1])),
                                 _vscale(bcol(2), pos_local[2])))
    # normal from sphere into box (n_world points box-surface -> sphere)
    return dist, pos_world, tuple(-x for x in n_world)


# Knuth's optimal 19-comparator sorting network for 8 inputs — used to pick
# the 4 deepest plane-box corners (collision.plane_box argsort[:4]) with
# elementwise register compare-exchanges instead of a lane argsort.
_SORT8_NET = (
    (0, 1), (2, 3), (4, 5), (6, 7),
    (0, 2), (1, 3), (4, 6), (5, 7),
    (1, 2), (5, 6), (0, 4), (3, 7),
    (1, 5), (2, 6), (1, 4), (3, 6),
    (2, 4), (3, 5), (3, 4),
)


def _collide_regs(t1, t2, xp1, xm1, s1, xp2, xm2, s2):
    """Slots (dist, pos, frame) for one geom pair; normals geom1 -> geom2.

    xm* are 3x3 register rotation matrices (columns = frame axes); s* python
    float size rows.  Mirrors collision.py's fixed slot counts."""
    def col(M, k):
        return (M[0][k], M[1][k], M[2][k])

    if (t1, t2) == (GEOM_PLANE, GEOM_SPHERE):
        n = col(xm1, 2)
        r = s1_r = float(s2[0])
        cdist = _vdot(n, _vsub(xp2, xp1))
        dist = cdist - r
        pos = _vsub(xp2, _vscale(n, r + 0.5 * dist))
        return [(dist, pos, _frame_from_normal_reg(n))]
    if (t1, t2) == (GEOM_PLANE, GEOM_CAPSULE):
        n = col(xm1, 2)
        r, hl = float(s2[0]), float(s2[1])
        axis = col(xm2, 2)
        out = []
        for sgn in (1.0, -1.0):
            e = _vadd(xp2, _vscale(axis, hl * sgn))
            cdist = _vdot(n, _vsub(e, xp1))
            dist = cdist - r
            pos = _vsub(e, _vscale(n, r + 0.5 * dist))
            out.append((dist, pos, _frame_from_normal_reg(n)))
        return out
    if (t1, t2) == (GEOM_PLANE, GEOM_CYLINDER):
        # 3 rim points of the closer cap (collision.plane_cylinder)
        n = col(xm1, 2)
        r, hl = float(s2[0]), float(s2[1])
        axis = col(xm2, 2)
        sign = -jnp.sign(_vdot(axis, n))
        sign = jnp.where(sign == 0, 1.0, sign)
        cap = _vadd(xp2, _vscale(axis, hl * sign))
        rad = _vsub(n, _vscale(axis, _vdot(axis, n)))
        rad_norm = jnp.sqrt(jnp.maximum(_vdot(rad, rad), 1e-24))
        aligned = rad_norm < 1e-9
        x0 = col(xm2, 0)
        rad = tuple(
            jnp.where(aligned, x0[k], -rad[k] / jnp.maximum(rad_norm, 1e-9))
            for k in range(3)
        )
        t = _vcross(axis, rad)
        pts = [
            _vadd(cap, _vscale(rad, r)),
            _vadd(_vadd(cap, _vscale(rad, -0.5 * r)), _vscale(t, 0.866 * r)),
            _vadd(_vadd(cap, _vscale(rad, -0.5 * r)), _vscale(t, -0.866 * r)),
        ]
        out = []
        for p in pts:
            d = _vdot(n, _vsub(p, xp1))
            out.append(
                (d, _vsub(p, _vscale(n, 0.5 * d)), _frame_from_normal_reg(n))
            )
        return out
    if (t1, t2) == (GEOM_SPHERE, GEOM_SPHERE):
        dist, pos, n = _sphere_sphere_core_reg(
            xp1, float(s1[0]), xp2, float(s2[0])
        )
        return [(dist, pos, _frame_from_normal_reg(n))]
    if (t1, t2) in ((GEOM_SPHERE, GEOM_CAPSULE), (GEOM_SPHERE, GEOM_CYLINDER)):
        axis = col(xm2, 2)
        hl = float(s2[1])
        c = _closest_seg_point_reg(
            _vsub(xp2, _vscale(axis, hl)), _vadd(xp2, _vscale(axis, hl)), xp1
        )
        dist, pos, n = _sphere_sphere_core_reg(
            xp1, float(s1[0]), c, float(s2[0])
        )
        return [(dist, pos, _frame_from_normal_reg(n))]
    if (t1, t2) in (
        (GEOM_CAPSULE, GEOM_CAPSULE),
        (GEOM_CAPSULE, GEOM_CYLINDER),
        (GEOM_CYLINDER, GEOM_CYLINDER),
    ):
        # cylinders as equal-radius capsules for lateral contact
        # (collision.py dispatch note)
        a_axis = _vscale(col(xm1, 2), float(s1[1]))
        b_axis = _vscale(col(xm2, 2), float(s2[1]))
        pa, pb = _closest_seg_seg_reg(
            _vsub(xp1, a_axis), _vadd(xp1, a_axis),
            _vsub(xp2, b_axis), _vadd(xp2, b_axis),
        )
        dist, pos, n = _sphere_sphere_core_reg(
            pa, float(s1[0]), pb, float(s2[0])
        )
        return [(dist, pos, _frame_from_normal_reg(n))]
    if (t1, t2) == (GEOM_PLANE, GEOM_BOX):
        # 4 deepest of the 8 box corners (collision.plane_box)
        n = col(xm1, 2)
        sz = [float(s2[k]) for k in range(3)]
        bx, by, bz = col(xm2, 0), col(xm2, 1), col(xm2, 2)
        cand = []
        for sx in (-1.0, 1.0):
            for sy in (-1.0, 1.0):
                for sz_ in (-1.0, 1.0):
                    c = _vadd(xp2, _vadd(
                        _vscale(bx, sx * sz[0]),
                        _vadd(_vscale(by, sy * sz[1]),
                              _vscale(bz, sz_ * sz[2]))))
                    cand.append((_vdot(n, _vsub(c, xp1)), c))
        for (i, j) in _SORT8_NET:
            di, ci = cand[i]
            dj, cj = cand[j]
            keep = di <= dj
            cand[i] = (jnp.where(keep, di, dj),
                       tuple(jnp.where(keep, a, b)
                             for a, b in zip(ci, cj)))
            cand[j] = (jnp.where(keep, dj, di),
                       tuple(jnp.where(keep, b, a)
                             for a, b in zip(ci, cj)))
        out = []
        for k in range(4):
            dk, ck = cand[k]
            out.append((dk, _vsub(ck, _vscale(n, 0.5 * dk)),
                        _frame_from_normal_reg(n)))
        return out
    if (t1, t2) == (GEOM_SPHERE, GEOM_BOX):
        dist, pos, n = _sphere_box_core_reg(
            xp1, float(s1[0]), xp2, xm2, s2
        )
        return [(dist, pos, _frame_from_normal_reg(n))]
    if (t1, t2) in ((GEOM_CAPSULE, GEOM_BOX), (GEOM_CYLINDER, GEOM_BOX)):
        # two sphere-box probes at the capsule/cylinder endpoints
        # (collision.capsule_box; cylinders dispatch there too)
        axis = col(xm1, 2)
        r, hl = float(s1[0]), float(s1[1])
        out = []
        for sgn_e in (1.0, -1.0):
            e = _vadd(xp1, _vscale(axis, hl * sgn_e))
            dist, pos, n = _sphere_box_core_reg(e, r, xp2, xm2, s2)
            out.append((dist, pos, _frame_from_normal_reg(n)))
        return out
    raise NotImplementedError(f"lane collider for geom types ({t1}, {t2})")


def _pair_slots_regs(T: _Topo, g1, g2, xpos, xquat):
    """World-frame slots for a contact pair, normals g1 -> g2."""
    def geom_pose(g):
        b = T.geom_bodyid[g]
        gq = _qmul(xquat[b], tuple(T.geom_quat[g]))
        gp = _vadd(xpos[b], _qrot(xquat[b], tuple(T.geom_pos[g])))
        return gp, _qmat(gq)

    t1, t2 = T.geom_type[g1], T.geom_type[g2]
    p1, m1 = geom_pose(g1)
    p2, m2 = geom_pose(g2)
    try:
        return _collide_regs(
            t1, t2, p1, m1, T.geom_size[g1], p2, m2, T.geom_size[g2]
        )
    except NotImplementedError:
        slots = _collide_regs(
            t2, t1, p2, m2, T.geom_size[g2], p1, m1, T.geom_size[g1]
        )
        # flip normals to keep geom1 -> geom2 orientation
        return [
            (d, p, (tuple(-x for x in fr[0]), fr[1], fr[2]))
            for (d, p, fr) in slots
        ]


def _contact_rows_regs(T: _Topo, q, v, xpos, xquat, cdof):
    """Pyramidal contact rows for every candidate slot
    (contact._contact_rows semantics: MuJoCo default parameter mixing,
    R = (1-d)/d (invw1+invw2) 2 mu^2 (1+mu^2), rows Jn +- mu Jt)."""
    rows = []
    for (g1, g2) in T.contact_pairs:
        b1, b2 = T.geom_bodyid[g1], T.geom_bodyid[g2]
        solref = 0.5 * (T.geom_solref[g1] + T.geom_solref[g2])
        solimp = 0.5 * (T.geom_solimp[g1] + T.geom_solimp[g2])
        friction = np.maximum(T.geom_friction[g1], T.geom_friction[g2])
        margin = float(max(T.geom_margin[g1], T.geom_margin[g2]))
        mu0 = float(friction[0])
        inv_mass = float(T.body_invweight0[b1][0] + T.body_invweight0[b2][0])
        dmax = float(solimp[1])
        tc = max(float(solref[0]), 1e-8)
        dr = max(float(solref[1]), 1e-8)
        b_const = 2.0 / (dmax * tc)
        # support dofs: on exactly one of the two bodies' root paths
        support = [
            i for i in range(T.nv)
            if bool(T.anc[b2, i]) != bool(T.anc[b1, i])
        ]
        mrel = {
            i: (1.0 if T.anc[b2, i] else 0.0) - (1.0 if T.anc[b1, i] else 0.0)
            for i in support
        }
        for (dist, pos, frame) in _pair_slots_regs(T, g1, g2, xpos, xquat):
            include = (dist < margin).astype(dist.dtype)
            imp_pos = dist - margin
            d_imp = _impedance_reg(solimp, imp_pos)
            k = d_imp / (dmax * dmax * tc * tc * dr * dr)
            Jn, Jt1, Jt2 = [], [], []
            for i in support:
                w = cdof[i][:3]
                vl = cdof[i][3:]
                jac = _vscale(_vadd(vl, _vcross(w, pos)), mrel[i])
                Jn.append(_vdot(frame[0], jac))
                Jt1.append(_vdot(frame[1], jac))
                Jt2.append(_vdot(frame[2], jac))
            R_slot = (
                jnp.maximum((1.0 - d_imp) / jnp.maximum(d_imp, 1e-6), 1e-9)
                * max(inv_mass, 1e-9)
                * 2.0 * mu0 * mu0 * (1.0 + mu0 * mu0)
            )
            invR = include / R_slot
            for Jt in (Jt1, Jt2):
                for sgn in (1.0, -1.0):
                    coeffs = tuple(
                        Jn[m] + sgn * mu0 * Jt[m] for m in range(len(support))
                    )
                    vel = sum(
                        c * v[i] for c, i in zip(coeffs, support)
                    )
                    aref = -b_const * vel - k * imp_pos
                    rows.append((tuple(support), coeffs, aref, invR))
    return rows


from functools import partial


def _chol_solve_reglist(A, b):
    """Cholesky solve on an n x n nested-list register matrix (unrolled)."""
    n = len(b)
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(s)
        inv = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = A[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x




def _smooth_force_and_M_regs(T: _Topo, q, v, u):
    """qfrc_smooth registers + mass-matrix register rows (CRBA + RNE,
    matching smooth.py's masked-einsum formulation exactly; register form — best THROUGHPUT at large lane counts, where XLA fuses the scalar chains into few kernels)."""
    xpos, xquat, cdof = _fk_registers(T, q)

    # world-frame spatial inertias (shared by CRBA composites and RNE)
    I_b = [None] * T.nbody
    for b in range(1, T.nbody):
        I_b[b] = _spatial_inertia(T, b, xpos[b], xquat[b])

    # composite rigid-body inertias: accumulate subtree sums up the tree
    crb = [None] + [[row[:] for row in I_b[b]] for b in range(1, T.nbody)]
    for b in range(T.nbody - 1, 0, -1):
        p = T.parent[b]
        if p > 0:
            crb[p] = [
                [crb[p][i][j] + crb[b][i][j] for j in range(6)]
                for i in range(6)
            ]

    # dof -> body, dof ancestors (host constants)
    dof_body = [None] * T.nv
    for j in range(len(T.jnt_type)):
        for i in _joint_dofs(T, j):
            dof_body[i] = T.jnt_bodyid[j]

    # M[i][j] = cdof_i . crb[body(j)] cdof_j for i ancestor-dof of body(j)
    M = [[0.0] * T.nv for _ in range(T.nv)]
    for jd in range(T.nv):
        bj = dof_body[jd]
        f_j = _mat6_vec(crb[bj], cdof[jd])
        for idx in range(T.nv):
            if T.anc[bj, idx] and idx <= jd:
                mij = _vdot(cdof[idx][:3], f_j[:3]) + _vdot(
                    cdof[idx][3:], f_j[3:]
                )
                M[idx][jd] = mij
                M[jd][idx] = mij
        M[jd][jd] = M[jd][jd] + float(T.dof_armature[jd])

    # bias (RNE over the origin-centered quantities; smooth.py formulas)
    cdof_v = [_vscale(cdof[i][:3], v[i]) + _vscale(cdof[i][3:], v[i])
              for i in range(T.nv)]
    # per-body velocity = sum of ancestor-dof twists
    zero6 = (0.0,) * 6
    cvel = [zero6] * T.nbody
    for b in range(1, T.nbody):
        acc = cvel[T.parent[b]]
        for j in T.body_joints[b]:
            for i in _joint_dofs(T, j):
                acc = tuple(a + d for a, d in zip(acc, cdof_v[i]))
        cvel[b] = acc
    # cdofdot rules (model._path_dofs dotmask semantics):
    #   hinge/slide dof i: cross with everything STRICTLY before i;
    #   free translation dofs: world-fixed axes, derivative zero;
    #   free rotation dofs: body-fixed axes, cross with the FULL body twist.
    g = [float(x) for x in T.gravity]
    a0 = (0.0, 0.0, 0.0, -g[0], -g[1], -g[2])
    cacc = [a0] * T.nbody
    cdofdot = [None] * T.nv
    for b in range(1, T.nbody):
        pre = cvel[T.parent[b]]
        acc_b = cacc[T.parent[b]]
        for j in T.body_joints[b]:
            if T.jnt_type[j] == FREE:
                dofs = _joint_dofs(T, j)
                full = pre
                for i in dofs:
                    full = tuple(p + d for p, d in zip(full, cdof_v[i]))
                for i in dofs[:3]:
                    cdofdot[i] = zero6
                for i in dofs[3:]:
                    cdofdot[i] = _cross_motion(full, cdof[i])
                    acc_b = tuple(
                        a + d * v[i] for a, d in zip(acc_b, cdofdot[i])
                    )
                pre = full
            else:
                i = T.jnt_dofadr[j]
                cdofdot[i] = _cross_motion(pre, cdof[i])
                acc_b = tuple(
                    a + d * v[i] for a, d in zip(acc_b, cdofdot[i])
                )
                pre = tuple(p + d for p, d in zip(pre, cdof_v[i]))
        cacc[b] = acc_b

    # per-body force, accumulated up the tree; bias_i = cdof_i . F_subtree
    cfrc = [zero6] * T.nbody
    for b in range(1, T.nbody):
        Iv = _mat6_vec(I_b[b], cvel[b])
        Ia = _mat6_vec(I_b[b], cacc[b])
        cfrc[b] = tuple(
            x + y for x, y in zip(Ia, _cross_force(cvel[b], Iv))
        )
    for b in range(T.nbody - 1, 0, -1):
        p = T.parent[b]
        if p > 0:
            cfrc[p] = tuple(x + y for x, y in zip(cfrc[p], cfrc[b]))
    bias = [
        _vdot(cdof[i][:3], cfrc[dof_body[i]][:3])
        + _vdot(cdof[i][3:], cfrc[dof_body[i]][3:])
        for i in range(T.nv)
    ]

    # passive: damping + joint springs (smooth.py passive_force)
    passive = [-float(T.dof_damping[i]) * v[i] for i in range(T.nv)]
    for j in range(len(T.jnt_type)):
        k = float(T.jnt_stiffness[j])
        if k != 0.0 and T.jnt_type[j] in (HINGE, SLIDE):
            qa, da = T.jnt_qposadr[j], T.jnt_dofadr[j]
            passive[da] = passive[da] - k * (
                q[qa] - float(T.qpos_spring[qa])
            )

    # actuators: direct-drive gear on the joint dof (smooth.py actuator_force)
    qfrc_act = [0.0] * T.nv
    for a in range(T.nu):
        ua = u[a]
        if T.ctrllimited[a]:
            lo, hi = float(T.ctrlrange[a][0]), float(T.ctrlrange[a][1])
            ua = jnp.clip(ua, lo, hi)
        j = T.trnid[a]
        da = T.jnt_dofadr[j]
        qfrc_act[da] = qfrc_act[da] + ua * float(T.gear[a][0])

    qfrc_smooth = [
        passive[i] + qfrc_act[i] - bias[i] for i in range(T.nv)
    ]
    return qfrc_smooth, M, {"xpos": xpos, "xquat": xquat, "cdof": cdof}




@partial(jax.custom_jvp, nondiff_argnums=(0, 1, 2))
def _solve_rows_x_regs(dofs_static, n_iters, unroll, M, a0, dyn):
    """Primal projected-Newton solve on generic constraint rows, returning
    the stacked solution x (nv, ...L).  Differentiated IMPLICITLY (defjvp
    below) — the lane twin of contact._newton_solver's implicit-function
    rule: forward-mode AD through the truncated Newton scan is n_iters x
    more expensive per tangent, bloats the traced graph ~4x (the round-5
    root cause of the 41-minute TPU compile of the arm-scale lane jacobian
    phase), and differentiates the APPROXIMATE solve instead of the
    converged solution.  All tangents share one primal Hessian
    factorisation, hoisted out of jacfwd's tangent vmap.

    dofs_static: tuple of per-row dof-index tuples (static);
    dyn: tuple of per-row (coeffs tuple, aref, invR) register pytrees.

    The iteration loop is a lax.scan (body traced ONCE): the unrolled body
    is ~10-20k elementwise ops for an arm-scale model, and unrolling 8x
    produces MLIR large enough to stall/kill the TPU compiler."""
    nv = len(a0)
    rows = [
        (dofs, coeffs, aref, invR)
        for dofs, (coeffs, aref, invR) in zip(dofs_static, dyn)
    ]

    def newton_iter(x_stack, _):
        x = [x_stack[i] for i in range(nv)]
        ys = [
            sum(c * x[d] for d, c in zip(dofs, coeffs)) - aref
            for (dofs, coeffs, aref, _) in rows
        ]
        gates = [
            (y < 0).astype(y.dtype) * invR
            for y, (_, _, _, invR) in zip(ys, rows)
        ]
        e = [x[i] - a0[i] for i in range(nv)]
        Me = [sum(M[i][j] * e[j] for j in range(nv)) for i in range(nv)]
        grad = list(Me)
        for (dofs, coeffs, _, _), y, g in zip(rows, ys, gates):
            gy = g * y
            for d, c in zip(dofs, coeffs):
                grad[d] = grad[d] + c * gy
        H = [list(row) for row in M]
        for (dofs, coeffs, _, _), g in zip(rows, gates):
            for m1 in range(len(dofs)):
                gc = g * coeffs[m1]
                for m2 in range(m1, len(dofs)):
                    d1, d2 = dofs[m1], dofs[m2]
                    val = gc * coeffs[m2]
                    H[d1][d2] = H[d1][d2] + val
                    if d1 != d2:
                        H[d2][d1] = H[d2][d1] + val
        for i in range(nv):
            H[i][i] = H[i][i] + 1e-10  # contact._newton_iterations jitter
        dx = [-z for z in _chol_solve_reglist(H, grad)]
        # shared-expansion line search on the merit (contact.py ladder)
        Jdx = [
            sum(c * dx[d] for d, c in zip(dofs, coeffs))
            for (dofs, coeffs, _, _) in rows
        ]
        Mdx = [sum(M[i][j] * dx[j] for j in range(nv)) for i in range(nv)]
        eMe = sum(e[i] * Me[i] for i in range(nv))
        eMdx = sum(e[i] * Mdx[i] for i in range(nv))
        dMd = sum(dx[i] * Mdx[i] for i in range(nv))

        def cost_alpha(alpha):
            pen = 0.0
            for y, jdx, (_, _, _, invR) in zip(ys, Jdx, rows):
                ya = y + alpha * jdx
                p = jnp.where(ya < 0, ya, 0.0)
                pen = pen + invR * p * p
            return (
                0.5 * (eMe + 2 * alpha * eMdx + alpha * alpha * dMd)
                + 0.5 * pen
            )

        costs = [cost_alpha(a) for a in _ALPHA_LADDER]
        c0 = cost_alpha(0.0)
        best_c = costs[0]
        best_a = jnp.full_like(c0, _ALPHA_LADDER[0])
        for a, c in zip(_ALPHA_LADDER[1:], costs[1:]):
            take = c < best_c
            best_c = jnp.where(take, c, best_c)
            best_a = jnp.where(take, a, best_a)
        alpha = jnp.where(best_c < c0, best_a, 0.0)
        return jnp.stack([x[i] + alpha * dx[i] for i in range(nv)]), None

    x_stack, _ = jax.lax.scan(
        newton_iter, jnp.stack(a0), None, length=n_iters,
        unroll=min(unroll, n_iters),
    )
    return x_stack


@_solve_rows_x_regs.defjvp
def _solve_rows_x_regs_jvp(dofs_static, n_iters, unroll, primals, tangents):
    """Implicit-function tangent at the converged point
    (contact._newton_solver semantics, register layout): with optimality
    residual R(x; th) = M (x - a0) + sum_r J_r^T invR_r min(y_r, 0) = 0,
    dx = -H^{-1} (dR/dth . dth) where H = M + sum_r gate_r J_r J_r^T invR_r
    is the (primal-only) Newton Hessian on the locally-constant active
    set."""
    M, a0, dyn = primals
    dM, da0, ddyn = tangents
    nv = len(a0)
    x_stack = _solve_rows_x_regs(dofs_static, n_iters, unroll, M, a0, dyn)
    x = [x_stack[i] for i in range(nv)]

    def R(M_, a0_, dyn_):
        out = [
            sum(M_[i][j] * (x[j] - a0_[j]) for j in range(nv))
            for i in range(nv)
        ]
        for dofs, (coeffs, aref, invR) in zip(dofs_static, dyn_):
            y = sum(c * x[d] for d, c in zip(dofs, coeffs)) - aref
            f = jnp.where(y < 0, y, 0.0) * invR
            for d, c in zip(dofs, coeffs):
                out[d] = out[d] + c * f
        return tuple(out)

    _, g_dot = jax.jvp(R, (M, a0, dyn), (dM, da0, ddyn))

    # Newton Hessian at x* from the PRIMAL values only
    H = [[M[i][j] for j in range(nv)] for i in range(nv)]
    for dofs, (coeffs, aref, invR) in zip(dofs_static, dyn):
        y = sum(c * x[d] for d, c in zip(dofs, coeffs)) - aref
        g = (y < 0).astype(x_stack.dtype) * invR
        for m1 in range(len(dofs)):
            gc = g * coeffs[m1]
            for m2 in range(m1, len(dofs)):
                d1, d2 = dofs[m1], dofs[m2]
                val = gc * coeffs[m2]
                H[d1][d2] = H[d1][d2] + val
                if d1 != d2:
                    H[d2][d1] = H[d2][d1] + val
    for i in range(nv):
        H[i][i] = H[i][i] + 1e-10
    dx = [-z for z in _chol_solve_reglist(H, list(g_dot))]
    return x_stack, jnp.stack(dx)


def _solve_rows_regs(M, a0, rows, n_iters, unroll=1):
    """Projected-Newton solve of the soft-constraint problem on generic
    rows (contact.solve_constraints semantics: cold start, fixed iteration
    count, shared-expansion merit line search over the alpha ladder).

    Returns (x regs, qfrc_constraint regs).  The solution is differentiated
    implicitly (_solve_rows_x_regs custom_jvp above); the constraint force is
    recomputed from x outside the custom rule, so its active-set gating
    differentiates consistently."""
    nv = len(a0)
    if not rows:
        return list(a0), [jnp.zeros_like(a0[0])] * nv
    dofs_static = tuple(tuple(r[0]) for r in rows)
    dyn = tuple((tuple(r[1]), r[2], r[3]) for r in rows)
    Mt = tuple(tuple(row) for row in M)
    x_stack = _solve_rows_x_regs(dofs_static, n_iters, unroll, Mt,
                            tuple(a0), dyn)
    x = [x_stack[i] for i in range(nv)]
    ys = [
        sum(c * x[d] for d, c in zip(dofs, coeffs)) - aref
        for (dofs, coeffs, aref, _) in rows
    ]
    qfrc = [jnp.zeros_like(x[0])] * nv
    for (dofs, coeffs, _, invR), y in zip(rows, ys):
        f = -jnp.where(y < 0, y, 0.0) * invR
        for d, c in zip(dofs, coeffs):
            qfrc[d] = qfrc[d] + c * f
    return x, qfrc




def _stack_solver_operands(dofs_static, Ms, a0s, dyn):
    """Broadcast stacked solver operands Ms (nv, nv, *L) / a0s (nv, *L)
    against the constraint-row registers and build the dense lane-last
    tensors: J (R, nv, *L) (zeros off the support), arefs (R, *L),
    invRs (R, *L).  The dense form turns the per-row register loops of the
    Newton body into ~20 einsum/elementwise HLOs — the register form was
    ~1.5k ops per iteration, which made the arm-scale step graph stall the
    TPU compiler and left B=1 MPC replans launch-latency-bound."""
    nv = a0s.shape[0]
    entries = []
    for dofs, (coeffs, aref, invR) in zip(dofs_static, dyn):
        entries += list(coeffs) + [aref, invR]
    st = _stack_regs(entries, Ms.dtype)
    lane_shape = jnp.broadcast_shapes(
        st.shape[1:], Ms.shape[2:], a0s.shape[1:]
    )
    st = _bcast_lane(st, lane_shape)
    Ms = _bcast_lane(Ms.reshape((nv * nv,) + Ms.shape[2:]),
                     lane_shape).reshape((nv, nv) + lane_shape)
    a0s = _bcast_lane(a0s, lane_shape)
    zero = jnp.zeros(lane_shape, st.dtype)
    Jrows, arefs, invRs = [], [], []
    pos = 0
    for dofs, (coeffs, aref, invR) in zip(dofs_static, dyn):
        crow = [zero] * nv
        for idx, d in enumerate(dofs):
            crow[d] = st[pos + idx]
        pos += len(coeffs)
        Jrows.append(jnp.stack(crow))
        arefs.append(st[pos])
        invRs.append(st[pos + 1])
        pos += 2
    return Ms, a0s, jnp.stack(Jrows), jnp.stack(arefs), jnp.stack(invRs)


def _eye_like(nv, lane_ndim, dtype):
    return jnp.eye(nv, dtype=dtype).reshape((nv, nv) + (1,) * lane_ndim)


@partial(jax.custom_jvp, nondiff_argnums=(0, 1, 2))
def _solve_rows_x(dofs_static, n_iters, unroll, M, a0, dyn):
    """Primal projected-Newton solve on generic constraint rows, returning
    the stacked solution x (nv, ...L); STACKED lane-last math (dense J,
    batched Cholesky) per _stack_solver_operands.  Differentiated
    IMPLICITLY (defjvp below) — the lane twin of contact._newton_solver's
    implicit-function rule: forward-mode AD through the truncated Newton
    scan is n_iters x more expensive per tangent and differentiates the
    APPROXIMATE solve instead of the converged solution.  All tangents
    share one primal Hessian factorisation, hoisted out of jacfwd's
    tangent vmap.

    dofs_static: tuple of per-row dof-index tuples (static);
    dyn: tuple of per-row (coeffs tuple, aref, invR) register pytrees."""
    Ms, a0s, J, arefs, invRs = _stack_solver_operands(
        dofs_static, M, a0, dyn
    )
    nv = a0s.shape[0]
    dtype = Ms.dtype
    lane_ndim = Ms.ndim - 2
    eye = _eye_like(nv, lane_ndim, dtype)
    al = jnp.asarray(_ALPHA_LADDER, dtype)
    al_L = al.reshape((len(_ALPHA_LADDER),) + (1,) * lane_ndim)
    al_RL = al.reshape((len(_ALPHA_LADDER),) + (1,) * (lane_ndim + 1))

    def newton_iter(x, _):
        y = jnp.einsum("rn...,n...->r...", J, x) - arefs
        gate = jnp.where(y < 0, invRs, 0.0)
        e = x - a0s
        Me = jnp.einsum("nm...,m...->n...", Ms, e)
        grad = Me + jnp.einsum("rn...,r...->n...", J, gate * y)
        H = Ms + jnp.einsum("rn...,r...,rm...->nm...", J, gate, J) \
            + 1e-10 * eye  # contact._newton_iterations jitter
        dx = -_chol_solve_stacked(H, grad)
        # shared-expansion line search on the merit (contact.py ladder)
        Jdx = jnp.einsum("rn...,n...->r...", J, dx)
        Mdx = jnp.einsum("nm...,m...->n...", Ms, dx)
        eMe = jnp.sum(e * Me, axis=0)
        eMdx = jnp.sum(e * Mdx, axis=0)
        dMd = jnp.sum(dx * Mdx, axis=0)
        ya = y[None] + al_RL * Jdx[None]                      # (A, R, *L)
        pen = jnp.sum(
            invRs[None] * jnp.square(jnp.where(ya < 0, ya, 0.0)), axis=1
        )
        cost = 0.5 * (
            eMe[None] + 2.0 * al_L * eMdx[None]
            + al_L * al_L * dMd[None]
        ) + 0.5 * pen                                          # (A, *L)
        pen0 = jnp.sum(invRs * jnp.square(jnp.where(y < 0, y, 0.0)), axis=0)
        c0 = 0.5 * eMe + 0.5 * pen0
        idx = jnp.argmin(cost, axis=0)
        best_c = jnp.take_along_axis(cost, idx[None], axis=0)[0]
        best_a = al[idx]
        alpha = jnp.where(best_c < c0, best_a, 0.0)
        return x + alpha * dx, None

    x_stack, _ = jax.lax.scan(
        newton_iter, a0s, None, length=n_iters,
        unroll=min(unroll, n_iters),
    )
    return x_stack


@_solve_rows_x.defjvp
def _solve_rows_x_jvp(dofs_static, n_iters, unroll, primals, tangents):
    """Implicit-function tangent at the converged point
    (contact._newton_solver semantics, stacked lane layout): with
    optimality residual R(x; th) = M (x - a0) + J^T (invR * min(y, 0)) = 0,
    dx = -H^{-1} (dR/dth . dth) where H = M + J^T G J is the (primal-only)
    Newton Hessian on the locally-constant active set."""
    M, a0, dyn = primals
    dM, da0, ddyn = tangents
    nv = a0.shape[0]
    x = _solve_rows_x(dofs_static, n_iters, unroll, M, a0, dyn)

    def Rres(M_, a0_, dyn_):
        Ms_, a0s_, J_, arefs_, invRs_ = _stack_solver_operands(
            dofs_static, M_, a0_, dyn_
        )
        y_ = jnp.einsum("rn...,n...->r...", J_, x) - arefs_
        f_ = jnp.where(y_ < 0, y_, 0.0) * invRs_
        return (
            jnp.einsum("nm...,m...->n...", Ms_, x - a0s_)
            + jnp.einsum("rn...,r...->n...", J_, f_)
        )

    _, g_dot = jax.jvp(Rres, (M, a0, dyn), (dM, da0, ddyn))

    Ms, a0s, J, arefs, invRs = _stack_solver_operands(dofs_static, M, a0, dyn)
    y = jnp.einsum("rn...,n...->r...", J, x) - arefs
    gate = jnp.where(y < 0, invRs, 0.0)
    H = Ms + jnp.einsum("rn...,r...,rm...->nm...", J, gate, J) \
        + 1e-10 * _eye_like(nv, Ms.ndim - 2, Ms.dtype)
    dx = -_chol_solve_stacked(H, g_dot)
    return x, dx


def _solve_rows(Ms, a0s, rows, n_iters, unroll=1):
    """Projected-Newton solve of the soft-constraint problem on generic
    rows (contact.solve_constraints semantics: cold start, fixed iteration
    count, shared-expansion merit line search over the alpha ladder).

    Ms (nv, nv, *L) and a0s (nv, *L) are STACKED lane-last tensors; rows
    are register tuples (dofs, coeffs, aref, invR).  Returns stacked
    (x (nv, *L), qfrc_constraint (nv, *L)).  The solution is differentiated
    implicitly (_solve_rows_x custom_jvp above); the constraint force is
    recomputed from x outside the custom rule, so its active-set gating
    differentiates consistently."""
    nv = a0s.shape[0]
    if not rows:
        return a0s, jnp.zeros_like(a0s)
    dofs_static = tuple(tuple(r[0]) for r in rows)
    dyn = tuple((tuple(r[1]), r[2], r[3]) for r in rows)
    x = _solve_rows_x(dofs_static, n_iters, unroll, Ms, a0s, dyn)
    _, _, J, arefs, invRs = _stack_solver_operands(
        dofs_static, Ms, a0s, dyn
    )
    y = jnp.einsum("rn...,n...->r...", J, x) - arefs
    f = -jnp.where(y < 0, y, 0.0) * invRs
    qfrc = jnp.einsum("rn...,r...->n...", J, f)
    return x, qfrc


def integrate_q_regs(T: _Topo, q, v_new, h):
    """qpos' = qpos (+) h * qvel' — FREE-joint quaternions via the exp map
    (integrate.integrate_pos: local-frame angular velocity, right-multiplied,
    normalized)."""
    q_new = list(q)
    for j in range(len(T.jnt_type)):
        qa, da = T.jnt_qposadr[j], T.jnt_dofadr[j]
        if T.jnt_type[j] == FREE:
            for k in range(3):
                q_new[qa + k] = q[qa + k] + h * v_new[da + k]
            quat = (q[qa + 3], q[qa + 4], q[qa + 5], q[qa + 6])
            w = (h * v_new[da + 3], h * v_new[da + 4], h * v_new[da + 5])
            qn = _qnorm(_qmul(quat, _qexp_reg(w)))
            for k in range(4):
                q_new[qa + 3 + k] = qn[k]
        else:
            q_new[qa] = q[qa] + h * v_new[da]
    return q_new


def tangent_q_regs(T: _Topo, q, dz, scale=1.0):
    """qpos (+) scale * dz on the tangent space (integrate_pos with a
    tangent vector dz of nv registers)."""
    return integrate_q_regs(T, q, dz, scale)


def differentiate_q_regs(T: _Topo, q1, q2):
    """Tangent v with q2 = q1 (+) v (mj_differentiatePos, dt = 1):
    scalar dofs (q2-q1); free linear world-frame; free angular local-frame
    quaternion log."""
    out = [None] * T.nv
    for j in range(len(T.jnt_type)):
        qa, da = T.jnt_qposadr[j], T.jnt_dofadr[j]
        if T.jnt_type[j] == FREE:
            for k in range(3):
                out[da + k] = q2[qa + k] - q1[qa + k]
            qa1 = (q1[qa + 3], q1[qa + 4], q1[qa + 5], q1[qa + 6])
            qa2 = (q2[qa + 3], q2[qa + 4], q2[qa + 5], q2[qa + 6])
            w = _qlog_reg(_qmul(_qconj(qa1), qa2))
            for k in range(3):
                out[da + 3 + k] = w[k]
        else:
            out[da] = q2[qa] - q1[qa]
    return out


def build_smooth_step(model: Model, want_fk: bool = False,
                      newton_unroll: int = 1, stacked: bool = True):
    """step(qpos (nq, ...L), qvel (nv, ...L), ctrl (nu, ...L)) ->
    (qpos', qvel'[, fk]) — lane-last, semantics identical to step.py
    (forward [+ joint-limit/contact constraint solve] + implicit-damping
    Euler).  want_fk=True additionally returns a dict with stacked FK
    products of the INPUT state (xpos (nbody,3,...L), site_xpos
    (nsite,3,...L)) for residual evaluation, mirroring how the generic
    rollout evaluates residuals on the forward()-filled Data."""
    assert lanes_supported(model), "model outside lane-engine scope"
    T = _Topo(model)
    h = T.timestep
    has_limits = any(
        T.jnt_limited[j] and T.jnt_type[j] in (HINGE, SLIDE)
        for j in range(len(T.jnt_type))
    )
    has_constraints = has_limits or bool(T.contact_pairs)

    def step_regs(qpos, qvel, ctrl):
        q = [qpos[i] for i in range(T.nq)]
        v = [qvel[i] for i in range(T.nv)]
        u = [ctrl[i] for i in range(T.nu)]
        qfrc, M, fk = _smooth_force_and_M_regs(T, q, v, u)
        if has_constraints:
            a0 = _chol_solve_reglist(M, qfrc)
            rows = _limit_rows_regs(T, q, v)
            if T.contact_pairs:
                rows = rows + _contact_rows_regs(
                    T, q, v, fk["xpos"], fk["xquat"], fk["cdof"]
                )
            _, qfrc_con = _solve_rows_regs(M, a0, rows, _LIMIT_NEWTON_ITERS,
                                      unroll=newton_unroll)
            qfrc = [qfrc[i] + qfrc_con[i] for i in range(T.nv)]
        # implicit joint damping: (M + h D) qacc = rhs  (step.py advance)
        MhD = [
            [
                M[i][j] + (h * float(T.dof_damping[i]) if i == j else 0.0)
                for j in range(T.nv)
            ]
            for i in range(T.nv)
        ]
        qacc = _chol_solve_reglist(MhD, qfrc)
        v_new = [v[i] + h * qacc[i] for i in range(T.nv)]
        q_new = integrate_q_regs(T, q, v_new, h)
        qp2 = jnp.stack(q_new)
        qv2 = jnp.stack(v_new)
        if not want_fk:
            return qp2, qv2

        def as_reg(c):
            c = jnp.asarray(c, qpos.dtype)
            return jnp.broadcast_to(c, qpos[0].shape)

        xpos, xquat = fk["xpos"], fk["xquat"]
        prods = {
            "xpos": jnp.stack(
                [jnp.stack([as_reg(c) for c in xpos[b]])
                 for b in range(T.nbody)]
            ),
            "qpos": qpos,
            "qvel": qvel,
            "ctrl": ctrl,
        }
        if T.nsite:
            sx = []
            for s in range(T.nsite):
                b = T.site_bodyid[s]
                sp = _vadd(xpos[b], _qrot(xquat[b], tuple(T.site_pos[s])))
                sx.append(jnp.stack([as_reg(c) for c in sp]))
            prods["site_xpos"] = jnp.stack(sx)
        return qp2, qv2, prods


    def step_stacked(qpos, qvel, ctrl):
        q = [qpos[i] for i in range(T.nq)]
        v = [qvel[i] for i in range(T.nv)]
        u = [ctrl[i] for i in range(T.nu)]
        qfrc, M, fk = _smooth_force_and_M(T, q, v, u)  # stacked (nv[,nv],*L)
        if has_constraints:
            a0 = _chol_solve_stacked(M, qfrc)
            rows = _limit_rows_regs(T, q, v)
            if T.contact_pairs:
                rows = rows + _contact_rows_regs(
                    T, q, v, fk["xpos"], fk["xquat"], fk["cdof"]
                )
            _, qfrc_con = _solve_rows(M, a0, rows, _LIMIT_NEWTON_ITERS,
                                      unroll=newton_unroll)
            qfrc = qfrc + qfrc_con
        # implicit joint damping: (M + h D) qacc = rhs  (step.py advance)
        ln = M.ndim - 2
        MhD = M + h * jnp.eye(T.nv, dtype=M.dtype).reshape(
            (T.nv, T.nv) + (1,) * ln
        ) * jnp.asarray(T.dof_damping, M.dtype).reshape(
            (T.nv, 1) + (1,) * ln
        )
        qacc = _chol_solve_stacked(MhD, qfrc)
        v_new_s = _bcast_lane(
            _stack_regs(v, M.dtype), qacc.shape[1:]
        ) + h * qacc
        v_new = [v_new_s[i] for i in range(T.nv)]
        q_new = integrate_q_regs(T, q, v_new, h)
        qp2 = jnp.stack(
            [jnp.broadcast_to(jnp.asarray(x, M.dtype), v_new_s.shape[1:])
             for x in q_new]
        )
        qv2 = v_new_s
        if not want_fk:
            return qp2, qv2

        def as_reg(c):
            c = jnp.asarray(c, qpos.dtype)
            return jnp.broadcast_to(c, qpos[0].shape)

        xpos, xquat = fk["xpos"], fk["xquat"]
        prods = {
            "xpos": jnp.stack(
                [jnp.stack([as_reg(c) for c in xpos[b]])
                 for b in range(T.nbody)]
            ),
            "qpos": qpos,
            "qvel": qvel,
            "ctrl": ctrl,
        }
        if T.nsite:
            sx = []
            for s in range(T.nsite):
                b = T.site_bodyid[s]
                sp = _vadd(xpos[b], _qrot(xquat[b], tuple(T.site_pos[s])))
                sx.append(jnp.stack([as_reg(c) for c in sp]))
            prods["site_xpos"] = jnp.stack(sx)
        return qp2, qv2, prods

    step = step_stacked if stacked else step_regs
    return step


def build_fk_products(model: Model):
    """fk(qpos (nq, ...L)) -> dict with xpos (nbody,3,...L) and site_xpos
    (nsite,3,...L) — position-only FK for residual evaluation (the lane
    analogue of tasks.base.residuals_at's forward_kinematics call)."""
    assert lanes_supported(model)
    T = _Topo(model)

    def fk(qpos):
        q = [qpos[i] for i in range(T.nq)]
        xpos, xquat, _ = _fk_registers(T, q)

        def as_reg(c):
            c = jnp.asarray(c, qpos.dtype)
            return jnp.broadcast_to(c, qpos[0].shape)

        prods = {
            "xpos": jnp.stack(
                [jnp.stack([as_reg(c) for c in xpos[b]])
                 for b in range(T.nbody)]
            ),
            # body orientations for tilt/upright residuals (threeD_push,
            # place) — (nbody, 4, ...L)
            "xquat": jnp.stack(
                [jnp.stack([as_reg(c) for c in xquat[b]])
                 for b in range(T.nbody)]
            ),
        }
        if T.nsite:
            sx = []
            for s in range(T.nsite):
                b = T.site_bodyid[s]
                sp = _vadd(xpos[b], _qrot(xquat[b], tuple(T.site_pos[s])))
                sx.append(jnp.stack([as_reg(c) for c in sp]))
            prods["site_xpos"] = jnp.stack(sx)
        return prods

    return fk


def build_tangent_ops(model: Model):
    """(apply, diff) array-level tangent ops for the lane solver:
    apply(qpos (nq,...L), dz (nv,...L)) -> qpos (+) dz;
    diff(q1, q2) -> (nv, ...L) with q2 = q1 (+) diff (mj_integratePos /
    mj_differentiatePos semantics, quaternion-aware)."""
    T = _Topo(model)

    def apply_(qpos, dz):
        q = [qpos[i] for i in range(T.nq)]
        v = [dz[i] for i in range(T.nv)]
        return jnp.stack(integrate_q_regs(T, q, v, 1.0))

    def diff(qpos1, qpos2):
        q1 = [qpos1[i] for i in range(T.nq)]
        q2 = [qpos2[i] for i in range(T.nq)]
        return jnp.stack(differentiate_q_regs(T, q1, q2))

    return apply_, diff
