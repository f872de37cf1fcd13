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

Semantics are IDENTICAL to step.py's smooth path (mj_kinematics / mj_crb /
mj_rne / mj_fwdActuation / implicit-damping Euler — the function the
reference differentiates, `/root/reference/src/Differentiator/
Differentiator.cpp:8-462`); tests/test_lanes.py pins lane-engine outputs to
the generic engine to 1e-10 in f64.

Scope: models whose joints are all HINGE/SLIDE with no contact pairs and no
flex; joint LIMITS are supported via a register-style projected-Newton
constraint solve matching dynamics/contact.py exactly (acrobot, reaching,
arm/chain tasks).  `lanes_supported(model)` gates dispatch.
"""

from __future__ import annotations

import math as pymath

import jax
import jax.numpy as jnp
import numpy as np

from .model import HINGE, SLIDE, Model

__all__ = ["lanes_supported", "build_smooth_step"]


def lanes_supported(model: Model) -> bool:
    """True when the lane engine covers this model's dynamics exactly
    (scalar joints, optional joint limits; no contacts, no flex)."""
    jt = [int(t) for t in np.asarray(model.jnt_type)]
    if any(t not in (HINGE, SLIDE) for t in jt):
        return False
    if model.contact_pairs:
        return False
    if model.flex_edges:
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
            ja = tuple(T.jnt_axis[j])
            jp = tuple(T.jnt_pos[j])
            ang = q[qadr] - T.qpos0[qadr]
            if T.jnt_type[j] == HINGE:
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


def _chol_solve_regs(A, b):
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


def _smooth_force_and_M(T: _Topo, q, v, u):
    """qfrc_smooth registers + mass-matrix register rows (CRBA + RNE,
    matching smooth.py's masked-einsum formulation exactly)."""
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
        dof_body[T.jnt_dofadr[j]] = T.jnt_bodyid[j]

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
            acc = tuple(a + d for a, d in zip(acc, cdof_v[T.jnt_dofadr[j]]))
        cvel[b] = acc
    # cvel_pre(i): velocity of everything STRICTLY before dof i
    # (parent body velocity plus earlier dofs of the same body)
    g = [float(x) for x in T.gravity]
    a0 = (0.0, 0.0, 0.0, -g[0], -g[1], -g[2])
    cacc = [a0] * T.nbody
    cdofdot = [None] * T.nv
    for b in range(1, T.nbody):
        pre = cvel[T.parent[b]]
        acc_b = cacc[T.parent[b]]
        for j in T.body_joints[b]:
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
        if k != 0.0:
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
    return qfrc_smooth, M


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
    """Joint-limit constraint rows (contact._limit_rows semantics):
    returns per-row (dof index, sign, aref register, invR register)."""
    rows = []
    for j in range(len(T.jnt_type)):
        if not T.jnt_limited[j]:
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
            rows.append((da, sign, aref, include / R))
    return rows


def _solve_limits(T: _Topo, M, a0, rows):
    """Projected-Newton solve of the limit-only soft-constraint problem
    (contact.solve_constraints with J rows = +-e_da, cold start, 8 iters).

    Returns (x regs, qfrc_constraint regs).  Differentiable by plain jacfwd:
    the iteration is cold-started and converges well within the budget, so
    the tangent recursion is converged too (the warmstart caveat in
    contact._newton_solver does not apply)."""
    nv = len(a0)
    x = list(a0)
    for _ in range(_LIMIT_NEWTON_ITERS):
        ys = [sign * x[da] - aref for (da, sign, aref, _) in rows]
        gates = [
            (y < 0).astype(y.dtype) * invR
            for y, (_, _, _, invR) in zip(ys, rows)
        ]
        e = [x[i] - a0[i] for i in range(nv)]
        Me = [
            sum(M[i][j] * e[j] for j in range(nv)) for i in range(nv)
        ]
        grad = list(Me)
        for (da, sign, _, _), y, g in zip(rows, ys, gates):
            grad[da] = grad[da] + sign * (g * y)
        H = [row[:] for row in M]
        for (da, _, _, _), g in zip(rows, gates):
            H[da][da] = H[da][da] + g
        dx = [-z for z in _chol_solve_regs(H, grad)]
        # shared-expansion line search on the merit (contact.py ladder)
        Jdx = [sign * dx[da] for (da, sign, _, _) in rows]
        Mdx = [
            sum(M[i][j] * dx[j] for j in range(nv)) for i in range(nv)
        ]
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
        x = [x[i] + alpha * dx[i] for i in range(nv)]

    ys = [sign * x[da] - aref for (da, sign, aref, _) in rows]
    qfrc = [jnp.zeros_like(x[0])] * nv
    for (da, sign, _, invR), y in zip(rows, ys):
        f = -jnp.where(y < 0, y, 0.0) * invR
        qfrc[da] = qfrc[da] + sign * f
    return x, qfrc


def build_smooth_step(model: Model):
    """step(qpos (nq, ...L), qvel (nv, ...L), ctrl (nu, ...L)) ->
    (qpos', qvel') — lane-last, semantics identical to step.py's smooth path
    (forward [+ joint-limit constraint solve] + implicit-damping Euler).
    """
    assert lanes_supported(model), "lane engine requires a smooth scalar model"
    T = _Topo(model)
    h = T.timestep
    has_limits = any(T.jnt_limited)

    def step(qpos, qvel, ctrl):
        q = [qpos[i] for i in range(T.nq)]
        v = [qvel[i] for i in range(T.nv)]
        u = [ctrl[i] for i in range(T.nu)]
        qfrc, M = _smooth_force_and_M(T, q, v, u)
        if has_limits:
            a0 = _chol_solve_regs(M, qfrc)
            rows = _limit_rows_regs(T, q, v)
            _, qfrc_con = _solve_limits(T, M, a0, rows)
            qfrc = [qfrc[i] + qfrc_con[i] for i in range(T.nv)]
        # implicit joint damping: (M + h D) qacc = rhs  (step.py advance)
        MhD = [
            [
                M[i][j] + (h * float(T.dof_damping[i]) if i == j else 0.0)
                for j in range(T.nv)
            ]
            for i in range(T.nv)
        ]
        qacc = _chol_solve_regs(MhD, qfrc)
        v_new = [v[i] + h * qacc[i] for i in range(T.nv)]
        q_new = [q[i] + h * v_new[i] for i in range(T.nq)]
        return jnp.stack(q_new), jnp.stack(v_new)

    return step
