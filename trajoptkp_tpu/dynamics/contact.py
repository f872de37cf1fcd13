"""Soft-constraint assembly + solver: contacts and joint limits.

MuJoCo-compatible constraint model (the reference's tasks depend on full
MuJoCo contact semantics, `/root/reference/SURVEY.md` hard-part #1):

  - candidate contacts from the static pair list (Model.contact_pairs) via
    the primitive narrow phase (collision.py) — fixed slot counts;
  - impedance d(pos) from solimp, stiffness/damping from solref:
        b = 2 / (dmax * timeconst)
        k = d / (dmax^2 * timeconst^2 * dampratio^2)
        aref = -b * (J qvel) - k * imp_pos
  - regulariser R = (1 - d)/d * diagApprox, force f = -(1/R) (J qacc - aref)
    on active rows;
  - pyramidal friction cone (2 rows per tangent direction, condim 3);
  - joint limits as one-sided rows.

Solver: fixed-iteration projected Newton on the primal problem
    min_x 0.5 (x - a0)^T M (x - a0) + sum_i active_i (J_i x - aref_i)^2/(2 R_i)
(same convex QP MuJoCo's Newton solver optimises with pyramidal cones, so a
converged solution matches MuJoCo's across solver choices).  Dense (nv+nc)
linear algebra with static shapes — TPU-friendly, no long sequential sweeps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .collision import pair_contacts, pair_ncon
from .model import BALL, FREE, HINGE, SLIDE, Data, Model

_NEWTON_ITERS = 12


def _impedance(solimp, pos):
    """mj_assignImpedance: sigmoid from d0 to dwidth over `width`."""
    d0, dwidth, width, midpoint, power = (
        solimp[0], solimp[1], solimp[2], solimp[3], solimp[4],
    )
    x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, 1e-12), 0.0, 1.0)
    # two-sided power sigmoid through (midpoint, midpoint-ish)
    mp = jnp.clip(midpoint, 1e-6, 1.0 - 1e-6)
    pw = jnp.maximum(power, 1.0)
    y_lo = (x**pw) / (mp ** (pw - 1.0))
    y_hi = 1.0 - ((1.0 - x) ** pw) / ((1.0 - mp) ** (pw - 1.0))
    y = jnp.where(x <= mp, y_lo, y_hi)
    return d0 + y * (dwidth - d0)


def _kb(solref, solimp, d):
    """Stiffness/damping from solref (positive = (timeconst, dampratio))."""
    dmax = solimp[1]
    tc = jnp.maximum(solref[0], 1e-8)
    dr = jnp.maximum(solref[1], 1e-8)
    b = 2.0 / (dmax * tc)
    k = d / (dmax * dmax * tc * tc * dr * dr)
    return k, b


def _point_jacobian(model: Model, data: Data, body_id: int, point):
    """(3, nv) translational Jacobian of a world point on body_id."""
    mask = model.ancestor_mask[body_id]
    w = data.cdof[:, :3]
    v = data.cdof[:, 3:]
    jacp = (v + jnp.cross(w, jnp.broadcast_to(point, w.shape))) * mask[:, None]
    return jacp.T  # (3, nv)


class Rows(NamedTuple):
    J: jnp.ndarray       # (nefc, nv)
    aref: jnp.ndarray    # (nefc,)
    R: jnp.ndarray       # (nefc,)
    active: jnp.ndarray  # (nefc,) float 0/1


def _combine(model: Model, g1: int, g2: int):
    """MuJoCo default parameter mixing (equal priority, solmix 1):
    solref/solimp average, friction elementwise max."""
    solref = 0.5 * (model.geom_solref[g1] + model.geom_solref[g2])
    solimp = 0.5 * (model.geom_solimp[g1] + model.geom_solimp[g2])
    friction = jnp.maximum(model.geom_friction[g1], model.geom_friction[g2])
    margin = jnp.maximum(model.geom_margin[g1], model.geom_margin[g2])
    return solref, solimp, friction, margin


def _contact_rows(model: Model, data: Data) -> list:
    """Pyramidal rows for every candidate contact slot (static count)."""
    rows = []
    dtype = data.qpos.dtype
    # translational self-inertia approximation per body (for R): use
    # dof_invweight0-style scalar — approximate with 1/mass (world: 0)
    inv_mass = model.body_invweight0[:, 0]
    for (g1, g2) in model.contact_pairs:
        t1, t2 = model.geom_type[g1], model.geom_type[g2]
        b1, b2 = model.geom_bodyid[g1], model.geom_bodyid[g2]
        solref, solimp, friction, margin = _combine(model, g1, g2)
        dists, poss, frames = pair_contacts(
            t1, t2,
            data.geom_xpos[g1], data.geom_xmat[g1], model.geom_size[g1],
            data.geom_xpos[g2], data.geom_xmat[g2], model.geom_size[g2],
        )
        n_slots = dists.shape[0]
        for s in range(n_slots):
            dist, pos, frame = dists[s], poss[s], frames[s]
            include = dist < margin
            imp_pos = dist - margin
            d = _impedance(solimp, imp_pos)
            k, b = _kb(solref, solimp, d)
            jac_rel = _point_jacobian(model, data, b2, pos) - _point_jacobian(
                model, data, b1, pos
            )  # (3, nv): velocity of b2 point relative to b1 point
            Jn = frame[0] @ jac_rel
            diag_approx = inv_mass[b1] + inv_mass[b2]
            # MuJoCo pyramidal R (verified against efc_R):
            #   R = (1-d)/d * (invw1+invw2) * 2*mu0^2*(1+mu0^2), same all rows
            mu0 = friction[0]
            R_row = (
                jnp.maximum((1.0 - d) / jnp.maximum(d, 1e-6), 1e-9)
                * jnp.maximum(diag_approx, 1e-9)
                * 2.0 * mu0 * mu0 * (1.0 + mu0 * mu0)
            )
            # pyramidal edge rows (Jn +- mu * Jt_j), j = 1, 2, with the single
            # slide coefficient mu = friction[0] (geom_friction layout is
            # (slide, torsion, roll)) — verified against efc_J/efc_aref
            for j in (1, 2):
                Jt = frame[j] @ jac_rel
                mu = mu0
                for sgn in (1.0, -1.0):
                    Jrow = Jn + sgn * mu * Jt
                    vel = Jrow @ data.qvel
                    aref = -b * vel - k * imp_pos
                    rows.append(
                        Rows(
                            J=Jrow,
                            aref=aref,
                            R=R_row,
                            active=include.astype(dtype),
                        )
                    )
    return rows


def _limit_rows(model: Model, data: Data):
    """Joint-limit rows, fully vectorised over (limited scalar joints x 2 sides).

    Returns a Rows batch or None."""
    dtype = data.qpos.dtype
    lim = [j for j in range(model.njnt)
           if model.jnt_limited[j] and model.jnt_type[j] in (HINGE, SLIDE)]
    if not lim:
        return None
    jidx = jnp.array(lim)
    qadr = jnp.array([model.jnt_qposadr[j] for j in lim])
    dadr = jnp.array([model.jnt_dofadr[j] for j in lim])
    lo = model.jnt_range[jidx, 0]
    hi = model.jnt_range[jidx, 1]
    margin = model.jnt_margin[jidx]
    inv_w = jnp.maximum(model.dof_invweight0[dadr], 1e-9)
    q = data.qpos[qadr]
    v = data.qvel[dadr]

    # side 0: q - lo (J = +e), side 1: hi - q (J = -e); stacked
    dist = jnp.concatenate([q - lo, hi - q])
    sign = jnp.concatenate(
        [jnp.ones_like(q), -jnp.ones_like(q)]
    )
    vel = sign * jnp.concatenate([v, v])
    margin2 = jnp.concatenate([margin, margin])
    inv_w2 = jnp.concatenate([inv_w, inv_w])
    solimp2 = jnp.concatenate([model.jnt_solimp[jidx]] * 2)
    solref2 = jnp.concatenate([model.jnt_solref[jidx]] * 2)
    dadr2 = jnp.concatenate([dadr, dadr])

    include = dist < margin2
    imp_pos = dist - margin2
    d = jax.vmap(_impedance)(solimp2, imp_pos)
    k, b = jax.vmap(_kb)(solref2, solimp2, d)
    aref = -b * vel - k * imp_pos
    nlim2 = 2 * len(lim)
    J = jnp.zeros((nlim2, model.nv), dtype=dtype).at[
        jnp.arange(nlim2), dadr2
    ].set(sign)
    R = jnp.maximum((1.0 - d) / jnp.maximum(d, 1e-6), 1e-9) * inv_w2
    return Rows(J=J, aref=aref, R=R, active=include.astype(dtype))


def assemble_constraints(model: Model, data: Data) -> Rows:
    crows = _contact_rows(model, data)
    parts = []
    lrows = _limit_rows(model, data)
    if lrows is not None:
        parts.append(lrows)
    if crows:
        parts.append(
            Rows(
                J=jnp.stack([r.J for r in crows]),
                aref=jnp.stack([r.aref for r in crows]),
                R=jnp.stack([r.R for r in crows]),
                active=jnp.stack([r.active for r in crows]),
            )
        )
    return Rows(
        J=jnp.concatenate([p.J for p in parts]),
        aref=jnp.concatenate([jnp.atleast_1d(p.aref) for p in parts]),
        R=jnp.concatenate([jnp.atleast_1d(p.R) for p in parts]),
        active=jnp.concatenate([jnp.atleast_1d(p.active) for p in parts]),
    )


def solve_constraints(model: Model, data: Data, qfrc_smooth: jnp.ndarray) -> Data:
    """Projected-Newton solve of the primal soft-constraint problem."""
    rows = assemble_constraints(model, data)
    nefc = rows.J.shape[0]
    if nefc == 0:
        return data.replace(qfrc_constraint=jnp.zeros_like(qfrc_smooth))

    M = data.qM
    Lm = jax.scipy.linalg.cho_factor(M)
    a0 = jax.scipy.linalg.cho_solve(Lm, qfrc_smooth)  # qacc_smooth

    J = rows.J * rows.active[:, None]
    aref = rows.aref
    invR = rows.active / rows.R  # inactive rows contribute nothing

    def newton_step(x, _):
        y = J @ x - aref
        # one-sided penalty: active when y < 0
        gate = (y < 0).astype(x.dtype) * invR
        grad = M @ (x - a0) + J.T @ (gate * y)
        H = M + jnp.einsum("in,i,im->nm", J, gate, J)
        Lh = jax.scipy.linalg.cho_factor(
            H + 1e-10 * jnp.eye(model.nv, dtype=x.dtype)
        )
        dx = -jax.scipy.linalg.cho_solve(Lh, grad)

        # backtracking line search on the merit (cost is piecewise quadratic)
        def cost(z):
            yz = J @ z - aref
            pen = jnp.where(yz < 0, yz, 0.0)
            return 0.5 * (z - a0) @ (M @ (z - a0)) + 0.5 * jnp.sum(
                invR * pen * pen
            )

        c0 = cost(x)
        alphas = jnp.array([1.0, 0.5, 0.25, 0.125, 0.0625], dtype=x.dtype)
        costs = jax.vmap(lambda a: cost(x + a * dx))(alphas)
        best = jnp.argmin(costs)
        x_new = jnp.where(costs[best] < c0, 1.0, 0.0) * (
            x + alphas[best] * dx
        ) + jnp.where(costs[best] < c0, 0.0, 1.0) * x
        return x_new, None

    x, _ = jax.lax.scan(newton_step, a0, None, length=_NEWTON_ITERS)
    y = J @ x - aref
    f = -jnp.where(y < 0, y, 0.0) * invR
    qfrc_constraint = J.T @ f
    return data.replace(qfrc_constraint=qfrc_constraint)
