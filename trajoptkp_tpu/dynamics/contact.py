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

from ..utils.linalg import sym_solve
from .collision import pair_contacts, pair_ncon
from .model import BALL, FREE, HINGE, SLIDE, Data, Model

_NEWTON_ITERS = 8


def _newton_iterations(model_nv: int, n_iters: int):
    """Projected-Newton iterations on the primal problem (shared by the two
    custom_jvp solver instances below)."""

    def run(M, a0, J, aref, invR, x_init):
        def newton_step(x, _):
            y = J @ x - aref
            gate = (y < 0).astype(x.dtype) * invR
            e = x - a0
            Me = M @ e
            grad = Me + J.T @ (gate * y)
            H = M + jnp.einsum("in,i,im->nm", J, gate, J)
            dx = -sym_solve(
                H + 1e-10 * jnp.eye(model_nv, dtype=x.dtype), grad
            )

            # line search on the merit, sharing matvecs: along x + alpha*dx
            # the smooth part is an exact quadratic in alpha and the penalty
            # reuses y and J@dx — no fresh J@z / M@z per candidate.
            Jdx = J @ dx
            Mdx = M @ dx
            eMe = e @ Me
            eMdx = e @ Mdx
            dMd = dx @ Mdx

            def cost_alpha(alpha):
                ya = y + alpha * Jdx
                pen = jnp.where(ya < 0, ya, 0.0)
                return 0.5 * (eMe + 2 * alpha * eMdx + alpha * alpha * dMd) \
                    + 0.5 * jnp.sum(invR * pen * pen)

            # convex piecewise-quadratic objective: the full Newton step is
            # almost always accepted, but near active-set kinks both 1 and
            # 0.5 can overshoot (a warmstarted iterate can then stall at
            # alpha=0 permanently), so evaluate a geometric candidate ladder
            # — each candidate costs only one (nefc,) vector op via the
            # shared expansions above.
            cands = jnp.array(
                [1.0, 0.5, 0.25, 0.1, 0.04, 0.01], dtype=x.dtype
            )
            costs = jax.vmap(cost_alpha)(cands)
            best = jnp.argmin(costs)
            alpha = jnp.where(
                costs[best] < cost_alpha(0.0), cands[best], 0.0
            )
            return x + alpha * dx, None

        x, _ = jax.lax.scan(newton_step, x_init, None, length=n_iters)
        return x

    return run


from functools import lru_cache


@lru_cache(maxsize=None)
def _newton_solver(model_nv: int, n_iters: int):
    """custom_jvp projected-Newton solver: iterate in the primal, but
    differentiate IMPLICITLY at the solution.

    Forward-mode AD through truncated Newton iterations is both expensive
    (every tangent re-traverses all iterations) and wrong when the tangent
    recursion hasn't converged — with a warmstarted 5-iteration solve it
    produces O(1e4) garbage Jacobian entries in f32.  The implicit-function
    rule at the converged point is exact (what mjd_transitionFD measures on
    a converged MuJoCo solve), and all tangent directions share ONE
    factorisation of H = M + J^T G J because H is primal-only — under
    jax.jacfwd the factorisation is hoisted out of the tangent vmap.
    """
    core = _newton_iterations(model_nv, n_iters)

    @jax.custom_jvp
    def solve(M, a0, J, aref, invR, x_init):
        return core(M, a0, J, aref, invR, x_init)

    @solve.defjvp
    def solve_jvp(primals, tangents):
        M, a0, J, aref, invR, x_init = primals
        dM, da0, dJ, daref, dinvR, _ = tangents  # solution ⟂ x_init
        x = solve(M, a0, J, aref, invR, x_init)

        # optimality residual F(x; θ) = M (x - a0) + J^T (g ∘ (J x - aref)),
        # g = 1_{y<0} invR.  dx = -(∂F/∂x)^{-1} (∂F/∂θ · dθ), with
        # ∂F/∂x = M + J^T G J on the (a.e. locally constant) active set.
        def F(M_, a0_, J_, aref_, invR_):
            y_ = J_ @ x - aref_
            g_ = jnp.where(y_ < 0, invR_, 0.0)
            return M_ @ (x - a0_) + J_.T @ (g_ * y_)

        _, dF = jax.jvp(F, (M, a0, J, aref, invR),
                        (dM, da0, dJ, daref, dinvR))
        y = J @ x - aref
        gate = (y < 0).astype(x.dtype) * invR
        H = M + jnp.einsum("in,i,im->nm", J, gate, J)
        dx = -sym_solve(H + 1e-10 * jnp.eye(model_nv, dtype=x.dtype), dF)
        return x, dx

    return solve


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


def _contact_rows(model: Model, data: Data):
    """Pyramidal rows for every candidate contact slot, assembled in one
    vectorised block (narrow phase stays per-pair — heterogeneous shapes —
    but impedance/Jacobian/row construction batches over all slots).

    Returns a Rows batch of 4 * total_slots rows, or None."""
    if not model.contact_pairs:
        return None
    dtype = data.qpos.dtype
    inv_mass = model.body_invweight0[:, 0]

    dists, poss, frames = [], [], []
    b1s, b2s = [], []
    solrefs, solimps, frictions, margins = [], [], [], []
    for (g1, g2) in model.contact_pairs:
        t1, t2 = model.geom_type[g1], model.geom_type[g2]
        b1, b2 = model.geom_bodyid[g1], model.geom_bodyid[g2]
        solref, solimp, friction, margin = _combine(model, g1, g2)
        dd, pp, ff = pair_contacts(
            t1, t2,
            data.geom_xpos[g1], data.geom_xmat[g1], model.geom_size[g1],
            data.geom_xpos[g2], data.geom_xmat[g2], model.geom_size[g2],
        )
        n_slots = dd.shape[0]
        dists.append(dd)
        poss.append(pp)
        frames.append(ff)
        b1s += [b1] * n_slots
        b2s += [b2] * n_slots
        solrefs += [solref] * n_slots
        solimps += [solimp] * n_slots
        frictions += [friction] * n_slots
        margins += [margin] * n_slots

    dist = jnp.concatenate(dists)                 # (S,)
    pos = jnp.concatenate(poss)                   # (S, 3)
    frame = jnp.concatenate(frames)               # (S, 3, 3)
    solref = jnp.stack(solrefs)
    solimp = jnp.stack(solimps)
    friction = jnp.stack(frictions)
    margin = jnp.stack(margins)
    b1a = jnp.array(b1s)
    b2a = jnp.array(b2s)
    S = dist.shape[0]

    include = dist < margin
    imp_pos = dist - margin
    d = jax.vmap(_impedance)(solimp, imp_pos)
    k, b = jax.vmap(_kb)(solref, solimp, d)

    # relative point Jacobians, batched over slots: (S, 3, nv)
    w = data.cdof[:, :3]
    v = data.cdof[:, 3:]
    mask_rel = model.ancestor_mask[b2a] - model.ancestor_mask[b1a]  # (S, nv)
    # jac(point, body) = (v + w x point) masked; relative = mask difference
    jac_pt = v[None, :, :] + jnp.cross(
        w[None, :, :], pos[:, None, :]
    )  # (S, nv, 3)
    jac_rel = jac_pt * mask_rel[:, :, None]       # (S, nv, 3)

    Jn = jnp.einsum("si,svi->sv", frame[:, 0], jac_rel)   # (S, nv)
    Jt1 = jnp.einsum("si,svi->sv", frame[:, 1], jac_rel)
    Jt2 = jnp.einsum("si,svi->sv", frame[:, 2], jac_rel)

    mu0 = friction[:, 0]
    diag_approx = inv_mass[b1a] + inv_mass[b2a]
    # MuJoCo pyramidal R (verified against efc_R):
    #   R = (1-d)/d * (invw1+invw2) * 2*mu0^2*(1+mu0^2), same for all rows
    R_slot = (
        jnp.maximum((1.0 - d) / jnp.maximum(d, 1e-6), 1e-9)
        * jnp.maximum(diag_approx, 1e-9)
        * 2.0 * mu0 * mu0 * (1.0 + mu0 * mu0)
    )

    # pyramidal edge rows (Jn +- mu * Jt_j), j = 1, 2, single slide mu
    # (geom_friction layout (slide, torsion, roll)) — verified vs efc_J/aref
    mu = mu0[:, None]
    J4 = jnp.concatenate(
        [Jn + mu * Jt1, Jn - mu * Jt1, Jn + mu * Jt2, Jn - mu * Jt2], axis=0
    )  # (4S, nv)
    vel4 = J4 @ data.qvel
    k4 = jnp.tile(k, 4)
    b4 = jnp.tile(b, 4)
    imp4 = jnp.tile(imp_pos, 4)
    aref4 = -b4 * vel4 - k4 * imp4
    return Rows(
        J=J4,
        aref=aref4,
        R=jnp.tile(R_slot, 4),
        active=jnp.tile(include, 4).astype(dtype),
    )


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
    parts = [p for p in (_limit_rows(model, data), _contact_rows(model, data))
             if p is not None]
    return Rows(
        J=jnp.concatenate([p.J for p in parts]),
        aref=jnp.concatenate([p.aref for p in parts]),
        R=jnp.concatenate([p.R for p in parts]),
        active=jnp.concatenate([p.active for p in parts]),
    )


# 5 warm iterations behaviourally matches the 8-iteration cold solve on the
# chaotic box-box impact suite (4 visibly under-resolves impact transients —
# tests/test_contacts.py::test_piston_pushes_block)
_NEWTON_ITERS_WARM = 5


def solve_constraints(model: Model, data: Data, qfrc_smooth: jnp.ndarray,
                      solver_iters: int = None) -> Data:
    """Projected-Newton solve of the primal soft-constraint problem.

    Warmstart semantics (the reference relies on MuJoCo's qacc_warmstart,
    copied per FD replica at `MuJoCoHelper.cpp:732-741`): when
    ``data.warmstart`` is set it holds the previous step's constraint
    correction delta (qacc - qacc_smooth); Newton starts from
    x0 = qacc_smooth + delta and runs fewer iterations (consecutive rollout
    steps are close, so 5 warm iterations (_NEWTON_ITERS_WARM) match 8 cold
    ones well inside the soft-constraint tolerance; 4 visibly under-resolves
    impact transients).  A zero delta reproduces the cold start exactly, so
    scans can initialise the carry with zeros.

    Fills qfrc_constraint, qacc (= the Newton solution — the exact
    constrained acceleration, no extra solve), and the new warmstart delta.
    """
    rows = assemble_constraints(model, data)
    nefc = rows.J.shape[0]
    if nefc == 0:
        return data.replace(qfrc_constraint=jnp.zeros_like(qfrc_smooth))

    M = data.qM
    a0 = sym_solve(M, qfrc_smooth)  # qacc_smooth (custom-JVP solve)

    J = rows.J * rows.active[:, None]
    aref = rows.aref
    invR = rows.active / rows.R  # inactive rows contribute nothing

    def _merit(z):
        yz = J @ z - aref
        pen = jnp.where(yz < 0, yz, 0.0)
        return 0.5 * (z - a0) @ (M @ (z - a0)) + 0.5 * jnp.sum(
            invR * pen * pen
        )

    if data.warmstart is not None:
        # accept the warmstart only when it beats the smooth start (MuJoCo's
        # mj_warmstart does the same comparison) and is finite — an f32
        # delta carried across an impact can otherwise drift the start
        # arbitrarily far from the solution.
        x_ws = a0 + data.warmstart
        ok = jnp.all(jnp.isfinite(x_ws)) & (_merit(x_ws) < _merit(a0))
        x_init = jnp.where(ok, x_ws, a0)
        n_iters = _NEWTON_ITERS_WARM
    else:
        x_init = a0
        n_iters = _NEWTON_ITERS
    if solver_iters is not None:
        # FD solver-clamp parity mode (MuJoCoHelper.cpp:925-937): the
        # reference pins maxIter during finite differencing; this override
        # reproduces that clamp for the divergence experiment
        n_iters = solver_iters

    x = _newton_solver(model.nv, n_iters)(M, a0, J, aref, invR, x_init)
    y = J @ x - aref
    f = -jnp.where(y < 0, y, 0.0) * invR
    qfrc_constraint = J.T @ f
    return data.replace(
        qfrc_constraint=qfrc_constraint, qacc=x, warmstart=x - a0
    )
