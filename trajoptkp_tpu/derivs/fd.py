"""Batched dynamics-Jacobian engine: FD columns and autodiff, keypoint-driven.

TPU-native replacement for the reference Differentiator
(`/root/reference/src/Differentiator/Differentiator.cpp:8-462`) and the
thread-pool dispatch in Optimiser::ComputeDynamicsDerivativesAtKeypoints
(`src/Optimiser/Optimiser.cpp:239-323`).

Reference semantics reproduced:
  - state x = [pos_tangent; vel] over the task's selected state dofs; A is
    (2*ndof, 2*ndof), B is (2*ndof, nu).
  - central differences, eps = 1e-6 (`Optimiser.cpp:321`), with position
    perturbations on the quaternion tangent space (mj_integratePos /
    mj_differentiatePos analogues, `Differentiator.cpp:170,288,388`).
  - per-dof keypoints: perturbing state dof d at time t produces A columns d
    (pos) and ndof+d (vel), plus B column d when d < nu
    (`Differentiator.cpp:441-457`).

TPU design: the ragged per-dof keypoint sets are flattened into a single
padded array of (time, dof) jobs of static size `budget`; one vmap over jobs
batches every MuJoCo-equivalent stepper evaluation of the iteration into a
single device launch — the analogue of "thousands of columns per chip".
Invalid (padding) jobs are masked out on scatter.

Because our stepper is differentiable, an exact-autodiff mode (jacfwd of the
step function, ~2x cheaper than central FD and noise-free) is provided behind
the same keypoint interface; FD remains the parity mode.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..dynamics.integrate import differentiate_pos, integrate_pos
from ..dynamics.model import Model
from ..dynamics.step import step_state
from ..state.statevector import StateVector


@struct.dataclass
class DerivJobs:
    """Padded flat list of (time, dof) derivative jobs."""

    t: jnp.ndarray      # (budget,) int32 time indices
    d: jnp.ndarray      # (budget,) int32 state-dof indices
    valid: jnp.ndarray  # (budget,) bool

    @property
    def budget(self) -> int:
        return self.t.shape[0]


def jobs_from_mask(keypoint_mask: jnp.ndarray, budget: int) -> DerivJobs:
    """Flatten a (H, ndof) keypoint mask into padded jobs.

    `budget` is static; callers size it from the keypoint method config
    (H*ndof for SI_1; smaller for sparser methods).  Extra keypoints beyond
    the budget are dropped deterministically in flatten order (callers should
    size budgets to make this impossible).
    """
    H, ndof = keypoint_mask.shape
    flat = keypoint_mask.reshape(-1)
    # stable order: all (t, d) pairs with mask=1 first
    order = jnp.argsort(~flat, stable=True)[:budget]
    valid = flat[order]
    t = (order // ndof).astype(jnp.int32)
    d = (order % ndof).astype(jnp.int32)
    return DerivJobs(t=t, d=d, valid=valid)


def _tangent_out(model, sv, qpos_a, qvel_a, qpos_b, qvel_b, scale):
    """(state_b - state_a) / scale on the tangent space, over selected dofs."""
    idx = jnp.array(sv.order)
    dpos = differentiate_pos(model, qpos_a, qpos_b)[idx] / scale
    dvel = (qvel_b - qvel_a)[idx] / scale
    return jnp.concatenate([dpos, dvel])


def fd_job_columns(
    model: Model,
    sv: StateVector,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    ctrl: jnp.ndarray,
    d: jnp.ndarray,
    eps: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Central-FD columns for one (state, dof) job.

    Returns (colA_pos, colA_vel, colB), each (2*ndof,).  colB is only
    meaningful when d < nu (masked by the caller on scatter).
    """
    nv = model.nv
    dof_idx = jnp.array(sv.order)[d]
    e_v = (jnp.arange(nv) == dof_idx).astype(qpos.dtype)

    # --- velocity perturbation (Differentiator.cpp:226-325)
    qp_p, qv_p = step_state(model, qpos, qvel + eps * e_v, ctrl)
    qp_m, qv_m = step_state(model, qpos, qvel - eps * e_v, ctrl)
    colA_vel = _tangent_out(model, sv, qp_m, qv_m, qp_p, qv_p, 2 * eps)

    # --- position perturbation on the tangent space (:328-428)
    qpos_p = integrate_pos(model, qpos, eps * e_v, 1.0)
    qpos_m = integrate_pos(model, qpos, -eps * e_v, 1.0)
    qp_p, qv_p = step_state(model, qpos_p, qvel, ctrl)
    qp_m, qv_m = step_state(model, qpos_m, qvel, ctrl)
    colA_pos = _tangent_out(model, sv, qp_m, qv_m, qp_p, qv_p, 2 * eps)

    # --- control perturbation (:79-223); ctrl index == dof index (<nu)
    if model.nu > 0:
        cidx = jnp.clip(d, 0, model.nu - 1)
        e_u = (jnp.arange(model.nu) == cidx).astype(qpos.dtype)
        qp_p, qv_p = step_state(model, qpos, qvel, ctrl + eps * e_u)
        qp_m, qv_m = step_state(model, qpos, qvel, ctrl - eps * e_u)
        colB = _tangent_out(model, sv, qp_m, qv_m, qp_p, qv_p, 2 * eps)
    else:
        colB = jnp.zeros((2 * sv.ndof,), dtype=qpos.dtype)
    return colA_pos, colA_vel, colB


def ad_job_columns(
    model: Model,
    sv: StateVector,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    ctrl: jnp.ndarray,
    d: jnp.ndarray,
    eps: float = 1e-6,  # unused; kept for interface parity
):
    """Exact forward-mode JVP columns for one job (autodiff mode).

    Matches FD semantics in the eps->0 limit: output tangent coordinates are
    taken *about the nominal next state* (FD differences the +/- outputs,
    which linearises about the same point), so quaternion log-map curvature
    does not skew the Jacobian at large rotations.
    """
    nv = model.nv
    dof_idx = jnp.array(sv.order)[d]
    e_v = (jnp.arange(nv) == dof_idx).astype(qpos.dtype)
    qp_nom, qv_nom = step_state(model, qpos, qvel, ctrl)

    def out(dpos, dvel, du):
        qp, qv = step_state(
            model,
            integrate_pos(model, qpos, dpos, 1.0),
            qvel + dvel,
            ctrl + du,
        )
        return _tangent_out(model, sv, qp_nom, qv_nom, qp, qv, 1.0)

    zv = jnp.zeros((nv,), dtype=qpos.dtype)
    zu = jnp.zeros((model.nu,), dtype=qpos.dtype)
    _, colA_pos = jax.jvp(lambda p: out(p, zv, zu), (zv,), (e_v,))
    _, colA_vel = jax.jvp(lambda v: out(zv, v, zu), (zv,), (e_v,))
    if model.nu > 0:
        cidx = jnp.clip(d, 0, model.nu - 1)
        e_u = (jnp.arange(model.nu) == cidx).astype(qpos.dtype)
        _, colB = jax.jvp(lambda u: out(zv, zv, u), (zu,), (e_u,))
    else:
        colB = jnp.zeros((2 * sv.ndof,), dtype=qpos.dtype)
    return colA_pos, colA_vel, colB


def _batched_fd_columns(model, sv, qpos_b, qvel_b, ctrl_b, d_b, eps,
                        warm_b=None):
    """Central-FD columns for a batch of jobs through ONE vmapped step graph.

    Builds all 6 perturbed configurations per job up front (cheap scatter
    ops), runs a single vmap(step) over the (6*njobs) batch, and recombines —
    the compiled graph contains the stepper once instead of six times, which
    cuts XLA compile time ~6x and gives the compiler one large fusion.

    warm_b (optional, (J, nv)): per-job constraint-solver warmstart — all 6
    perturbed configurations share it, exactly like the reference copies one
    qacc_warmstart into each FD replica (`MuJoCoHelper.cpp:732-741`).
    """
    nv, nu = model.nv, model.nu
    njobs = qpos_b.shape[0]
    dtype = qpos_b.dtype
    dof_idx = jnp.array(sv.order)[d_b]                      # (J,)
    e_v = (jnp.arange(nv)[None, :] == dof_idx[:, None]).astype(dtype)
    if nu > 0:
        cidx = jnp.clip(d_b, 0, nu - 1)
        e_u = (jnp.arange(nu)[None, :] == cidx[:, None]).astype(dtype)
    else:
        e_u = jnp.zeros((njobs, 0), dtype=dtype)

    int_pos = jax.vmap(lambda qp, dv, s: integrate_pos(model, qp, dv, s),
                       in_axes=(0, 0, None))
    qpos_p = int_pos(qpos_b, eps * e_v, 1.0)
    qpos_m = int_pos(qpos_b, -eps * e_v, 1.0)

    # order: [pos+, pos-, vel+, vel-, ctrl+, ctrl-] stacked over jobs
    QP = jnp.concatenate([qpos_p, qpos_m, qpos_b, qpos_b, qpos_b, qpos_b])
    QV = jnp.concatenate(
        [qvel_b, qvel_b, qvel_b + eps * e_v, qvel_b - eps * e_v, qvel_b, qvel_b]
    )
    CT = jnp.concatenate(
        [ctrl_b, ctrl_b, ctrl_b, ctrl_b, ctrl_b + eps * e_u, ctrl_b - eps * e_u]
    )
    if warm_b is None:
        out_qp, out_qv = jax.vmap(
            lambda a, b, c: step_state(model, a, b, c)
        )(QP, QV, CT)
    else:
        WS = jnp.concatenate([warm_b] * 6)
        out_qp, out_qv = jax.vmap(
            lambda a, b, c, w: step_state(model, a, b, c, w)
        )(QP, QV, CT, WS)
    out_qp = out_qp.reshape(6, njobs, -1)
    out_qv = out_qv.reshape(6, njobs, -1)

    tang = jax.vmap(
        lambda qpa, qva, qpb, qvb: _tangent_out(
            model, sv, qpa, qva, qpb, qvb, 2 * eps
        )
    )
    colA_pos = tang(out_qp[1], out_qv[1], out_qp[0], out_qv[0])
    colA_vel = tang(out_qp[3], out_qv[3], out_qp[2], out_qv[2])
    colB = tang(out_qp[5], out_qv[5], out_qp[4], out_qv[4])
    return colA_pos, colA_vel, colB


def _batched_ad_columns(model, sv, qpos_b, qvel_b, ctrl_b, d_b, eps,
                        warm_b=None):
    """Exact JVP columns, one jvp'd step graph for the whole (3*njobs) batch.

    Output tangent coordinates are about each job's nominal next state
    (matches FD semantics; see ad_job_columns).  warm_b is held constant
    under the JVP (the reference likewise copies one qacc_warmstart into
    every FD replica rather than re-deriving it per perturbation)."""
    nv, nu = model.nv, model.nu
    njobs = qpos_b.shape[0]
    dtype = qpos_b.dtype
    dof_idx = jnp.array(sv.order)[d_b]
    e_v = (jnp.arange(nv)[None, :] == dof_idx[:, None]).astype(dtype)
    if nu > 0:
        cidx = jnp.clip(d_b, 0, nu - 1)
        e_u = (jnp.arange(nu)[None, :] == cidx[:, None]).astype(dtype)
    else:
        e_u = jnp.zeros((njobs, 0), dtype=dtype)
    zv = jnp.zeros_like(e_v)
    zu = jnp.zeros_like(e_u)
    if warm_b is None:
        warm_b = jnp.zeros((njobs, 0), dtype=dtype)  # sentinel: cold start

    def nom_step(a, b, c, w):
        return step_state(model, a, b, c, w if w.shape[-1] else None)

    qp_nom, qv_nom = jax.vmap(nom_step)(qpos_b, qvel_b, ctrl_b, warm_b)

    def one_dir(qpos, qvel, ctrl, warm, qpn, qvn, dp, dv, du):
        def f(dpos, dvel, dctrl):
            qp, qv = step_state(
                model,
                integrate_pos(model, qpos, dpos, 1.0),
                qvel + dvel,
                ctrl + dctrl,
                warm if warm.shape[-1] else None,
            )
            return _tangent_out(model, sv, qpn, qvn, qp, qv, 1.0)

        z = (jnp.zeros((nv,), dtype), jnp.zeros((nv,), dtype),
             jnp.zeros((nu,), dtype))
        _, tangent = jax.jvp(f, z, (dp, dv, du))
        return tangent

    # directions stacked: [pos, vel, ctrl] per job
    rep = lambda x: jnp.concatenate([x, x, x])
    DP = jnp.concatenate([e_v, zv, zv])
    DV = jnp.concatenate([zv, e_v, zv])
    DU = jnp.concatenate([zu, zu, e_u])
    cols = jax.vmap(one_dir)(
        rep(qpos_b), rep(qvel_b), rep(ctrl_b), rep(warm_b),
        rep(qp_nom), rep(qv_nom),
        DP, DV, DU,
    ).reshape(3, njobs, -1)
    return cols[0], cols[1], cols[2]


def _time_ad_jacobian(model, sv, qpos, qvel, ctrl, warm=None):
    """Full A/B column block at ONE timestep via a single jacfwd.

    One primal step evaluation shared across all 2*ndof+nu tangent
    directions (jax.jacfwd CSEs the primal subgraph), versus the per-job
    path which re-evaluates the primal for every (dof, direction) lane.
    ~2-4x cheaper whenever most dofs share keypoint times (always true for
    set_interval) — the dominant phase cost in the acrobot baseline.

    Returns J: (2*ndof, 2*ndof + nu) = [dA_pos | dA_vel | dB].
    """
    nv, nu = model.nv, model.nu
    n = sv.ndof
    idx = jnp.array(sv.order)
    dtype = qpos.dtype
    qp_nom, qv_nom = step_state(model, qpos, qvel, ctrl, warm)

    def g(z):
        dpos = jnp.zeros((nv,), dtype).at[idx].set(z[:n])
        dvel = jnp.zeros((nv,), dtype).at[idx].set(z[n : 2 * n])
        du = z[2 * n :]
        qp, qv = step_state(
            model,
            integrate_pos(model, qpos, dpos, 1.0),
            qvel + dvel,
            ctrl + du,
            warm,
        )
        return _tangent_out(model, sv, qp_nom, qv_nom, qp, qv, 1.0)

    return jax.jacfwd(g)(jnp.zeros((2 * n + nu,), dtype))


def time_keypoint_jacobians(
    model: Model,
    sv: StateVector,
    qpos_traj: jnp.ndarray,
    qvel_traj: jnp.ndarray,
    ctrl_traj: jnp.ndarray,
    mask: jnp.ndarray,        # (H, ndof) keypoint mask
    time_budget: int,
    chunk_size: int = None,
    warm_traj: jnp.ndarray = None,  # (H, nv) rollout warmstart deltas
    shard_axis: str = None,   # mesh axis name to split keypoint times over
    num_shards: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """AD Jacobians batched over keypoint TIMES (one jacfwd per time).

    Column masking happens on scatter, so per-dof keypoint semantics are
    preserved exactly; compute is per-time rather than per-(time, dof).

    When `shard_axis` is set (the caller runs under a shard_map / manual
    mesh that exposes that axis name), the keypoint-time batch is split
    into `num_shards` slices — each device computes its slice's Jacobians
    and one psum over ICI assembles the full A/B tables.  This is the
    job-axis parallelism of SURVEY §2.3 (the reference's FD thread pool,
    `Optimiser.cpp:258-323`) as a collective.
    """
    n = sv.ndof
    H = qpos_traj.shape[0]
    dtype = qpos_traj.dtype
    any_t = jnp.any(mask, axis=1)
    time_budget = min(time_budget, H)  # at most H distinct keypoint times
    if shard_axis is not None and num_shards > 1:
        per = -(-time_budget // num_shards)
        # argsort yields at most H indices; pad with (t=0, valid=False)
        # sentinels up to per*num_shards so every shard's dynamic_slice is
        # disjoint — an unpadded short array clamps the last shard's start
        # index, overlapping slices and double-counting times in the psum
        full = jnp.argsort(~any_t, stable=True)[: per * num_shards]
        fullv = any_t[full]
        pad0 = per * num_shards - full.shape[0]
        if pad0 > 0:
            full = jnp.concatenate([full, jnp.zeros((pad0,), full.dtype)])
            fullv = jnp.concatenate([fullv, jnp.zeros((pad0,), bool)])
        me = jax.lax.axis_index(shard_axis)
        order = jax.lax.dynamic_slice_in_dim(full, me * per, per)
        tvalid = jax.lax.dynamic_slice_in_dim(fullv, me * per, per)
        time_budget = per
    else:
        order = jnp.argsort(~any_t, stable=True)[:time_budget]
        tvalid = any_t[order]

    if chunk_size is None:
        # each lane carries 2n+nu tangents of step intermediates
        chunk_size = max(
            8, default_chunk_size(model) // max(2 * n + model.nu, 1)
        )
    chunk = min(chunk_size, time_budget)
    n_chunks = -(-time_budget // chunk)
    pad = n_chunks * chunk - time_budget
    ts = jnp.concatenate([order, jnp.zeros((pad,), order.dtype)])
    vs = jnp.concatenate([tvalid, jnp.zeros((pad,), bool)])
    ts = ts.reshape(n_chunks, chunk)
    vs = vs.reshape(n_chunks, chunk)

    col_mask = jnp.concatenate(
        [mask.astype(dtype)] * 2
        + [mask[:, : model.nu].astype(dtype)]
        if model.nu > 0
        else [mask.astype(dtype)] * 2,
        axis=1,
    )  # (H, 2n + nu): per-column keypoint validity

    def chunk_body(carry, inp):
        A_kp, B_kp, touched = carry
        ct, cv = inp
        if warm_traj is None:
            J = jax.vmap(
                lambda qp, qv_, u: _time_ad_jacobian(model, sv, qp, qv_, u)
            )(qpos_traj[ct], qvel_traj[ct], ctrl_traj[ct])  # (C, 2n, 2n+nu)
        else:
            J = jax.vmap(
                lambda qp, qv_, u, w: _time_ad_jacobian(
                    model, sv, qp, qv_, u, w
                )
            )(qpos_traj[ct], qvel_traj[ct], ctrl_traj[ct], warm_traj[ct])
        m = col_mask[ct] * cv.astype(dtype)[:, None]     # (C, 2n+nu)
        J = J * m[:, None, :]
        A_kp = A_kp.at[ct].add(J[:, :, : 2 * n])
        if model.nu > 0:
            B_kp = B_kp.at[ct].add(J[:, :, 2 * n :])
        touched = touched.at[ct].max(
            mask[ct].astype(dtype) * cv.astype(dtype)[:, None]
        )
        return (A_kp, B_kp, touched), None

    init = (
        jnp.zeros((H, 2 * n, 2 * n), dtype=dtype),
        jnp.zeros((H, 2 * n, model.nu), dtype=dtype),
        jnp.zeros((H, n), dtype=dtype),
    )
    if n_chunks == 1:
        (A_kp, B_kp, touched), _ = chunk_body(init, (ts[0], vs[0]))
    else:
        (A_kp, B_kp, touched), _ = jax.lax.scan(chunk_body, init, (ts, vs))
    if shard_axis is not None and num_shards > 1:
        # disjoint scatters per shard -> psum is exact assembly
        A_kp = jax.lax.psum(A_kp, shard_axis)
        B_kp = jax.lax.psum(B_kp, shard_axis)
        touched = jax.lax.pmax(touched, shard_axis)
    return A_kp, B_kp, touched


def default_chunk_size(model: Model) -> int:
    """Jobs per derivative chunk, sized to the model's per-job footprint.

    Each job expands to 6 stepper configurations whose FK/CRBA intermediates
    scale with nbody*nv and nv^2; a fixed chunk that is right for a 2-dof
    acrobot OOMs HBM on a 115-dof soft-body scene.  Budget ~1.5 GB of f32
    intermediates per chunk (v5e has 16 GB; the A/B output tables and XLA
    fusion slack take the rest).
    """
    per_job_floats = 6 * (
        8 * model.nbody * model.nv + 2 * model.nv * model.nv
        + 32 * max(len(model.contact_pairs), 1)
    )
    target_floats = 384_000_000  # 1.5 GB at f32
    return int(max(64, min(4096, target_floats // max(per_job_floats, 1))))


def keypoint_jacobians(
    model: Model,
    sv: StateVector,
    qpos_traj: jnp.ndarray,   # (H, nq)
    qvel_traj: jnp.ndarray,   # (H, nv)
    ctrl_traj: jnp.ndarray,   # (H, nu)
    jobs: DerivJobs,
    eps: float = 1e-6,
    mode: str = "fd",
    chunk_size: int = None,
    warm_traj: jnp.ndarray = None,  # (H, nv) rollout warmstart deltas
    shard_axis: str = None,   # mesh axis name to split the job batch over
    num_shards: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compute A/B columns at all keypoint jobs in one batched launch.

    Jobs stream through the device in chunks of `chunk_size` (a lax.scan
    accumulating into the A/B tables) so memory stays bounded at long
    horizons — full-FD push_mcl-class problems have 10k+ jobs whose
    unchunked intermediates would exceed HBM.  Default chunk size adapts to
    the model's per-job memory footprint (default_chunk_size).

    Returns:
      A_kp: (H, 2n, 2n) with computed columns scattered in (others zero)
      B_kp: (H, 2n, nu)
      touched: (H, ndof) 1.0 where columns for (t, d) were computed
    """
    n = sv.ndof
    H = qpos_traj.shape[0]
    dtype = qpos_traj.dtype
    col_fn = _batched_fd_columns if mode == "fd" else _batched_ad_columns

    budget = jobs.budget
    if shard_axis is not None and num_shards > 1:
        # split the flat job batch across the mesh "job" axis (the FD
        # thread pool of Optimiser.cpp:258-323 as a collective); each shard
        # scatters into zeroed tables, combined by one psum below
        per = -(-budget // num_shards)
        pad0 = per * num_shards - budget
        me = jax.lax.axis_index(shard_axis)
        jt_f = jnp.concatenate([jobs.t, jnp.zeros((pad0,), jobs.t.dtype)])
        jd_f = jnp.concatenate([jobs.d, jnp.zeros((pad0,), jobs.d.dtype)])
        jv_f = jnp.concatenate([jobs.valid, jnp.zeros((pad0,), bool)])
        jobs = DerivJobs(
            t=jax.lax.dynamic_slice_in_dim(jt_f, me * per, per),
            d=jax.lax.dynamic_slice_in_dim(jd_f, me * per, per),
            valid=jax.lax.dynamic_slice_in_dim(jv_f, me * per, per),
        )
        budget = per
    if chunk_size is None:
        chunk_size = default_chunk_size(model)
    chunk = min(chunk_size, budget)
    n_chunks = -(-budget // chunk)
    pad = n_chunks * chunk - budget
    jt = jnp.concatenate([jobs.t, jnp.zeros((pad,), jobs.t.dtype)])
    jd = jnp.concatenate([jobs.d, jnp.zeros((pad,), jobs.d.dtype)])
    jv = jnp.concatenate([jobs.valid, jnp.zeros((pad,), bool)])
    jt = jt.reshape(n_chunks, chunk)
    jd = jd.reshape(n_chunks, chunk)
    jv = jv.reshape(n_chunks, chunk)

    def chunk_body(carry, inp):
        A_kp, B_kp, touched = carry
        ct, cd, cv = inp
        colA_pos, colA_vel, colB = col_fn(
            model, sv, qpos_traj[ct], qvel_traj[ct], ctrl_traj[ct], cd, eps,
            warm_b=None if warm_traj is None else warm_traj[ct],
        )
        vmask = cv.astype(dtype)[:, None]
        A_kp = A_kp.at[ct, :, cd].add(colA_pos * vmask)
        A_kp = A_kp.at[ct, :, n + cd].add(colA_vel * vmask)
        if model.nu > 0:
            bvalid = cv & (cd < model.nu)
            B_kp = B_kp.at[ct, :, jnp.clip(cd, 0, model.nu - 1)].add(
                colB * bvalid.astype(dtype)[:, None]
            )
        touched = touched.at[ct, cd].max(cv.astype(dtype))
        return (A_kp, B_kp, touched), None

    init = (
        jnp.zeros((H, 2 * n, 2 * n), dtype=dtype),
        jnp.zeros((H, 2 * n, model.nu), dtype=dtype),
        jnp.zeros((H, n), dtype=dtype),
    )
    if n_chunks == 1:
        (A_kp, B_kp, touched), _ = chunk_body(init, (jt[0], jd[0], jv[0]))
    else:
        (A_kp, B_kp, touched), _ = jax.lax.scan(
            chunk_body, init, (jt, jd, jv)
        )
    if shard_axis is not None and num_shards > 1:
        # disjoint scatters per shard -> psum is exact assembly
        A_kp = jax.lax.psum(A_kp, shard_axis)
        B_kp = jax.lax.psum(B_kp, shard_axis)
        touched = jax.lax.pmax(touched, shard_axis)
    return A_kp, B_kp, touched
