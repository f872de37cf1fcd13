"""iLQR with keypoint derivatives: the optimisation core.

TPU-native re-design of the reference iLQR
(`/root/reference/src/Optimiser/iLQR.cpp`) with reproduced semantics:

  - rollout & cost          (`iLQR.cpp:202-267`, consistent c(x_t,u_t) form)
  - Riccati backward pass with Q_uu + lambda*I regularisation, V_xx
    symmetrisation, delta_J accumulation          (`iLQR.cpp:535-634`)
  - lambda schedule x/÷10 in [1e-4, 10], PD-failure escalation and
    lambda-exit                                   (`iLQR.cpp:636-657`)
  - batched line search over alphas (i/6)^2, i=1..6, clamped controls,
    quaternion-aware state feedback               (`iLQR.cpp:466-470,824-934`)
  - convergence (old-new)/new < 0.02              (`Optimiser.cpp:30-37`)
  - keypoint-driven derivative pipeline           (`Optimiser.cpp:80-169`)

TPU mapping: the 6 std::async line-search threads become one vmap axis; the
FD thread pool becomes the flat job batch of derivs/fd.py; the per-thread
mjData replicas vanish (pure functions).  Rollout and Riccati recursions are
lax.scans (BP is <5% of runtime in the reference baselines, SURVEY §6).

Divergences (deliberate):
  - PD check on every step via Cholesky-NaN detection instead of every 100th
    step (`iLQR.cpp:540-594`) — stricter, no timing cost on TPU.
  - initial-rollout cost uses the same c(x_t, u_t) convention as the line
    search (the reference costs post-step states in its initial rollout only).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..derivs.fd import jobs_from_mask, keypoint_jacobians
from ..dynamics.model import Data
from ..dynamics.step import advance, forward
from ..keypoints.filtering import filter_dynamics
from ..keypoints.interpolate import interpolate_derivatives
from ..keypoints.methods import (auto_adjust_mask, generate_keypoints,
                                 percentage_derivs)
from ..state.statevector import to_tangent
from ..tasks.base import (Task, control_limits, cost_derivatives_gn,
                          residual_derivatives, residuals_at)


@struct.dataclass
class ILQRConfig:
    max_iterations: int = struct.field(pytree_node=False, default=10)
    min_iterations: int = struct.field(pytree_node=False, default=5)
    num_parallel_rollouts: int = struct.field(pytree_node=False, default=6)
    deriv_mode: str = struct.field(pytree_node=False, default="fd")
    fd_eps: float = struct.field(pytree_node=False, default=1e-6)
    lambda_init: float = struct.field(pytree_node=False, default=0.1)
    lambda_factor: float = struct.field(pytree_node=False, default=10.0)
    min_lambda: float = struct.field(pytree_node=False, default=1e-4)
    max_lambda: float = struct.field(pytree_node=False, default=10.0)
    eps_converge: float = struct.field(pytree_node=False, default=0.02)
    deriv_budget: Optional[int] = struct.field(pytree_node=False, default=None)
    # jobs per derivative chunk (None = adapt to model size); lower this when
    # vmapping many solves so per-chunk intermediates fit HBM — TPU tiling
    # pads the (nbody, 6, 6) FK tensors ~28x, so memory bites early
    deriv_chunk: Optional[int] = struct.field(pytree_node=False, default=None)
    filtering: str = struct.field(pytree_node=False, default="none")
    # carry the constraint-solver warmstart through rollout/line-search scans
    # (MuJoCo qacc_warmstart semantics).  OFF by default: warmstarting makes
    # the step a function of the trajectory PREFIX, not just (x_t, u_t) —
    # on contact-rich tasks that history dependence breaks the Markov
    # assumption the iLQR linear model relies on and stalls the line search
    # (push_ncl cost reduction 0.91 cold vs 0.21 warm).  The FD/AD engines
    # honour it for parity experiments when enabled.
    warmstart_rollouts: bool = struct.field(pytree_node=False, default=False)
    # costDerivsFD (general-config flag, `Optimiser.cpp:197-215` +
    # `KeyPointGenerator.cpp:840-954`): compute residual Jacobians r_x/r_u
    # only at keypoint TIMES and linearly interpolate between them, instead
    # of exactly at every step.  Residual values r still come from the
    # rollout at every step, matching the reference's stored residuals[t].
    cost_derivs_fd: bool = struct.field(pytree_node=False, default=False)
    # lane-solver adaptive keypoints: static budget of keypoint TIMES per
    # lane (the union over dofs of the per-dof keypoint schedule; jacfwd
    # evaluates all tangent columns at each selected time).  None = worst
    # case 2*(H//min_N)+2 capped at H; overflow beyond the budget drops the
    # LATEST middle keypoints deterministically (endpoints protected) and is
    # reported in LaneBatchResult.kp_overflow.
    lane_kp_budget: Optional[int] = struct.field(
        pytree_node=False, default=None
    )
    # lane-solver latency knobs for SMALL batches (MPC at B=1): partially
    # unroll the time scans (rollout / line search) and the inner Newton
    # scan so XLA fuses across iterations — at B=1 every register op is a
    # scalar kernel and per-launch overhead dominates (walker H=20 replan:
    # 83 ms at unroll 1).  Keep 1 for big-batch throughput programs (the
    # unrolled graph multiplies compile time, which is already the arm-scale
    # bottleneck).
    lane_scan_unroll: int = struct.field(pytree_node=False, default=1)
    lane_newton_unroll: int = struct.field(pytree_node=False, default=1)
    # lane step style for the rollout/line-search phases: None = auto
    # (register form — best THROUGHPUT at batch scale; the MPC executor
    # overrides to stacked for B=1 latency).  The jacobian phase always
    # uses the stacked step (smallest graph + implicit-AD tangents).
    lane_step_stacked: Optional[bool] = struct.field(
        pytree_node=False, default=None
    )


class Trajectory(NamedTuple):
    """Nominal trajectory storage (replaces the mjData snapshot list,
    `include/MuJoCoHelper.h:118-123`).

    `warm` stores the constraint-solver warmstart delta the rollout used at
    each step (the qacc_warmstart analogue the reference copies per FD
    replica, `MuJoCoHelper.cpp:732-741`) so the derivative engine can
    differentiate exactly the function the rollout integrated."""

    qpos: jnp.ndarray   # (H+1, nq)
    qvel: jnp.ndarray   # (H+1, nv)
    ctrl: jnp.ndarray   # (H, nu)
    costs: jnp.ndarray  # (H,)
    warm: jnp.ndarray = None  # (H, nv) solver warmstart input per step

    @property
    def total_cost(self):
        return jnp.sum(self.costs)


def default_alphas(n: int, dtype=jnp.float64) -> jnp.ndarray:
    """(i/n)^2 for i = 1..n (`iLQR.cpp:466-470`)."""
    i = jnp.arange(1, n + 1, dtype=dtype)
    return (i / n) ** 2


# ---------------------------------------------------------------------------
# rollout
# ---------------------------------------------------------------------------


def _step_costs(task: Task, r_all: jnp.ndarray) -> jnp.ndarray:
    """(H, nres) residuals -> (H,) costs, terminal weights at t = H-1."""
    H = r_all.shape[0]
    w = jnp.where(
        (jnp.arange(H) == H - 1)[:, None],
        task.weights_terminal[None, :],
        task.weights[None, :],
    )
    return jnp.sum(w * r_all * r_all, axis=1)


def rollout(task: Task, qpos0, qvel0, U: jnp.ndarray,
            warmstart: bool = False) -> Trajectory:
    """Roll out controls from an initial state (RolloutTrajectory analogue).

    warmstart=True carries the constraint-solver warmstart delta (MuJoCo
    qacc_warmstart semantics) through the scan; see
    ILQRConfig.warmstart_rollouts for why the default is a cold start.
    """
    model = task.model

    def body(carry, u):
        qpos, qvel, warm = carry
        data = Data(qpos=qpos, qvel=qvel, ctrl=u,
                    time=jnp.zeros((), qpos.dtype), warmstart=warm)
        data = forward(model, data)
        r = task.residual_fn(model, data, task.residual_targets)
        warm_out = data.warmstart if data.warmstart is not None else warm
        data = advance(model, data)
        return (data.qpos, data.qvel, warm_out), (qpos, qvel, r, warm)

    if warmstart:
        warm0 = jnp.zeros((model.nv,), qpos0.dtype)
        (qpN, qvN, _), (qps, qvs, r_all, warms) = jax.lax.scan(
            body, (qpos0, qvel0, warm0), U
        )
    else:
        def body_cold(carry, u):
            (qp, qv, w), out = body((*carry, None), u)
            return (qp, qv), out[:3]

        (qpN, qvN), (qps, qvs, r_all) = jax.lax.scan(
            body_cold, (qpos0, qvel0), U
        )
        warms = None
    qpos_traj = jnp.concatenate([qps, qpN[None]], axis=0)
    qvel_traj = jnp.concatenate([qvs, qvN[None]], axis=0)
    return Trajectory(
        qpos_traj, qvel_traj, U, _step_costs(task, r_all), warms
    )


# ---------------------------------------------------------------------------
# derivatives (GenerateDerivatives analogue, Optimiser.cpp:80-169)
# ---------------------------------------------------------------------------


def _interp_residual_jacobians(task: Task, traj: Trajectory, mask, budget):
    """costDerivsFD mode: r_x/r_u at keypoint times, lerped in between
    (`Optimiser.cpp:197-215`; interpolation per `KeyPointGenerator.cpp:840-954`
    applied time-wise to the residual Jacobians)."""
    H = traj.ctrl.shape[0]
    sv = task.sv
    dtype = traj.qpos.dtype
    idx = jnp.arange(H)
    any_t = jnp.any(mask, axis=1).at[0].set(True).at[H - 1].set(True)
    time_budget = min(H, max(2, -(-budget // max(sv.ndof, 1))))
    # the budget is a per-dof bound but any_t is the UNION of per-dof
    # keypoint times, which adaptive methods can push past it.  Select the
    # endpoints FIRST (they anchor the interpolation and carry the terminal
    # cost gradient), then keypoint times in order; overflow times are
    # dropped from the table and interpolated over — prev/nxt below index
    # only times actually computed, never zero-filled slots.
    forced = (idx == 0) | (idx == H - 1)
    key = jnp.where(forced, 0, jnp.where(any_t, 1, 2))
    order = jnp.argsort(key, stable=True)[:time_budget]
    tvalid = any_t[order]

    r_kp, rx_kp, ru_kp = jax.vmap(
        lambda t: residual_derivatives(
            task, traj.qpos[t], traj.qvel[t], traj.ctrl[t]
        )
    )(order)
    nres = r_kp.shape[1]
    rx_tab = jnp.zeros((H,) + rx_kp.shape[1:], dtype).at[order].add(
        rx_kp * tvalid[:, None, None]
    )
    ru_tab = jnp.zeros((H,) + ru_kp.shape[1:], dtype).at[order].add(
        ru_kp * tvalid[:, None, None]
    )
    # residual VALUES at every step come from a cheap vmapped FK pass (the
    # reference stores residuals[t] from the rollout)
    r_all = jax.vmap(
        lambda qp, qv, u: residuals_at(task, qp, qv, u)
    )(traj.qpos[:H], traj.qvel[:H], traj.ctrl)

    # interpolate between times PRESENT in the table (order ∩ valid), not
    # all keypoint times — overflow times have no rx/ru entries
    present = jnp.zeros((H,), bool).at[order].set(tvalid)
    prev = jax.lax.associative_scan(
        jnp.maximum, jnp.where(present, idx, -1)
    )
    nxt = H - 1 - jax.lax.associative_scan(
        jnp.maximum, jnp.where(present, H - 1 - idx, -1)[::-1]
    )[::-1]
    span = jnp.maximum(nxt - prev, 1)
    w = ((idx - prev) / span).astype(dtype)
    r_x = rx_tab[prev] * (1 - w)[:, None, None] + rx_tab[nxt] * w[:, None, None]
    r_u = ru_tab[prev] * (1 - w)[:, None, None] + ru_tab[nxt] * w[:, None, None]
    return r_all, r_x, r_u


def compute_derivatives(task: Task, traj: Trajectory, mask, budget: int,
                        mode: str = "fd", fd_eps: float = 1e-6,
                        filtering: str = "none", chunk_size=None,
                        cost_derivs_fd: bool = False,
                        shard_axis: str = None, num_shards: int = 1):
    """Keypoint A/B + interpolation + cost expansion along the trajectory.

    Returns (A, B, l_x, l_xx, l_u, l_uu, pct_derivs): A/B are (H, 2n, 2n) /
    (H, 2n, nu); cost terms are per-step arrays over t = 0..H-1.

    shard_axis/num_shards: split the derivative job batch over a mesh axis
    (must be called under shard_map exposing that axis) — SURVEY §2.3's
    FD-column parallelism as ICI collectives.
    """
    model, sv = task.model, task.sv
    H = traj.ctrl.shape[0]
    if mode == "ad_time":
        # time-grouped exact Jacobians: one jacfwd per keypoint time (shared
        # primal across all columns) — fastest when dofs share keypoint
        # times, e.g. every set_interval schedule
        from ..derivs.fd import time_keypoint_jacobians

        # static slot budget = worst-case size of the UNION of per-dof
        # keypoint times.  set_interval schedules are shared across dofs
        # (union == per-dof count = budget/ndof); adaptive methods place
        # keypoints at DIFFERENT times per dof, so the union can reach the
        # full job budget (capped at H).  Undersizing this silently zeroes
        # the Jacobian columns of dropped late keypoints — interpolation
        # then propagates zeros and the optimiser stalls.
        if task.keypoint_cfg is not None \
                and task.keypoint_cfg.name == "set_interval":
            time_budget = -(-budget // max(sv.ndof, 1))
        else:
            time_budget = min(H, budget)
        A_kp, B_kp, _ = time_keypoint_jacobians(
            model, sv, traj.qpos[:H], traj.qvel[:H], traj.ctrl, mask,
            time_budget=time_budget,
            chunk_size=chunk_size, warm_traj=traj.warm,
            shard_axis=shard_axis, num_shards=num_shards,
        )
    else:
        jobs = jobs_from_mask(mask, budget)
        A_kp, B_kp, _ = keypoint_jacobians(
            model, sv, traj.qpos[:H], traj.qvel[:H], traj.ctrl, jobs,
            eps=fd_eps, mode=mode, chunk_size=chunk_size,
            warm_traj=traj.warm,
            shard_axis=shard_axis, num_shards=num_shards,
        )
    A, B = interpolate_derivatives(A_kp, B_kp, mask, model.nu)
    A = filter_dynamics(A, filtering)

    if cost_derivs_fd:
        r, r_x, r_u = _interp_residual_jacobians(task, traj, mask, budget)
    else:
        r, r_x, r_u = jax.vmap(
            lambda qp, qv, u: residual_derivatives(task, qp, qv, u)
        )(traj.qpos[:H], traj.qvel[:H], traj.ctrl)
    terminal = jnp.arange(H) == H - 1
    l_x, l_xx, l_u, l_uu = jax.vmap(
        lambda rr, rx, ru, tm_: cost_derivatives_gn(task, rr, rx, ru, tm_)
    )(r, r_x, r_u, terminal)
    return A, B, l_x, l_xx, l_u, l_uu, percentage_derivs(mask)


def _derivs_from_columns(task: Task, traj: Trajectory, mask,
                         A_kp, B_kp, filtering: str = "none"):
    """Like compute_derivatives but with FD columns already cached
    (the iterative_error path reuses its bisection FD evaluations,
    mirroring the reference's computed_keypoints cache)."""
    model = task.model
    H = traj.ctrl.shape[0]
    A, B = interpolate_derivatives(A_kp, B_kp, mask, model.nu)
    A = filter_dynamics(A, filtering)
    r, r_x, r_u = jax.vmap(
        lambda qp, qv, u: residual_derivatives(task, qp, qv, u)
    )(traj.qpos[:H], traj.qvel[:H], traj.ctrl)
    terminal = jnp.arange(H) == H - 1
    l_x, l_xx, l_u, l_uu = jax.vmap(
        lambda rr, rx, ru, tm_: cost_derivatives_gn(task, rr, rx, ru, tm_)
    )(r, r_x, r_u, terminal)
    return A, B, l_x, l_xx, l_u, l_uu, percentage_derivs(mask)


# ---------------------------------------------------------------------------
# backward pass (iLQR.cpp:535-634) + lambda loop (:636-657)
# ---------------------------------------------------------------------------


def backward_pass(A, B, l_x, l_xx, l_u, l_uu, lamb):
    """One Riccati sweep at fixed lambda.

    Returns (k (H, nu), K (H, nu, 2n), delta_J, valid).  Mirrors the
    reference loop t = H-1..0 with V initialised from the terminal expansion.
    """
    H, nx = l_x.shape
    nu = l_u.shape[1]
    eye_u = jnp.eye(nu, dtype=l_x.dtype)

    def bp_step(carry, inp):
        V_x, V_xx = carry
        A_t, B_t, lx_t, lxx_t, lu_t, luu_t = inp
        # one stacked [A|B] expansion: 2 GEMMs give all three Q blocks
        AB = jnp.concatenate([A_t, B_t], axis=1)      # (2n, 2n+nu)
        g = AB.T @ V_x                                # (2n+nu,)
        G = AB.T @ (V_xx @ AB)                        # (2n+nu, 2n+nu)
        Q_x = lx_t + g[:nx]
        Q_u = lu_t + g[nx:]
        Q_xx = lxx_t + G[:nx, :nx]
        Q_uu = luu_t + G[nx:, nx:]
        Q_ux = G[nx:, :nx]
        from ..utils.linalg import chol_solve_unrolled, chol_unrolled

        L = chol_unrolled(Q_uu + lamb * eye_u)
        k_t = -chol_solve_unrolled(L, Q_u)
        K_t = -chol_solve_unrolled(L, Q_ux)
        V_x_n = Q_x + K_t.T @ (Q_uu @ k_t) + K_t.T @ Q_u + Q_ux.T @ k_t
        V_xx_n = Q_xx + K_t.T @ (Q_uu @ K_t) + K_t.T @ Q_ux + Q_ux.T @ K_t
        V_xx_n = 0.5 * (V_xx_n + V_xx_n.T)
        dJ_t = k_t @ Q_u + k_t @ (Q_uu @ k_t)
        return (V_x_n, V_xx_n), (k_t, K_t, dJ_t)

    init = (l_x[H - 1], l_xx[H - 1])
    _, (k, K, dJ) = jax.lax.scan(
        bp_step, init, (A, B, l_x, l_xx, l_u, l_uu), reverse=True
    )
    valid = jnp.all(jnp.isfinite(k)) & jnp.all(jnp.isfinite(K))
    return k, K, jnp.sum(dJ), valid


def backward_pass_lambda_loop(A, B, l_x, l_xx, l_u, l_uu, lamb, cfg: ILQRConfig):
    """while(!valid): BP; UpdateLambda — the reference's retry loop
    (`iLQR.cpp:430-452,636-657`).  Returns (k, K, dJ, new_lambda, lambda_exit).
    """

    def update_lambda(lamb, valid):
        lamb = jnp.where(valid, lamb / cfg.lambda_factor, lamb * cfg.lambda_factor)
        exit_ = lamb > cfg.max_lambda
        lamb = jnp.clip(lamb, cfg.min_lambda, cfg.max_lambda)
        return lamb, exit_

    k0, K0, dJ0, valid0 = backward_pass(A, B, l_x, l_xx, l_u, l_uu, lamb)
    lamb1, exit0 = update_lambda(lamb, valid0)

    def cond(state):
        _, _, _, _, valid, exit_, _ = state
        return jnp.logical_not(valid) & jnp.logical_not(exit_)

    def body(state):
        _, _, _, lamb, _, _, it = state
        k, K, dJ, valid = backward_pass(A, B, l_x, l_xx, l_u, l_uu, lamb)
        lamb_n, exit_ = update_lambda(lamb, valid)
        return (k, K, dJ, lamb_n, valid, exit_, it + 1)

    state = (k0, K0, dJ0, lamb1, valid0, exit0, jnp.zeros((), jnp.int32))
    k, K, dJ, lamb_f, valid, exit_, _ = jax.lax.while_loop(cond, body, state)
    return k, K, dJ, lamb_f, exit_ & jnp.logical_not(valid)


# ---------------------------------------------------------------------------
# forward pass: batched line search (iLQR.cpp:824-934)
# ---------------------------------------------------------------------------


def forward_pass(task: Task, traj: Trajectory, k, K, alphas, old_cost,
                 warmstart: bool = False):
    """vmap line-search rollouts over alphas; pick argmin; accept if < old.

    Returns (new_traj, new_cost, accepted, best_alpha).
    """
    model, sv = task.model, task.sv
    H = traj.ctrl.shape[0]
    limits = control_limits(task)

    def one_alpha(alpha):
        def body(carry, t):
            qpos, qvel, warm = carry
            dx = to_tangent(
                model, sv, qpos, qvel, traj.qpos[t], traj.qvel[t]
            )
            u = traj.ctrl[t] + alpha * k[t] + K[t] @ dx
            u = jnp.clip(u, limits[:, 0], limits[:, 1])
            data = Data(qpos=qpos, qvel=qvel, ctrl=u,
                        time=jnp.zeros((), qpos.dtype), warmstart=warm)
            data = forward(model, data)
            r = task.residual_fn(model, data, task.residual_targets)
            warm_out = data.warmstart if data.warmstart is not None else warm
            data = advance(model, data)
            return (data.qpos, data.qvel, warm_out), (qpos, qvel, u, r, warm)

        if warmstart:
            warm0 = jnp.zeros((model.nv,), traj.qpos.dtype)
            (qpN, qvN, _), (qps, qvs, us, r_all, warms) = jax.lax.scan(
                body, (traj.qpos[0], traj.qvel[0], warm0), jnp.arange(H)
            )
        else:
            def body_cold(carry, t):
                (qp, qv, w), out = body((*carry, None), t)
                return (qp, qv), out[:4]

            (qpN, qvN), (qps, qvs, us, r_all) = jax.lax.scan(
                body_cold, (traj.qpos[0], traj.qvel[0]), jnp.arange(H)
            )
            warms = None
        costs = _step_costs(task, r_all)
        new_traj = Trajectory(
            jnp.concatenate([qps, qpN[None]], axis=0),
            jnp.concatenate([qvs, qvN[None]], axis=0),
            us,
            costs,
            warms,
        )
        return jnp.sum(costs), new_traj

    costs, trajs = jax.vmap(one_alpha)(alphas)
    best = jnp.argmin(costs)
    accepted = costs[best] < old_cost
    best_traj = jax.tree.map(lambda x: x[best], trajs)
    new_traj = jax.tree.map(
        lambda new, old: jnp.where(
            jnp.reshape(accepted, (1,) * new.ndim), new, old
        ),
        best_traj,
        traj,
    )
    new_cost = jnp.where(accepted, costs[best], old_cost)
    return new_traj, new_cost, accepted, alphas[best]


# ---------------------------------------------------------------------------
# full optimisation
# ---------------------------------------------------------------------------


@struct.dataclass
class ILQRStats:
    """Per-optimisation metrics mirroring the reference banner taxonomy
    (`iLQR.cpp:950-980`): cost history, %derivs, phase times."""

    initial_cost: float = 0.0
    final_cost: float = 0.0
    cost_reduction: float = 0.0
    num_iterations: int = 0
    cost_history: tuple = ()
    percent_derivs: tuple = ()
    best_alphas: tuple = ()
    lambdas: tuple = ()
    time_derivs_ms: tuple = ()
    time_bp_ms: tuple = ()
    time_fp_ms: tuple = ()
    opt_time_ms: float = 0.0


def _deriv_budget(cfg_kp, H: int, ndof: int, override: Optional[int]) -> int:
    """Static job budget per keypoint method (worst-case keypoint count)."""
    if override is not None:
        return override
    if cfg_kp.name == "set_interval":
        rows = len(range(0, H - 1, cfg_kp.min_N)) + 1
        return rows * ndof
    # adaptive methods: at most one keypoint per min_N steps per dof, + ends
    return ndof * (H // max(cfg_kp.min_N, 1) + 2)


def make_phase_fns(task: Task, cfg: ILQRConfig, H: int):
    """Build the jitted phase functions for a given (task topology, horizon).

    Returned closures are reused across optimise() calls and MPC replans —
    compile once, run many.
    """
    model, sv = task.model, task.sv
    kp_cfg = task.keypoint_cfg
    budget = _deriv_budget(kp_cfg, H, sv.ndof, cfg.deriv_budget)
    dt = model.timestep

    @jax.jit
    def rollout_fn(qpos0, qvel0, U):
        return rollout(task, qpos0, qvel0, U, cfg.warmstart_rollouts)

    @jax.jit
    def mask_fn(traj: Trajectory):
        vel_sv = traj.qvel[:H][:, jnp.array(sv.order)]
        return generate_keypoints(kp_cfg, vel_sv, dt)

    @jax.jit
    def adjust_mask_fn(traj: Trajectory, expected, actual, last_pct,
                       importances):
        vel_sv = traj.qvel[:H][:, jnp.array(sv.order)]
        return auto_adjust_mask(
            vel_sv, dt, expected, actual, last_pct, importances, kp_cfg.max_N
        )

    @jax.jit
    def derivs_fn(traj: Trajectory, mask):
        return compute_derivatives(
            task, traj, mask, budget, mode=cfg.deriv_mode, fd_eps=cfg.fd_eps,
            filtering=cfg.filtering, chunk_size=cfg.deriv_chunk,
            cost_derivs_fd=cfg.cost_derivs_fd,
        )

    @jax.jit
    def bp_fn(A, B, l_x, l_xx, l_u, l_uu, lamb):
        return backward_pass_lambda_loop(A, B, l_x, l_xx, l_u, l_uu, lamb, cfg)

    alphas = default_alphas(cfg.num_parallel_rollouts, model.dtype)

    @jax.jit
    def fp_fn(traj, k, K, old_cost):
        return forward_pass(task, traj, k, K, alphas, old_cost,
                            cfg.warmstart_rollouts)

    return rollout_fn, mask_fn, adjust_mask_fn, derivs_fn, bp_fn, fp_fn


def optimise(
    task: Task,
    qpos0,
    qvel0,
    U_init,
    cfg: ILQRConfig = None,
    phase_fns=None,
    verbose: bool = False,
) -> Tuple[Trajectory, ILQRStats]:
    """Open-loop iLQR optimisation (iLQR::Optimise, `iLQR.cpp:269-410`).

    Host-driven loop over jitted phases (records per-phase wall times like the
    reference's banner); see solver/fused.py for the single-dispatch variant
    used by MPC.
    """
    import time as _time

    cfg = cfg or ILQRConfig()
    H = U_init.shape[0]
    if phase_fns is None:
        phase_fns = make_phase_fns(task, cfg, H)
    rollout_fn, mask_fn, adjust_mask_fn, derivs_fn, bp_fn, fp_fn = phase_fns
    kp_cfg = task.keypoint_cfg
    use_iterative = kp_cfg is not None and kp_cfg.name == "iterative_error"

    t_start = _time.perf_counter()
    traj = rollout_fn(jnp.asarray(qpos0), jnp.asarray(qvel0), jnp.asarray(U_init))
    old_cost = float(traj.total_cost)
    initial_cost = old_cost

    lamb = jnp.asarray(cfg.lambda_init, dtype=task.model.dtype)
    hist, pcts, alphas_used, lambdas = [], [], [], []
    t_derivs, t_bp, t_fp = [], [], []
    n_iters = 0
    cost_reduced_last_iter = True
    derivs = None
    adjusted_mask = None  # auto-adjust overrides the method mask
    expected = 0.0
    last_pct = None
    dof_importances = jnp.ones((task.sv.ndof,), task.model.dtype)

    for it in range(cfg.max_iterations):
        n_iters += 1
        t0 = _time.perf_counter()
        if cost_reduced_last_iter:
            if use_iterative:
                from ..keypoints.iterative import iterative_error_keypoints

                mask, A_kp, B_kp, _ = iterative_error_keypoints(
                    task, traj.qpos[:H], traj.qvel[:H], traj.ctrl,
                    kp_cfg.min_N, kp_cfg.iterative_error_threshold,
                    mode=cfg.deriv_mode, fd_eps=cfg.fd_eps,
                    warm_traj=traj.warm,
                )
                derivs = _derivs_from_columns(
                    task, traj, mask, A_kp, B_kp, cfg.filtering
                )
            else:
                mask = (
                    adjusted_mask if adjusted_mask is not None
                    else mask_fn(traj)
                )
                # budget-overflow guard: jobs beyond the static budget are
                # dropped deterministically inside jobs_from_mask — surface
                # that instead of corrupting derivatives silently
                budget = _deriv_budget(
                    kp_cfg, H, task.sv.ndof, cfg.deriv_budget
                )
                n_kp = int(jnp.sum(mask))
                if n_kp > budget:
                    import warnings

                    warnings.warn(
                        f"keypoint mask has {n_kp} jobs > deriv budget "
                        f"{budget}; surplus keypoints are dropped — raise "
                        "ILQRConfig.deriv_budget",
                        stacklevel=2,
                    )
                derivs = derivs_fn(traj, mask)
            jax.block_until_ready(derivs)
        A, B, l_x, l_xx, l_u, l_uu, pct = derivs
        last_pct = pct
        t1 = _time.perf_counter()

        k, K, dJ, lamb, lambda_exit = bp_fn(A, B, l_x, l_xx, l_u, l_uu, lamb)
        jax.block_until_ready(k)
        t2 = _time.perf_counter()
        if bool(lambda_exit):
            break

        traj_new, new_cost, accepted, best_alpha = fp_fn(traj, k, K, old_cost)
        new_cost = float(new_cost)
        jax.block_until_ready(traj_new)
        t3 = _time.perf_counter()

        # auto-adjust (AdjustKeyPointMethod, KeyPointGenerator.cpp:137-207):
        # expected vs actual cost reduction steers the next derivative budget
        if kp_cfg is not None and kp_cfg.auto_adjust:
            a = float(best_alpha)
            expected = -(a * float(dJ) + (a * a / 2.0) * float(dJ))
            actual = old_cost - new_cost
            adjusted_mask = adjust_mask_fn(
                traj_new if bool(accepted) else traj,
                jnp.asarray(expected), jnp.asarray(actual),
                pct, dof_importances,
            )

        t_derivs.append((t1 - t0) * 1e3)
        t_bp.append((t2 - t1) * 1e3)
        t_fp.append((t3 - t2) * 1e3)
        hist.append(new_cost)
        pcts.append(float(jnp.mean(pct)))
        alphas_used.append(float(best_alpha))
        lambdas.append(float(lamb))

        if verbose:
            print(
                f"iter {it}: cost {old_cost:.5f} -> {new_cost:.5f} "
                f"lambda {float(lamb):.2e} %derivs {pcts[-1]:.1f} "
                f"t(d/bp/fp) {t_derivs[-1]:.1f}/{t_bp[-1]:.1f}/{t_fp[-1]:.1f} ms"
            )

        converged = (old_cost - new_cost) / max(new_cost, 1e-12) < cfg.eps_converge
        if bool(accepted):
            traj = traj_new
            old_cost = new_cost
            cost_reduced_last_iter = True
        else:
            cost_reduced_last_iter = False
            # cost didn't reduce: re-raise lambda twice (iLQR.cpp:517-528)
            lamb = jnp.clip(
                lamb * cfg.lambda_factor * cfg.lambda_factor,
                cfg.min_lambda,
                cfg.max_lambda,
            )
        if converged and it >= cfg.min_iterations:
            break

    stats = ILQRStats(
        initial_cost=initial_cost,
        final_cost=old_cost,
        cost_reduction=1.0 - old_cost / max(initial_cost, 1e-12),
        num_iterations=n_iters,
        cost_history=tuple(hist),
        percent_derivs=tuple(pcts),
        best_alphas=tuple(alphas_used),
        lambdas=tuple(lambdas),
        time_derivs_ms=tuple(t_derivs),
        time_bp_ms=tuple(t_bp),
        time_fp_ms=tuple(t_fp),
        opt_time_ms=(_time.perf_counter() - t_start) * 1e3,
    )
    return traj, stats
