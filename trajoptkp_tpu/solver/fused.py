"""Fully-fused iLQR: the whole optimisation as ONE compiled XLA program.

The host-driven loop in ilqr.py mirrors the reference's phase structure and
gives per-phase timings; this module fuses rollout + keypoints + batched
FD/AD Jacobians + Riccati + line search + the iteration loop into a single
jitted dispatch (`lax.while_loop` over iterations).  This is the path MPC
replanning uses — one device round-trip per replan instead of four — and the
unit that gets vmapped over scenario batches and sharded over the mesh
(SURVEY §2.3: scenario sweep = data-parallel axis).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..keypoints.methods import (auto_adjust_mask, generate_keypoints,
                                 percentage_derivs)
from ..tasks.base import Task
from .ilqr import (ILQRConfig, Trajectory, _deriv_budget,
                   backward_pass_lambda_loop, compute_derivatives,
                   default_alphas, forward_pass, rollout)


class FusedState(NamedTuple):
    traj: Trajectory
    old_cost: jnp.ndarray
    lamb: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray           # converged or lambda-exit
    last_best_alpha: jnp.ndarray
    pct_derivs: jnp.ndarray
    # auto_adjust surprise-controller state (AdjustKeyPointMethod,
    # KeyPointGenerator.cpp:137-207); carried but inert when the task's
    # keypoint config has auto_adjust=False
    adj_mask: jnp.ndarray       # (H, ndof) bool — next iteration's keypoints
    last_pct: jnp.ndarray       # (ndof,) last per-dof %derivs
    overflow: jnp.ndarray       # () int32 — max jobs dropped by the budget


class FusedResult(NamedTuple):
    traj: Trajectory
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    num_iterations: jnp.ndarray
    best_alpha: jnp.ndarray
    pct_derivs: jnp.ndarray
    # max keypoint jobs dropped by the static budget across iterations
    # (jobs_from_mask drops surplus deterministically, fd.py; nonzero means
    # raise ILQRConfig.deriv_budget — the fused-path analogue of the host
    # loop's overflow warning, ilqr.py optimise())
    budget_overflow: jnp.ndarray = jnp.zeros((), jnp.int32)

    @property
    def cost_reduction(self):
        return 1.0 - self.final_cost / jnp.maximum(self.initial_cost, 1e-12)


def make_fused_optimise(task: Task, cfg: ILQRConfig, H: int,
                        shard_axis: str = None, num_shards: int = 1):
    """Build optimise(qpos0, qvel0, U0) -> FusedResult, one XLA dispatch.

    Semantics identical to ilqr.optimise (iLQR::Optimise,
    `/root/reference/src/Optimiser/iLQR.cpp:269-410`) except derivatives are
    recomputed after rejected steps (identical values — pure function of the
    unchanged nominal), trading a little compute for a static loop structure.

    shard_axis/num_shards: shard ONE solve's derivative jobs over a mesh
    axis (caller must run this under shard_map exposing the axis —
    parallel/mesh.make_sharded_batch_optimise does).
    """
    model, sv = task.model, task.sv
    kp_cfg = task.keypoint_cfg
    budget = _deriv_budget(kp_cfg, H, sv.ndof, cfg.deriv_budget)
    alphas = default_alphas(cfg.num_parallel_rollouts, model.dtype)
    dt = model.timestep
    sv_idx = jnp.array(sv.order)

    dof_importances = jnp.ones((sv.ndof,), model.dtype)

    def iteration(state: FusedState) -> FusedState:
        traj, old_cost = state.traj, state.old_cost
        vel_sv = traj.qvel[:H][:, sv_idx]
        if kp_cfg.auto_adjust:
            mask = state.adj_mask
        else:
            mask = generate_keypoints(kp_cfg, vel_sv, dt)
        # budget-overflow guard (the host loop warns in ilqr.optimise;
        # here jobs beyond the static budget are dropped deterministically
        # by jobs_from_mask — surface the count instead of corrupting
        # derivatives silently)
        n_kp = jnp.sum(mask).astype(jnp.int32)
        overflow = jnp.maximum(
            state.overflow, jnp.maximum(n_kp - budget, 0)
        )
        A, B, l_x, l_xx, l_u, l_uu, pct = compute_derivatives(
            task, traj, mask, budget, mode=cfg.deriv_mode, fd_eps=cfg.fd_eps,
            filtering=cfg.filtering, chunk_size=cfg.deriv_chunk,
            cost_derivs_fd=cfg.cost_derivs_fd,
            shard_axis=shard_axis, num_shards=num_shards,
        )
        k, K, dJ, lamb, lambda_exit = backward_pass_lambda_loop(
            A, B, l_x, l_xx, l_u, l_uu, state.lamb, cfg
        )
        traj_new, new_cost, accepted, best_alpha = forward_pass(
            task, traj, k, K, alphas, old_cost, cfg.warmstart_rollouts
        )
        converged = (old_cost - new_cost) / jnp.maximum(new_cost, 1e-12) \
            < cfg.eps_converge
        # rejected step: re-raise lambda twice (iLQR.cpp:517-528)
        lamb = jnp.where(
            accepted,
            lamb,
            jnp.clip(
                lamb * cfg.lambda_factor**2, cfg.min_lambda, cfg.max_lambda
            ),
        )
        it = state.it + 1
        done = lambda_exit | (converged & (it >= cfg.min_iterations))
        if kp_cfg.auto_adjust:
            # surprise controller (KeyPointGenerator.cpp:137-207): expected
            # vs actual reduction steers next iteration's keypoint budget
            a = best_alpha
            expected = -(a * dJ + (a * a / 2.0) * dJ)
            actual = old_cost - new_cost
            vel_new = traj_new.qvel[:H][:, sv_idx]
            adj_mask = auto_adjust_mask(
                vel_new, dt, expected, actual, pct, dof_importances,
                kp_cfg.max_N,
            )
        else:
            adj_mask = state.adj_mask
        return FusedState(
            traj=traj_new,
            old_cost=new_cost,
            lamb=lamb,
            it=it,
            done=done,
            last_best_alpha=best_alpha,
            pct_derivs=jnp.mean(pct),
            adj_mask=adj_mask,
            last_pct=pct,
            overflow=overflow,
        )

    def optimise_fused(qpos0, qvel0, U0) -> FusedResult:
        traj = rollout(task, qpos0, qvel0, U0, cfg.warmstart_rollouts)
        initial_cost = traj.total_cost
        vel0 = traj.qvel[:H][:, sv_idx]
        mask0 = generate_keypoints(kp_cfg, vel0, dt)
        state = FusedState(
            traj=traj,
            old_cost=initial_cost,
            lamb=jnp.asarray(cfg.lambda_init, model.dtype),
            it=jnp.zeros((), jnp.int32),
            done=jnp.zeros((), bool),
            last_best_alpha=jnp.zeros((), model.dtype),
            pct_derivs=jnp.zeros((), model.dtype),
            adj_mask=mask0,
            last_pct=percentage_derivs(mask0),
            overflow=jnp.zeros((), jnp.int32),
        )
        state = jax.lax.while_loop(
            lambda s: jnp.logical_not(s.done) & (s.it < cfg.max_iterations),
            iteration,
            state,
        )
        return FusedResult(
            traj=state.traj,
            initial_cost=initial_cost,
            final_cost=state.old_cost,
            num_iterations=state.it,
            best_alpha=state.last_best_alpha,
            pct_derivs=state.pct_derivs,
            budget_overflow=state.overflow,
        )

    return optimise_fused
