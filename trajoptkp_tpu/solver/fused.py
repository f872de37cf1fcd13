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

from ..keypoints.methods import generate_keypoints
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


class FusedResult(NamedTuple):
    traj: Trajectory
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    num_iterations: jnp.ndarray
    best_alpha: jnp.ndarray
    pct_derivs: jnp.ndarray

    @property
    def cost_reduction(self):
        return 1.0 - self.final_cost / jnp.maximum(self.initial_cost, 1e-12)


def make_fused_optimise(task: Task, cfg: ILQRConfig, H: int):
    """Build optimise(qpos0, qvel0, U0) -> FusedResult, one XLA dispatch.

    Semantics identical to ilqr.optimise (iLQR::Optimise,
    `/root/reference/src/Optimiser/iLQR.cpp:269-410`) except derivatives are
    recomputed after rejected steps (identical values — pure function of the
    unchanged nominal), trading a little compute for a static loop structure.
    """
    model, sv = task.model, task.sv
    kp_cfg = task.keypoint_cfg
    budget = _deriv_budget(kp_cfg, H, sv.ndof, cfg.deriv_budget)
    alphas = default_alphas(cfg.num_parallel_rollouts, model.dtype)
    dt = model.timestep
    sv_idx = jnp.array(sv.order)

    def iteration(state: FusedState) -> FusedState:
        traj, old_cost = state.traj, state.old_cost
        vel_sv = traj.qvel[:H][:, sv_idx]
        mask = generate_keypoints(kp_cfg, vel_sv, dt)
        A, B, l_x, l_xx, l_u, l_uu, pct = compute_derivatives(
            task, traj, mask, budget, mode=cfg.deriv_mode, fd_eps=cfg.fd_eps,
            filtering=cfg.filtering, chunk_size=cfg.deriv_chunk,
        )
        k, K, dJ, lamb, lambda_exit = backward_pass_lambda_loop(
            A, B, l_x, l_xx, l_u, l_uu, state.lamb, cfg
        )
        traj_new, new_cost, accepted, best_alpha = forward_pass(
            task, traj, k, K, alphas, old_cost
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
        return FusedState(
            traj=traj_new,
            old_cost=new_cost,
            lamb=lamb,
            it=it,
            done=done,
            last_best_alpha=best_alpha,
            pct_derivs=jnp.mean(pct),
        )

    def optimise_fused(qpos0, qvel0, U0) -> FusedResult:
        traj = rollout(task, qpos0, qvel0, U0)
        initial_cost = traj.total_cost
        state = FusedState(
            traj=traj,
            old_cost=initial_cost,
            lamb=jnp.asarray(cfg.lambda_init, model.dtype),
            it=jnp.zeros((), jnp.int32),
            done=jnp.zeros((), bool),
            last_best_alpha=jnp.zeros((), model.dtype),
            pct_derivs=jnp.zeros((), model.dtype),
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
        )

    return optimise_fused
