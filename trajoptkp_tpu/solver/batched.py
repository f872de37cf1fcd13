"""Phase-batched multi-scene optimiser: vmap per phase, host-driven loop.

The campaign path (`bench/harness.py`) normally solves all scenes as ONE
vmapped fused-iLQR dispatch.  At panda-scale programs (H=1000, chunked
derivative scans) the XLA TPU compiler currently hits an internal
memory-space-assignment CHECK when the whole fused while_loop is vmapped;
splitting the iteration into its four phase programs — rollout, derivatives,
backward pass, line search — compiles each as a much smaller executable and
sidesteps the crash while keeping every phase fully batched on device.

Semantics match `fused.make_fused_optimise` with
min_iterations == max_iterations (every scene runs the full iteration
budget; rejected steps keep the nominal and re-raise lambda — the
reference's `iLQR.cpp:517-528` behaviour, applied per scene).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..keypoints.methods import generate_keypoints
from .ilqr import (ILQRConfig, _deriv_budget, backward_pass_lambda_loop,
                   compute_derivatives, default_alphas, forward_pass, rollout)


class BatchedResult(NamedTuple):
    ctrl: jnp.ndarray           # (N, H, nu) optimised controls
    initial_cost: jnp.ndarray   # (N,)
    final_cost: jnp.ndarray     # (N,)
    num_iterations: jnp.ndarray # (N,)
    pct_derivs: jnp.ndarray     # (N,)

    @property
    def cost_reduction(self):
        return 1.0 - self.final_cost / jnp.maximum(self.initial_cost, 1e-12)


def make_batched_phase_optimise(task, cfg: ILQRConfig, H: int,
                                batch_size: int = None):
    """Build run(qposB, qvelB, UB, targetsB) -> BatchedResult.

    Each phase is a separately-jitted vmapped program; the iteration loop
    runs on host (cfg.max_iterations fixed trips).

    batch_size (when known): the derivative chunk's HBM budget is per-SOLVE
    (default_chunk_size), but the chunk scan runs inside a vmap over scenes —
    divide the chunk by the batch so the whole batched chunk stays within
    budget (a 100-scene panda campaign OOMs 16 GB otherwise).
    """
    model, sv = task.model, task.sv
    dtype = model.dtype
    kp_cfg = task.keypoint_cfg
    budget = _deriv_budget(kp_cfg, H, sv.ndof, cfg.deriv_budget)
    alphas = default_alphas(cfg.num_parallel_rollouts, dtype)
    sv_idx = jnp.array(sv.order)
    dt = model.timestep
    if cfg.deriv_chunk is None and batch_size:
        from ..derivs.fd import default_chunk_size

        cfg = cfg.replace(
            deriv_chunk=max(8, default_chunk_size(model) // batch_size)
        )

    def with_targets(targets):
        return task.replace(residual_targets=targets)

    @jax.jit
    def rollout_b(qp, qv, U, targets):
        return jax.vmap(
            lambda a, b, c, t: rollout(
                with_targets(t), a, b, c, cfg.warmstart_rollouts
            )
        )(qp, qv, U, targets)

    @jax.jit
    def derivs_b(traj, targets):
        def one(tr, t):
            vel_sv = tr.qvel[:H][:, sv_idx]
            mask = generate_keypoints(kp_cfg, vel_sv, dt)
            return compute_derivatives(
                with_targets(t), tr, mask, budget, mode=cfg.deriv_mode,
                fd_eps=cfg.fd_eps, filtering=cfg.filtering,
                chunk_size=cfg.deriv_chunk,
                cost_derivs_fd=cfg.cost_derivs_fd,
            )

        return jax.vmap(one)(traj, targets)

    @jax.jit
    def bp_b(A, B, l_x, l_xx, l_u, l_uu, lamb):
        return jax.vmap(
            lambda a, b, lx, lxx, lu, luu, lm: backward_pass_lambda_loop(
                a, b, lx, lxx, lu, luu, lm, cfg
            )
        )(A, B, l_x, l_xx, l_u, l_uu, lamb)

    @jax.jit
    def fp_b(traj, k, K, old_cost, targets):
        return jax.vmap(
            lambda tr, kk, KK, oc, t: forward_pass(
                with_targets(t), tr, kk, KK, alphas, oc,
                cfg.warmstart_rollouts
            )
        )(traj, k, K, old_cost, targets)

    def run(qposB, qvelB, UB, targetsB) -> BatchedResult:
        N = UB.shape[0]
        traj = rollout_b(qposB, qvelB, UB, targetsB)
        initial_cost = traj.costs.sum(-1)
        old_cost = initial_cost
        lamb = jnp.full((N,), cfg.lambda_init, dtype)
        pct = jnp.zeros((N,), dtype)
        for _ in range(cfg.max_iterations):
            A, B, l_x, l_xx, l_u, l_uu, pct_it = derivs_b(traj, targetsB)
            k, K, dJ, lamb, _ = bp_b(A, B, l_x, l_xx, l_u, l_uu, lamb)
            traj, new_cost, accepted, _ = fp_b(traj, k, K, old_cost, targetsB)
            lamb = jnp.where(
                accepted, lamb,
                jnp.clip(lamb * cfg.lambda_factor**2,
                         cfg.min_lambda, cfg.max_lambda),
            )
            old_cost = new_cost
            pct = jnp.mean(
                pct_it.reshape(N, -1), axis=1
            )
        return BatchedResult(
            ctrl=traj.ctrl,
            initial_cost=initial_cost,
            final_cost=old_cost,
            num_iterations=jnp.full((N,), cfg.max_iterations, jnp.int32),
            pct_derivs=pct,
        )

    return run
