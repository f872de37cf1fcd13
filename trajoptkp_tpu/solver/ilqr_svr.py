"""iLQR_SVR: iLQR with online State-Vector Reduction, masked static shapes.

TPU-native re-design of the reference iLQR_SVR
(`/root/reference/src/Optimiser/iLQR_SVR.cpp`):

  per iteration (`:405-530`):
    1. ResampleNewDofs: randomly re-activate up to `num_dofs_readd` (10)
       currently-unused dofs (`:996-1013`, ModelTranslator.cpp:234-257)
    2. derivatives over the active dofs only
    3. Riccati backward pass
    4. LeastImportantDofs: importance_i = sum over sampled t and controls of
       |K[t](u, i)| + |K[t](u, i+dof)|, normalised by horizon; dofs below
       K_matrix_threshold become removal candidates (`:954-994`); robot dofs
       are protected (`ModelTranslator.cpp:104-116` filters the robot's
       names) — here a `protected_mask` (default: actuated joints)
    5. batched line-search forward pass, nominal update
    6. RemoveDofs (`:1015-1030`)

XLA redesign: instead of reallocating every matrix when dof changes
(`iLQR.cpp:37-200` Resize), the state stays FULL-sized with a 0/1 `active`
mask: inactive rows/cols of A/l_x/l_xx (and B's inactive rows) are zeroed
before the backward pass, which is algebraically identical to running iLQR on
the reduced state (the inactive subspace decouples and contributes nothing to
Q_uu, k, or K).  Shapes never change, so one compiled executable serves every
reduction pattern — this is the static-shape strategy SURVEY §7.2 calls for.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..keypoints.methods import generate_keypoints, percentage_derivs
from ..tasks.base import Task
from .ilqr import (ILQRConfig, Trajectory, _deriv_budget,
                   backward_pass_lambda_loop, compute_derivatives,
                   default_alphas, forward_pass, rollout)


@struct.dataclass
class SVRConfig:
    num_dofs_readd: int = struct.field(pytree_node=False, default=10)
    K_matrix_threshold: float = struct.field(pytree_node=False, default=1.0)
    sampling_k_interval: int = struct.field(pytree_node=False, default=1)
    # rank dof importance by SVD right-vectors of K[t] instead of |K| column
    # sums (the reference's eigen_vector_method, `iLQR_SVR.cpp:901-932`)
    eigen_vector_method: bool = struct.field(pytree_node=False, default=False)


class SVRState(NamedTuple):
    traj: Trajectory
    old_cost: jnp.ndarray
    lamb: jnp.ndarray
    active: jnp.ndarray       # (ndof,) float 0/1
    it: jnp.ndarray
    done: jnp.ndarray
    key: jax.Array
    avg_dofs: jnp.ndarray


class SVRResult(NamedTuple):
    traj: Trajectory
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    num_iterations: jnp.ndarray
    active: jnp.ndarray
    avg_dofs: jnp.ndarray

    @property
    def cost_reduction(self):
        return 1.0 - self.final_cost / jnp.maximum(self.initial_cost, 1e-12)


def _mask_derivs(A, B, l_x, l_xx, l_u, l_uu, active):
    """Zero the inactive tangent subspace (rows+cols of A/l_xx, rows of
    B/l_x) — equivalent to the reference's matrix shrinking."""
    n = active.shape[0]
    m = jnp.concatenate([active, active])          # (2n,)
    A = A * m[None, :, None] * m[None, None, :]
    B = B * m[None, :, None]
    l_x = l_x * m[None, :]
    l_xx = l_xx * m[None, :, None] * m[None, None, :]
    return A, B, l_x, l_xx, l_u, l_uu


def dof_importances(K: jnp.ndarray, active: jnp.ndarray, interval: int):
    """Normalised |K|-column sums per dof (LeastImportantDofs sampling mode)."""
    H = K.shape[0]
    n = active.shape[0]
    Ks = K[::interval]  # (H', nu, 2n)
    sums = jnp.sum(jnp.abs(Ks), axis=(0, 1))  # (2n,)
    return (sums[:n] + sums[n:]) / H


def dof_importances_svd(K: jnp.ndarray, active: jnp.ndarray, interval: int):
    """SVD ranking (LeastImportantDofs eigen-vector mode,
    `iLQR_SVR.cpp:901-932`): per sampled t, importance_j +=
    sum_{m<3} |V[j, m] s_m| + |V[j+n, m] s_m| with K[t] = U S V^T,
    normalised by horizon.  Batched jnp SVD over the sampled timesteps."""
    H = K.shape[0]
    n = active.shape[0]
    Ks = K[::interval]  # (H', nu, 2n)
    m_top = min(3, Ks.shape[1])
    _, s, vh = jnp.linalg.svd(Ks, full_matrices=False)  # s (H', r), vh (H', r, 2n)
    contrib = jnp.abs(vh[:, :m_top, :] * s[:, :m_top, None])  # (H', m, 2n)
    sums = jnp.sum(contrib, axis=(0, 1))  # (2n,)
    return (sums[:n] + sums[n:]) / H


def make_svr_optimise(
    task: Task, cfg: ILQRConfig, svr: SVRConfig, H: int,
    protected_mask: jnp.ndarray = None,
):
    """Build the fused SVR optimiser for a task/horizon.

    protected_mask: (ndof,) 1.0 = never removable (default: first nu dofs,
    the actuated robot joints — mirroring the reference's "panda" filter).
    """
    model, sv = task.model, task.sv
    ndof = sv.ndof
    kp_cfg = task.keypoint_cfg
    budget = _deriv_budget(kp_cfg, H, ndof, cfg.deriv_budget)
    alphas = default_alphas(cfg.num_parallel_rollouts, model.dtype)
    dt = model.timestep
    sv_idx = jnp.array(sv.order)
    if protected_mask is None:
        protected_mask = (jnp.arange(ndof) < model.nu).astype(model.dtype)

    def iteration(state: SVRState) -> SVRState:
        traj, old_cost, active = state.traj, state.old_cost, state.active
        key, k1 = jax.random.split(state.key)

        # --- 1. resample: randomly re-add up to num_dofs_readd inactive dofs
        inactive = 1.0 - active
        scores = jax.random.uniform(k1, (ndof,)) * inactive
        # top `num_dofs_readd` inactive dofs by random score
        order = jnp.argsort(-scores)
        readd_rank = jnp.argsort(order)
        readd = (readd_rank < svr.num_dofs_readd) & (inactive > 0)
        active = jnp.clip(active + readd.astype(active.dtype), 0.0, 1.0)

        # --- 2. derivatives, masked to active dofs
        vel_sv = traj.qvel[:H][:, sv_idx]
        mask = generate_keypoints(kp_cfg, vel_sv, dt) & (active > 0)[None, :]
        A, B, l_x, l_xx, l_u, l_uu, pct = compute_derivatives(
            task, traj, mask, budget, mode=cfg.deriv_mode, fd_eps=cfg.fd_eps,
            filtering=cfg.filtering, chunk_size=cfg.deriv_chunk,
            cost_derivs_fd=cfg.cost_derivs_fd,
        )
        A, B, l_x, l_xx, l_u, l_uu = _mask_derivs(
            A, B, l_x, l_xx, l_u, l_uu, active
        )

        # --- 3. backward pass with lambda retry
        k, K, dJ, lamb, lambda_exit = backward_pass_lambda_loop(
            A, B, l_x, l_xx, l_u, l_uu, state.lamb, cfg
        )

        # --- 4. importance ranking -> removal candidates
        rank_fn = (
            dof_importances_svd if svr.eigen_vector_method else dof_importances
        )
        imp = rank_fn(K, active, svr.sampling_k_interval)
        removable = (
            (imp < svr.K_matrix_threshold)
            & (active > 0)
            & (protected_mask < 0.5)
        )

        # --- 5. forward pass (feedback restricted to active dofs via the
        # masked K columns — inactive ones are zero already)
        sv_active = task.replace(sv=sv.replace(active=active))
        traj_new, new_cost, accepted, best_alpha = forward_pass(
            sv_active, traj, k, K, alphas, old_cost, cfg.warmstart_rollouts
        )
        converged = (old_cost - new_cost) / jnp.maximum(new_cost, 1e-12) \
            < cfg.eps_converge
        lamb = jnp.where(
            accepted, lamb,
            jnp.clip(lamb * cfg.lambda_factor**2, cfg.min_lambda, cfg.max_lambda),
        )

        # --- 6. remove candidates
        active = active * (1.0 - removable.astype(active.dtype))

        it = state.it + 1
        done = lambda_exit | (converged & (it >= cfg.min_iterations))
        return SVRState(
            traj=traj_new,
            old_cost=new_cost,
            lamb=lamb,
            active=active,
            it=it,
            done=done,
            key=key,
            avg_dofs=state.avg_dofs + jnp.sum(active),
        )

    def optimise_svr(qpos0, qvel0, U0, key) -> SVRResult:
        traj = rollout(task, qpos0, qvel0, U0, cfg.warmstart_rollouts)
        initial_cost = traj.total_cost
        state = SVRState(
            traj=traj,
            old_cost=initial_cost,
            lamb=jnp.asarray(cfg.lambda_init, model.dtype),
            active=jnp.ones((ndof,), model.dtype),
            it=jnp.zeros((), jnp.int32),
            done=jnp.zeros((), bool),
            key=key,
            avg_dofs=jnp.zeros((), model.dtype),
        )
        state = jax.lax.while_loop(
            lambda s: jnp.logical_not(s.done) & (s.it < cfg.max_iterations),
            iteration,
            state,
        )
        return SVRResult(
            traj=state.traj,
            initial_cost=initial_cost,
            final_cost=state.old_cost,
            num_iterations=state.it,
            active=state.active,
            avg_dofs=state.avg_dofs / jnp.maximum(state.it, 1),
        )

    return optimise_svr
