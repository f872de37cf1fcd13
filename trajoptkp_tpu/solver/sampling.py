"""PredictiveSampling: sampling-based optimiser (MPPI-lite).

The reference ships a PredictiveSampling optimiser that is commented out of
the build with a stale API (`/root/reference/src/Optimiser/
PredictiveSampling.cpp`, excluded at `CMakeLists.txt:70`): per iteration it
rolls out `num_rollouts` noisy control tapes (OpenMP parallel) and keeps the
best (`:83-141`, `createNoisyTrajec` `:164-173`).

Here it is a working first-class optimiser: the noisy rollouts are one vmap
axis (the same batched-rollout engine as the iLQR line search), so hundreds
of samples run per device launch — and it shares the Task/Trajectory API
with iLQR so the MPC executors can use it interchangeably.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..tasks.base import Task, control_limits
from .ilqr import Trajectory, rollout


@struct.dataclass
class SamplingConfig:
    max_iterations: int = struct.field(pytree_node=False, default=10)
    num_rollouts: int = struct.field(pytree_node=False, default=8)
    noise_std_frac: float = struct.field(pytree_node=False, default=0.05)
    # fraction of the control range used as the perturbation std


class SamplingResult(NamedTuple):
    traj: Trajectory
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    num_iterations: jnp.ndarray

    @property
    def cost_reduction(self):
        return 1.0 - self.final_cost / jnp.maximum(self.initial_cost, 1e-12)


def make_sampling_optimise(task: Task, cfg: SamplingConfig, H: int):
    """Build optimise(qpos0, qvel0, U0, key) -> SamplingResult."""
    limits = control_limits(task)
    noise_std = (limits[:, 1] - limits[:, 0]) * cfg.noise_std_frac

    def iteration(carry, _):
        U_best, cost_best, qpos0, qvel0, key = carry
        key, sub = jax.random.split(key)
        noise = noise_std * jax.random.normal(
            sub, (cfg.num_rollouts, H, task.model.nu), U_best.dtype
        )
        U_cand = jnp.clip(
            U_best[None] + noise, limits[:, 0], limits[:, 1]
        )

        def one(U):
            tr = rollout(task, qpos0, qvel0, U)
            return tr.total_cost

        costs = jax.vmap(one)(U_cand)
        best = jnp.argmin(costs)
        improved = costs[best] < cost_best
        U_best = jnp.where(improved, U_cand[best], U_best)
        cost_best = jnp.where(improved, costs[best], cost_best)
        return (U_best, cost_best, qpos0, qvel0, key), cost_best

    def optimise_sampling(qpos0, qvel0, U0, key) -> SamplingResult:
        traj0 = rollout(task, qpos0, qvel0, U0)
        init_cost = traj0.total_cost
        (U_best, cost_best, _, _, _), _ = jax.lax.scan(
            iteration,
            (U0, init_cost, qpos0, qvel0, key),
            None,
            length=cfg.max_iterations,
        )
        traj = rollout(task, qpos0, qvel0, U_best)
        return SamplingResult(
            traj=traj,
            initial_cost=init_cost,
            final_cost=cost_best,
            num_iterations=jnp.asarray(cfg.max_iterations),
        )

    return optimise_sampling


# ---------------------------------------------------------------------------
# Gradient descent (first-order shooting), reference GradDescent.cpp
# ---------------------------------------------------------------------------


@struct.dataclass
class GradDescentConfig:
    max_iterations: int = struct.field(pytree_node=False, default=10)
    num_linesearch: int = struct.field(pytree_node=False, default=6)
    base_step: float = struct.field(pytree_node=False, default=1.0)


def make_grad_descent_optimise(task: Task, cfg: GradDescentConfig, H: int):
    """First-order shooting: J_u via reverse-mode autodiff through the whole
    rollout (the reference's disabled GradDescent computed J_u with its FD
    machinery, `src/Optimiser/GradDescent.cpp:186,329`; our differentiable
    stepper gets the exact gradient in one backward pass), with a batched
    step-size line search."""
    limits = control_limits(task)

    def total_cost(qpos0, qvel0, U):
        return rollout(task, qpos0, qvel0, U).total_cost

    grad_fn = jax.grad(total_cost, argnums=2)

    def iteration(carry, _):
        U, cost, qpos0, qvel0 = carry
        g = grad_fn(qpos0, qvel0, U)
        gnorm = jnp.maximum(jnp.linalg.norm(g), 1e-12)
        steps = cfg.base_step * (0.5 ** jnp.arange(cfg.num_linesearch,
                                                   dtype=U.dtype))

        def try_step(s):
            U_new = jnp.clip(
                U - s * g / gnorm, limits[:, 0], limits[:, 1]
            )
            return total_cost(qpos0, qvel0, U_new), U_new

        costs, Us = jax.vmap(try_step)(steps)
        best = jnp.argmin(costs)
        improved = costs[best] < cost
        U = jnp.where(improved, Us[best], U)
        cost = jnp.where(improved, costs[best], cost)
        return (U, cost, qpos0, qvel0), cost

    def optimise_gd(qpos0, qvel0, U0) -> SamplingResult:
        init_cost = total_cost(qpos0, qvel0, U0)
        (U, cost, _, _), _ = jax.lax.scan(
            iteration, (U0, init_cost, qpos0, qvel0), None,
            length=cfg.max_iterations,
        )
        traj = rollout(task, qpos0, qvel0, U)
        return SamplingResult(
            traj=traj,
            initial_cost=init_cost,
            final_cost=cost,
            num_iterations=jnp.asarray(cfg.max_iterations),
        )

    return optimise_gd
