"""Synchronous MPC executor: replan - apply - repeat, fully fused.

TPU-native equivalent of the reference's synchronous MPC path
(`/root/reference/src/main.cpp:630-744` with apply_next_control handshaking,
and the GenDataMPCHorizons harness `src/GenTestingData.cpp:275-326`):

  per replan: shift consumed controls (pad with the last control,
  `main.cpp:663-669`), run ONE iLQR iteration from the current state
  (max_iter = min_iter = 1, `main.cpp:671`), then apply `num_apply` controls
  with Gaussian exploration noise of std = 5% of the control range
  (`main.cpp:489-496`).

The whole run (n_replans x (optimise + apply)) is a single lax.scan — one
device dispatch per MPC episode, the right shape for batching hundreds of
episodes per chip.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..dynamics.model import Data
from ..dynamics.step import step
from ..solver.fused import make_fused_optimise
from ..solver.ilqr import ILQRConfig
from ..tasks.base import Task, control_limits


class MPCRunResult(NamedTuple):
    qpos_hist: jnp.ndarray    # (n_steps+1, nq)
    qvel_hist: jnp.ndarray    # (n_steps+1, nv)
    ctrl_hist: jnp.ndarray    # (n_steps, nu)
    cost_hist: jnp.ndarray    # (n_steps,) running task cost of visited states
    replan_costs: jnp.ndarray # (n_replans,) optimiser final costs


def make_sync_mpc(
    task: Task,
    cfg: ILQRConfig,
    horizon: int,
    num_apply: int,
    noise_pct: float = 5.0,
):
    """Build mpc_run(qpos0, qvel0, U_init, n_replans, key) -> MPCRunResult."""
    model = task.model
    mpc_cfg = cfg.replace(max_iterations=1, min_iterations=1)
    optimise = make_fused_optimise(task, mpc_cfg, horizon)
    limits = control_limits(task)
    rng_width = limits[:, 1] - limits[:, 0]
    # unlimited actuators have infinite range: no range-scaled noise
    rng_width = jnp.where(jnp.isfinite(rng_width), rng_width, 0.0)
    noise_std = rng_width / 100.0 * noise_pct

    def one_replan(carry, _):
        qpos, qvel, U, key = carry
        res = optimise(qpos, qvel, U)
        U_new = res.traj.ctrl

        def apply_step(c, t):
            qp, qv, key = c
            key, sub = jax.random.split(key)
            u = U_new[t] + noise_std * jax.random.normal(
                sub, (model.nu,), qp.dtype
            )
            u = jnp.clip(u, limits[:, 0], limits[:, 1])
            data = Data(qpos=qp, qvel=qv, ctrl=u, time=jnp.zeros((), qp.dtype))
            out = step(model, data)
            r = task.residual_fn(model, out, task.residual_targets)
            c_t = jnp.sum(task.weights * r * r)
            return (out.qpos, out.qvel, key), (qp, qv, u, c_t)

        (qpos, qvel, key), (qps, qvs, us, costs) = jax.lax.scan(
            apply_step, (qpos, qvel, key), jnp.arange(num_apply)
        )
        # shift consumed controls, pad with last (main.cpp:663-669)
        U_shift = jnp.concatenate(
            [U_new[num_apply:], jnp.tile(U_new[-1:], (num_apply, 1))], axis=0
        )
        return (qpos, qvel, U_shift, key), (qps, qvs, us, costs, res.final_cost)

    def mpc_run(qpos0, qvel0, U_init, n_replans: int, key) -> MPCRunResult:
        (qpos, qvel, _, _), (qps, qvs, us, costs, rcosts) = jax.lax.scan(
            one_replan, (qpos0, qvel0, U_init, key), None, length=n_replans
        )
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        return MPCRunResult(
            qpos_hist=jnp.concatenate([flat(qps), qpos[None]], axis=0),
            qvel_hist=jnp.concatenate([flat(qvs), qvel[None]], axis=0),
            ctrl_hist=flat(us),
            cost_hist=flat(costs),
            replan_costs=rcosts,
        )

    return mpc_run


def gravity_compensation_ctrl(task: Task, data: Data) -> jnp.ndarray:
    """Hold-position fallback controls from the bias force
    (`MuJoCoHelper.cpp:200-232` GetRobotJointsGravityCompensationControls)."""
    model = task.model
    u = []
    for a in range(model.nu):
        j = model.actuator_trnid[a]
        dadr = model.jnt_dofadr[j]
        u.append(data.qfrc_bias[dadr] / model.actuator_gear[a, 0])
    return jnp.stack(u)
