"""Extra campaign modes: MPC sweeps, async-MPC trials, derivative dumps.

Completes the GenTestingData surface
(`/root/reference/src/GenTestingData.cpp`):
  - sync-MPC horizon sweep (GenDataMPCHorizons, `:275-326`; the walker
    replan-rate table in BASELINE.md)
  - async-MPC trial campaign (GenDataAsyncMPC/TestingMPC/SingleMPCRun,
    `:261-273,328-420,422-601`)
  - dynamics-derivative dataset dumps (GenerateDynamicsDerivsData,
    `:753-812`; A/B/X/U CSVs as FileHandler.cpp:312-383 writes)
"""

from __future__ import annotations

import os
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..solver.fused import make_fused_optimise
from ..solver.ilqr import ILQRConfig, Trajectory, compute_derivatives
from ..tasks.base import Task


def sync_mpc_horizon_sweep(
    task: Task,
    cfg: ILQRConfig,
    horizons: Sequence[int],
    n_replans: int = 100,
    out_dir: Optional[str] = None,
):
    """Replan-time vs horizon (the BASELINE.md walker table).

    Per horizon: jit one fused 1-iteration replan, run `n_replans` back to
    back from the evolving state, report mean wall per replan.
    """
    rows = []
    dtype = task.model.dtype
    for H in horizons:
        mpc_cfg = cfg.replace(max_iterations=1, min_iterations=1)
        replan = jax.jit(make_fused_optimise(task, mpc_cfg, H))
        qpos, qvel = task.qpos_start, task.qvel_start
        U = jnp.zeros((H, task.model.nu), dtype)
        res = replan(qpos, qvel, U)  # compile
        jax.block_until_ready(res)
        t0 = time.perf_counter()
        for _ in range(n_replans):
            res = replan(qpos, qvel, U)
            U = res.traj.ctrl
            jax.block_until_ready(U)
        ms = (time.perf_counter() - t0) / n_replans * 1e3
        rows.append({
            "horizon": H,
            "opt_time_ms": ms,
            "replan_rate_hz": 1e3 / ms,
        })
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "mpc_horizons.csv"), "w") as f:
            f.write("horizon,opt_time_ms,replan_rate_hz\n")
            for r in rows:
                f.write(
                    f"{r['horizon']},{r['opt_time_ms']:.4g},"
                    f"{r['replan_rate_hz']:.4g}\n"
                )
    return rows


def async_mpc_campaign(
    task: Task,
    cfg: ILQRConfig,
    scenes_qpos: np.ndarray,
    horizon: int,
    max_steps: int = 1000,
    out_dir: Optional[str] = None,
    realtime: bool = False,
):
    """Async-MPC trials over scenes (TestingMPC/SingleMPCRun analogue).

    Each trial runs the planner-thread + actor-loop pair; records steps to
    completion, final task distance, mean replan time.
    """
    from ..mpc.async_mpc import AsyncMPC
    from ..dynamics.fk import forward_kinematics
    from ..dynamics.model import Data

    rows = []
    dtype = task.model.dtype
    for i, qpos0 in enumerate(scenes_qpos):
        t = task.replace(qpos_start=jnp.asarray(qpos0, dtype))
        runner = AsyncMPC(t, cfg, horizon, realtime=realtime, seed=i)
        U0 = jnp.zeros((horizon, task.model.nu), dtype)
        t0 = time.perf_counter()
        qpos_hist, u_hist = runner.run(U0, max_steps=max_steps)
        wall = time.perf_counter() - t0
        dist = float("nan")
        if task.task_complete_fn is not None and len(qpos_hist):
            d = Data(
                qpos=jnp.asarray(qpos_hist[-1], dtype),
                qvel=jnp.zeros((task.model.nv,), dtype),
                ctrl=jnp.zeros((task.model.nu,), dtype),
                time=jnp.zeros((), dtype),
            )
            d = forward_kinematics(task.model, d)
            _, dd = task.task_complete_fn(
                task.model, d, t.residual_targets
            )
            dist = float(dd)
        rows.append({
            "trial": i,
            "steps": len(u_hist),
            "wall_s": wall,
            "replans": len(runner.replan_times_ms),
            "mean_replan_ms": float(np.mean(runner.replan_times_ms))
            if runner.replan_times_ms else float("nan"),
            "final_dist": dist,
        })
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "async_mpc.csv"), "w") as f:
            f.write("trial,steps,wall_s,replans,mean_replan_ms,final_dist\n")
            for r in rows:
                f.write(
                    f"{r['trial']},{r['steps']},{r['wall_s']:.4g},"
                    f"{r['replans']},{r['mean_replan_ms']:.4g},"
                    f"{r['final_dist']:.4g}\n"
                )
    return rows


def dump_derivatives(
    task: Task,
    traj: Trajectory,
    out_dir: str,
    cfg: Optional[ILQRConfig] = None,
):
    """A/B/X/U CSV dumps (SaveMatricesToCSV, FileHandler.cpp:312-383;
    Generate_dynamics_data mode): one row per timestep, matrices flattened
    row-major."""
    cfg = cfg or ILQRConfig()
    H = traj.ctrl.shape[0]
    n = task.sv.ndof
    mask = jnp.ones((H, n), dtype=bool)
    A, B, *_ = compute_derivatives(
        task, traj, mask, H * n, mode=cfg.deriv_mode, fd_eps=cfg.fd_eps
    )
    os.makedirs(out_dir, exist_ok=True)

    def write(name, arr):
        arr = np.asarray(arr)
        flat = arr.reshape(arr.shape[0], -1)
        with open(os.path.join(out_dir, f"{name}.csv"), "w") as f:
            for row in flat:
                f.write(",".join(f"{v:.10g}" for v in row) + "\n")

    write("A_matrices", A)
    write("B_matrices", B)
    write("X_trajectory", traj.qpos[:H])
    write("V_trajectory", traj.qvel[:H])
    write("U_trajectory", traj.ctrl)
    return out_dir
