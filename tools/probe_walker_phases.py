"""Per-phase latency at walker MPC scale (B=1): which phase eats the 83 ms?

Usage: probe_walker_phases.py [H] [unroll] [newton_unroll]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # repo root
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from trajoptkp_tpu.config.loader import make_task
from trajoptkp_tpu.solver.ilqr import ILQRConfig
from trajoptkp_tpu.solver.lanes import make_lane_batch_optimise

H = int(sys.argv[1]) if len(sys.argv) > 1 else 20
unroll = int(sys.argv[2]) if len(sys.argv) > 2 else 1
newton_unroll = int(sys.argv[3]) if len(sys.argv) > 3 else 1

dtype = jnp.float32
task = make_task("walker_run", dtype=dtype)
task = task.replace(
    keypoint_cfg=task.keypoint_cfg.replace(name="set_interval", min_N=1))
cfg = ILQRConfig(max_iterations=1, min_iterations=1,
                 lane_scan_unroll=unroll, lane_newton_unroll=newton_unroll)
ph = make_lane_batch_optimise(task, cfg, H).phases
m = task.model
B = 1
qp0 = task.qpos_start[:, None].astype(dtype)
qv0 = task.qvel_start[:, None].astype(dtype)
U0 = jnp.zeros((H, m.nu, B), dtype)
tg = task.residual_targets[:, None].astype(dtype)
n = task.sv.ndof


def timeit(name, f, *args):
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(30):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name}: compile {compile_s:.1f}s, run "
          f"{np.median(ts)*1e3:.2f} ms (min {min(ts)*1e3:.2f})", flush=True)
    return out


rollout_j = jax.jit(ph["rollout"])
qpos, qvel, costs = timeit("rollout", rollout_j, qp0, qv0, U0, tg)
jac_j = jax.jit(ph["jacobians"])
A, Bm, pct, ovf = timeit("jac", jac_j, qpos, qvel, U0)
cost_j = jax.jit(ph["cost_expansion"])
lx, lxx, lu, luu = timeit("cost", cost_j, qpos, qvel, U0, tg)
bp_j = jax.jit(ph["bp"])
lamb = jnp.full((B,), cfg.lambda_init, dtype)
k, K, dJ, lamb2, ex = timeit("bp", bp_j, A, Bm, lx, lxx, lu, luu, lamb)
fp_j = jax.jit(ph["fp"])
old = jnp.sum(costs, axis=0)
timeit("fp", fp_j, qpos, qvel, U0, old, k, K, tg)
print("done", flush=True)
