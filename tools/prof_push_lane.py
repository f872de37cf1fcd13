"""Lane solver on push_ncl (TPU): compile time + throughput + reduction."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from trajoptkp_tpu.config.loader import make_task, load_scenes_for_task
from trajoptkp_tpu.solver.ilqr import ILQRConfig
from trajoptkp_tpu.solver.lanes import (make_lane_batch_optimise,
    make_lane_phase_optimise, lane_solver_supported)
from trajoptkp_tpu.app import _batch_init_controls

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
H = int(sys.argv[2]) if len(sys.argv) > 2 else 200
min_N = int(sys.argv[3]) if len(sys.argv) > 3 else 1

dtype = jnp.float32
task = make_task("pushing_no_clutter", dtype=dtype)
task = task.replace(
    keypoint_cfg=task.keypoint_cfg.replace(name="set_interval", min_N=min_N)
)
print("lane supported:", lane_solver_supported(task), flush=True)
qpos, qvel, targets = load_scenes_for_task(
    task, "/root/reference/TestTasks/push_ncl", N)
t0 = time.perf_counter()
qpos, qvel, U = _batch_init_controls(task, H, qpos, qvel, targets)
print(f"init controls {time.perf_counter()-t0:.0f}s", flush=True)

cfg = ILQRConfig(max_iterations=10, min_iterations=10)
mode = sys.argv[4] if len(sys.argv) > 4 else 'phases'
run = (make_lane_phase_optimise(task, cfg, H) if mode == 'phases'
       else jax.jit(make_lane_batch_optimise(task, cfg, H)))
args = (jnp.asarray(qpos, dtype), jnp.asarray(qvel, dtype),
        jnp.asarray(U, dtype), jnp.asarray(targets, dtype))
t0 = time.perf_counter()
res = run(*args)
jax.block_until_ready(res.final_cost)
print(f"compile+first run: {time.perf_counter()-t0:.0f}s", flush=True)
t0 = time.perf_counter()
res = run(*args)
jax.block_until_ready(res.final_cost)
wall = time.perf_counter() - t0
print(f"lane push N={N} H={H} SI_{min_N}: batch {wall*1e3:.0f} ms -> "
      f"{N/wall:.2f} solves/s, per-solve {wall/N*1e3:.0f} ms, "
      f"mean reduction {float(res.cost_reduction.mean()):.3f}", flush=True)
print("reductions:", np.round(np.asarray(res.cost_reduction), 3), flush=True)
