"""Lane-solver push_ncl run: quality + speed on N ref scenes (SI_1)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from trajoptkp_tpu.app import _batch_init_controls
from trajoptkp_tpu.config.loader import load_scenes_for_task, make_task
from trajoptkp_tpu.solver.ilqr import ILQRConfig
from trajoptkp_tpu.solver.lanes import make_lane_phase_optimise

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100
H = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

dtype = jnp.float32
task = make_task("pushing_no_clutter", dtype=dtype)
task = task.replace(
    keypoint_cfg=task.keypoint_cfg.replace(name="set_interval", min_N=1))
cfg = ILQRConfig(max_iterations=10, min_iterations=10)

qpos, qvel, targets = load_scenes_for_task(
    task, "/root/reference/TestTasks/push_ncl", N)
qpos, qvel, U = _batch_init_controls(task, H, qpos, qvel, targets)
run = make_lane_phase_optimise(task, cfg, H)
args = (jnp.asarray(qpos, dtype), jnp.asarray(qvel, dtype),
        jnp.asarray(U, dtype), jnp.asarray(targets, dtype))
res = run(*args)
jax.block_until_ready(res.final_cost)
t0 = time.perf_counter()
res = run(*args)
jax.block_until_ready(res.final_cost)
dt_s = time.perf_counter() - t0
red = np.asarray(res.cost_reduction)
print(f"N={N} H={H} batch_s={dt_s:.2f} solves/s={N/dt_s:.2f}")
print(f"cost_reduction mean={red.mean():.4f} median={np.median(red):.4f} "
      f"min={red.min():.4f} max={red.max():.4f}")
print("init:", np.asarray(res.initial_cost)[:8].round(2))
print("final:", np.asarray(res.final_cost)[:8].round(2))
