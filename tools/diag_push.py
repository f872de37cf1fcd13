"""Round-4 diagnostic: bisect the push_ncl cost-reduction failure.

Runs ONE reference scene through the optimisation pipeline under several
configs and prints per-iteration cost traces.

Usage: python diag_push.py <mode>
  modes:
    f32_tpu_ad_time    - bench config (broken: 0.02)
    f32_tpu_fd         - fd derivs on tpu
    f64_cpu_ad_time    - f64 CPU reference run (slow)
    f32_tpu_si1        - bench config but set_interval min_N=1
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import sys
import os

mode = sys.argv[1] if len(sys.argv) > 1 else "f32_tpu_ad_time"
n_scenes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
H = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

if mode.startswith("f64_cpu"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_enable_x64", True)
else:
    import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from trajoptkp_tpu.app import _batch_init_controls
from trajoptkp_tpu.config.loader import load_scenes_for_task, make_task
from trajoptkp_tpu.solver.ilqr import ILQRConfig, optimise

dtype = jnp.float64 if mode.startswith("f64") else jnp.float32
task = make_task("pushing_no_clutter", dtype=dtype)
if "si1" in mode:
    task = task.replace(
        keypoint_cfg=task.keypoint_cfg.replace(name="set_interval", min_N=1))

deriv_mode = "fd" if mode.endswith("_fd") else "ad_time"
cfg = ILQRConfig(max_iterations=10, min_iterations=10, deriv_mode=deriv_mode)

qpos, qvel, targets = load_scenes_for_task(
    task, "/root/reference/TestTasks/push_ncl", n_scenes)
qpos, qvel, U = _batch_init_controls(task, H, qpos, qvel, targets)

print(f"mode={mode} dtype={dtype} deriv={deriv_mode} kp={task.keypoint_cfg.name}")
print("post-setup qpos[0][:9]:", np.asarray(qpos[0][:9]).round(4))
for i in range(n_scenes):
    t = task.replace(residual_targets=jnp.asarray(targets[i], dtype))
    traj, stats = optimise(
        t, jnp.asarray(qpos[i], dtype), jnp.asarray(qvel[i], dtype),
        jnp.asarray(U[i], dtype), cfg, verbose=True)
    print(f"scene {i}: init {stats.initial_cost:.4f} final {stats.final_cost:.4f} "
          f"red {stats.cost_reduction:.4f} alphas {stats.best_alphas}")
