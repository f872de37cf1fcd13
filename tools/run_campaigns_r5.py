"""Round-5 committed campaign artifacts (runs on the TPU, sequential)."""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np

from trajoptkp_tpu.config.loader import make_task, load_scenes_for_task
from trajoptkp_tpu.solver.ilqr import ILQRConfig

stamp = time.strftime("%Y%m%d_%H%M")

# ---- 1. walker_run sync-MPC replan-rate table (VERDICT ask #2) ----------
from trajoptkp_tpu.bench.campaigns import sync_mpc_horizon_sweep

task = make_task("walker_run", dtype=jnp.float32)
task = task.replace(
    keypoint_cfg=task.keypoint_cfg.replace(name="set_interval", min_N=1))
cfg = ILQRConfig(max_iterations=1, min_iterations=1)
out = f"TestingData/walker_run_sync_mpc_{stamp}"
rows = sync_mpc_horizon_sweep(
    task, cfg, [20, 30, 50, 80], n_replans=200, num_apply=1, out_dir=out)
print("WALKER", rows, flush=True)

# ---- 2. acrobot open-loop multi-method campaign (VERDICT ask #3) --------
from trajoptkp_tpu.bench.harness import openloop_multi_method

task = make_task("acrobot", dtype=jnp.float32)
qpos, qvel, targets = load_scenes_for_task(
    task, "/root/reference/TestTasks/acrobot", 100)
H = task.openloop_horizon
U = np.zeros((100, H, task.model.nu))
cfg = ILQRConfig(max_iterations=10, min_iterations=10, deriv_mode="ad_time")
out = f"TestingData/acrobot_openloop_{stamp}"
res = openloop_multi_method(task, qpos, qvel, targets, U, cfg=cfg,
                            out_dir=out)
print("ACROBOT", {m: len(r) for m, r in res.items()}, flush=True)

# ---- 3. async-MPC campaign artifact (VERDICT ask #7) --------------------
from trajoptkp_tpu.bench.campaigns import async_mpc_campaign

task = make_task("pushing_no_clutter", dtype=jnp.float32)
qpos, _, _ = load_scenes_for_task(
    task, "/root/reference/TestTasks/push_ncl", 25)
cfg = ILQRConfig(max_iterations=1, min_iterations=1, deriv_mode="ad_time")
out = f"TestingData/push_ncl_async_mpc_{stamp}"
rows = async_mpc_campaign(task, cfg, np.asarray(qpos), task.mpc_horizon,
                          max_steps=400, out_dir=out)
comp = sum(r["task_complete"] for r in rows)
print("ASYNC", len(rows), "trials,", comp, "complete,",
      "mean episode cost",
      float(np.nanmean([r["episode_cost"] for r in rows])), flush=True)
print("ALLDONE", flush=True)
