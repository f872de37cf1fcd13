"""Walker lane sync-MPC host-driven probe: compile + ms/replan per horizon."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import sys, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from trajoptkp_tpu.config.loader import make_task
from trajoptkp_tpu.solver.ilqr import ILQRConfig
from trajoptkp_tpu.solver.lanes import lane_solver_supported
from trajoptkp_tpu.mpc.sync import make_lane_sync_mpc_host

H = int(sys.argv[1]) if len(sys.argv) > 1 else 20
n_replans = int(sys.argv[2]) if len(sys.argv) > 2 else 50
unroll = int(sys.argv[3]) if len(sys.argv) > 3 else 1
newton_unroll = int(sys.argv[4]) if len(sys.argv) > 4 else 1

dtype = jnp.float32
task = make_task("walker_run", dtype=dtype)
task = task.replace(
    keypoint_cfg=task.keypoint_cfg.replace(name="set_interval", min_N=1))
print("lane supported:", lane_solver_supported(task), "nq", task.model.nq,
      "nv", task.model.nv, "nu", task.model.nu, flush=True)
cfg = ILQRConfig(max_iterations=1, min_iterations=1,
                 lane_scan_unroll=unroll,
                 lane_newton_unroll=newton_unroll)
mpc = make_lane_sync_mpc_host(task, cfg, H, num_apply=1)
U0 = jnp.zeros((1, H, task.model.nu), dtype)
key = jax.random.PRNGKey(0)
args = (task.qpos_start[None], task.qvel_start[None], U0,
        task.residual_targets[None])
t0 = time.perf_counter()
res = mpc(*args, 3, key)
jax.block_until_ready(res.qpos_hist)
print(f"H={H} u={unroll} nu={newton_unroll}: compile+3 replans {time.perf_counter()-t0:.1f}s", flush=True)
res = mpc(*args, n_replans, key)
ts = np.array(mpc.last_replan_ms)
print(f"H={H} u={unroll} nu={newton_unroll}: n={n_replans} mean {ts[1:].mean():.2f} ms/replan "
      f"(median {np.median(ts[1:]):.2f}, first {ts[0]:.2f}) -> "
      f"{1e3/ts[1:].mean():.0f} Hz", flush=True)
print("mean cost", float(res.cost_hist.mean()), flush=True)
