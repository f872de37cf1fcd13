"""Per-phase compile+run timing for push_ncl lane SI_1, H=1000."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import sys, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from trajoptkp_tpu.app import _batch_init_controls
from trajoptkp_tpu.config.loader import load_scenes_for_task, make_task
from trajoptkp_tpu.solver.ilqr import ILQRConfig
from trajoptkp_tpu.solver.lanes import make_lane_batch_optimise

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100
H = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
method_minN = int(sys.argv[3]) if len(sys.argv) > 3 else 1

dtype = jnp.float32
t0 = time.perf_counter()
task = make_task("pushing_no_clutter", dtype=dtype)
task = task.replace(keypoint_cfg=task.keypoint_cfg.replace(
    name="set_interval", min_N=method_minN))
print(f"make_task {time.perf_counter()-t0:.1f}s  nq={task.model.nq} "
      f"nv={task.model.nv} nu={task.model.nu} ndof={task.sv.ndof}", flush=True)
t0 = time.perf_counter()
qpos, qvel, targets = load_scenes_for_task(
    task, "/root/reference/TestTasks/push_ncl", N)
print(f"load_scenes {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
qpos, qvel, U = _batch_init_controls(task, H, qpos, qvel, targets)
print(f"init_controls {time.perf_counter()-t0:.1f}s", flush=True)

cfg = ILQRConfig(max_iterations=10, min_iterations=10)
ph = make_lane_batch_optimise(task, cfg, H).phases
qp0 = jnp.asarray(qpos, dtype).T
qv0 = jnp.asarray(qvel, dtype).T
U0 = jnp.asarray(U, dtype).transpose(1, 2, 0)
tg = jnp.asarray(targets, dtype).T

t0 = time.perf_counter()
rollout_j = jax.jit(ph["rollout"])
qpos_t, qvel_t, costs = rollout_j(qp0, qv0, U0, tg)
jax.block_until_ready(costs)
print(f"rollout compile+run {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
qpos_t, qvel_t, costs = rollout_j(qp0, qv0, U0, tg)
jax.block_until_ready(costs)
print(f"rollout run {time.perf_counter()-t0:.2f}s", flush=True)

t0 = time.perf_counter()
jac_j = jax.jit(ph["jacobians"])
A, Bm, pct, ovf = jac_j(qpos_t, qvel_t, U0)
jax.block_until_ready(A)
print(f"jac compile+run {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
A, Bm, pct, ovf = jac_j(qpos_t, qvel_t, U0)
jax.block_until_ready(A)
print(f"jac run {time.perf_counter()-t0:.2f}s", flush=True)

t0 = time.perf_counter()
cost_j = jax.jit(ph["cost_expansion"])
lx, lxx, lu, luu = cost_j(qpos_t, qvel_t, U0, tg)
jax.block_until_ready(lx)
print(f"cost compile+run {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
bp_j = jax.jit(ph["bp"])
lamb = jnp.full((N,), cfg.lambda_init, dtype)
k, K, dJ, lamb2, ex = bp_j(A, Bm, lx, lxx, lu, luu, lamb)
jax.block_until_ready(k)
print(f"bp compile+run {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
k, K, dJ, lamb2, ex = bp_j(A, Bm, lx, lxx, lu, luu, lamb)
jax.block_until_ready(k)
print(f"bp run {time.perf_counter()-t0:.2f}s", flush=True)

t0 = time.perf_counter()
fp_j = jax.jit(ph["fp"])
old = jnp.sum(costs, axis=0)
qn, vn, un, acc, best = fp_j(qpos_t, qvel_t, U0, old, k, K, tg)
jax.block_until_ready(best)
print(f"fp compile+run {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
qn, vn, un, acc, best = fp_j(qpos_t, qvel_t, U0, old, k, K, tg)
jax.block_until_ready(best)
print(f"fp run {time.perf_counter()-t0:.2f}s", flush=True)
print("done", flush=True)
