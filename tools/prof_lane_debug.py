"""Compare lane-solver intermediates vs generic path on push (CPU f64, tiny)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp

from trajoptkp_tpu.config.loader import make_task, load_scenes_for_task
from trajoptkp_tpu.solver.ilqr import (ILQRConfig, rollout as g_rollout,
    compute_derivatives, _deriv_budget)
from trajoptkp_tpu.keypoints.methods import generate_keypoints
from trajoptkp_tpu.solver.lanes import make_lane_batch_optimise

dtype = jnp.float64
task = make_task("pushing_no_clutter", dtype=dtype)
task = task.replace(keypoint_cfg=task.keypoint_cfg.replace(name="set_interval", min_N=5))
H, B = 30, 2
cfg = ILQRConfig(max_iterations=3, min_iterations=3, deriv_mode="ad_time")
qpos, qvel, targets = load_scenes_for_task(task, "/root/reference/TestTasks/push_ncl", B)
U0 = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (B, H, task.model.nu), dtype)

inner = make_lane_batch_optimise(task, cfg, H)
ph = inner.phases
qp0 = jnp.asarray(qpos).T; qv0 = jnp.asarray(qvel).T
U = jnp.asarray(U0).transpose(1, 2, 0); tg = jnp.asarray(targets).T

t0 = time.perf_counter()
qpos_l, qvel_l, costs_l = jax.jit(ph["rollout"])(qp0, qv0, U, tg)
print(f"rollout {time.perf_counter()-t0:.0f}s; lane costs:", np.asarray(costs_l.sum(0)), flush=True)

# generic rollout comparison (scene 0)
t_g = g_rollout(task.replace(residual_targets=jnp.asarray(targets[0])),
                jnp.asarray(qpos[0]), jnp.asarray(qvel[0]), jnp.asarray(U0[0]))
print("generic cost scene0:", float(t_g.total_cost), flush=True)
np.testing.assert_allclose(np.asarray(qpos_l[..., 0]), np.asarray(t_g.qpos), atol=1e-9)
print("rollout trajectories MATCH", flush=True)

# jacobians
t0 = time.perf_counter()
A_l, B_l = jax.jit(ph["jacobians"])(qpos_l, qvel_l, U)
print(f"lane jacobians {time.perf_counter()-t0:.0f}s", flush=True)
sv_idx = jnp.array(task.sv.order)
mask = generate_keypoints(task.keypoint_cfg, t_g.qvel[:H][:, sv_idx], task.model.timestep)
budget = _deriv_budget(task.keypoint_cfg, H, task.sv.ndof, None)
tk = task.replace(residual_targets=jnp.asarray(targets[0]))
A_g, B_g, lx_g, lxx_g, lu_g, luu_g, _ = compute_derivatives(tk, t_g, mask, budget, mode="ad_time")
dA = np.max(np.abs(np.asarray(A_l[..., 0]) - np.asarray(A_g)))
dB = np.max(np.abs(np.asarray(B_l[..., 0]) - np.asarray(B_g)))
print("max |dA|:", dA, " max |dB|:", dB, flush=True)

# cost expansion
l_x, l_xx, l_u, l_uu = jax.jit(ph["cost_expansion"])(qpos_l, qvel_l, U, tg)
print("max |dl_x|:", np.max(np.abs(np.asarray(l_x[..., 0]) - np.asarray(lx_g))),
      " |dl_xx|:", np.max(np.abs(np.asarray(l_xx[..., 0]) - np.asarray(lxx_g))),
      " |dl_u|:", np.max(np.abs(np.asarray(l_u[..., 0]) - np.asarray(lu_g))), flush=True)
