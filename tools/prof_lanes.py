"""Lane solver parity vs batched phase solver (CPU f64, acrobot)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import sys, time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from trajoptkp_tpu.solver.lanes import make_lane_batch_optimise
from trajoptkp_tpu.solver.batched import make_batched_phase_optimise
from trajoptkp_tpu.solver.ilqr import ILQRConfig
from trajoptkp_tpu.tasks.toys import make_acrobot

dtype = jnp.float64
task = make_acrobot(dtype=dtype)
task = task.replace(keypoint_cfg=task.keypoint_cfg.replace(name="set_interval", min_N=1))
H = 500
cfg = ILQRConfig(max_iterations=10, min_iterations=10, deriv_mode="ad_time", deriv_chunk=64)
B = 8
key = jax.random.PRNGKey(0)
qpB = task.qpos_start + 0.3 * jax.random.normal(key, (B, task.model.nq), dtype)
qvB = jnp.zeros((B, task.model.nv), dtype)
UB = jnp.zeros((B, H, task.model.nu), dtype)
tgB = jnp.tile(task.residual_targets, (B, 1))
lane = jax.jit(make_lane_batch_optimise(task, cfg, H))
res = lane(qpB, qvB, UB, tgB)
ref = make_batched_phase_optimise(task, cfg, H, batch_size=B)(qpB, qvB, UB, tgB)
r1 = np.asarray(res.cost_reduction); r2 = np.asarray(ref.cost_reduction)
print("lane:", np.round(r1, 5))
print("ref :", np.round(r2, 5))
print("max |diff|:", np.max(np.abs(r1 - r2)))
