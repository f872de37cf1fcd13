"""Count StableHLO ops of each lane phase at push scale (no device work)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import time
import jax, jax.numpy as jnp
from trajoptkp_tpu.config.loader import make_task
from trajoptkp_tpu.solver.ilqr import ILQRConfig
from trajoptkp_tpu.solver.lanes import make_lane_batch_optimise

H, B = int(_sys.argv[1]) if len(_sys.argv) > 1 else 1000, 100
dtype = jnp.float32
task = make_task("pushing_no_clutter", dtype=dtype)
task = task.replace(keypoint_cfg=task.keypoint_cfg.replace(
    name="set_interval", min_N=1))
cfg = ILQRConfig(max_iterations=10, min_iterations=10)
ph = make_lane_batch_optimise(task, cfg, H).phases
m = task.model
nq, nv, nu, n = m.nq, m.nv, m.nu, task.sv.ndof

import numpy as np
qpos = jax.ShapeDtypeStruct((H + 1, nq, B), jnp.float32)
qvel = jax.ShapeDtypeStruct((H + 1, nv, B), jnp.float32)
U = jax.ShapeDtypeStruct((H, nu, B), jnp.float32)
tg = jax.ShapeDtypeStruct((task.residual_targets.shape[0], B), jnp.float32)
A = jax.ShapeDtypeStruct((H, 2 * n, 2 * n, B), jnp.float32)
Bm = jax.ShapeDtypeStruct((H, 2 * n, nu, B), jnp.float32)
lx = jax.ShapeDtypeStruct((H, 2 * n, B), jnp.float32)
lxx = jax.ShapeDtypeStruct((H, 2 * n, 2 * n, B), jnp.float32)
lu = jax.ShapeDtypeStruct((H, nu, B), jnp.float32)
luu = jax.ShapeDtypeStruct((H, nu, nu, B), jnp.float32)
lamb = jax.ShapeDtypeStruct((B,), jnp.float32)
qp0 = jax.ShapeDtypeStruct((nq, B), jnp.float32)
qv0 = jax.ShapeDtypeStruct((nv, B), jnp.float32)
kk = jax.ShapeDtypeStruct((H, nu, B), jnp.float32)
KK = jax.ShapeDtypeStruct((H, nu, 2 * n, B), jnp.float32)
cost = jax.ShapeDtypeStruct((B,), jnp.float32)

for name, fn, args in [
    ("rollout", ph["rollout"], (qp0, qv0, U, tg)),
    ("jacobians", ph["jacobians"], (qpos, qvel, U)),
    ("cost_expansion", ph["cost_expansion"], (qpos, qvel, U, tg)),
    ("bp", ph["bp"], (A, Bm, lx, lxx, lu, luu, lamb)),
    ("fp", ph["fp"], (qpos, qvel, U, cost, kk, KK, tg)),
]:
    t0 = time.perf_counter()
    low = jax.jit(fn).lower(*args)
    txt = low.as_text()
    t1 = time.perf_counter()
    nops = txt.count("\n")
    print(f"{name}: trace+lower {t1-t0:.1f}s, stablehlo lines {nops}",
          flush=True)
