"""Compile each lane-solver phase separately (push_ncl) to find the slow one."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

if len(sys.argv) > 4 and sys.argv[4] == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from trajoptkp_tpu.config.loader import make_task
from trajoptkp_tpu.solver.ilqr import ILQRConfig
from trajoptkp_tpu.solver import lanes as SL

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
H = int(sys.argv[2]) if len(sys.argv) > 2 else 200
min_N = int(sys.argv[3]) if len(sys.argv) > 3 else 1

dtype = jnp.float32
task = make_task("pushing_no_clutter", dtype=dtype)
task = task.replace(keypoint_cfg=task.keypoint_cfg.replace(name="set_interval", min_N=min_N))
cfg = ILQRConfig(max_iterations=10, min_iterations=10)

# rebuild internals by instantiating the builder and reaching its closures
# via a tiny shim: re-create the same functions here
model, sv = task.model, task.sv
nq, nv, nu = model.nq, model.nv, model.nu
n = sv.ndof
B = N

import trajoptkp_tpu.solver.lanes as L
run = L.make_lane_batch_optimise(task, cfg, H)

# phase handles via the module-level builders
from trajoptkp_tpu.dynamics.lanes import build_smooth_step
step_fk = build_smooth_step(model, want_fk=True)

def timeit_compile(label, fn, *args):
    t0 = time.perf_counter()
    out = jax.jit(fn).lower(*args).compile()
    print(f"{label}: compile {time.perf_counter()-t0:.0f}s", flush=True)
    return out

qp = jnp.zeros((nq, B), dtype); qv = jnp.zeros((nv, B), dtype)
u = jnp.zeros((nu, B), dtype)
timeit_compile("step_fk (B lanes)", step_fk, qp, qv, u)
qp6 = jnp.zeros((nq, 6, B), dtype); qv6 = jnp.zeros((nv, 6, B), dtype)
u6 = jnp.zeros((nu, 6, B), dtype)
timeit_compile("step_fk (6xB lanes)", step_fk, qp6, qv6, u6)

# jacfwd of the plain step at K*B lanes
step_plain = build_smooth_step(model)
K_ = len(L._si_keypoint_times(H, min_N))
qpk = jnp.zeros((nq, K_, B), dtype); qvk = jnp.zeros((nv, K_, B), dtype)
uk = jnp.zeros((nu, K_, B), dtype)
def jac(qp_f, qv_f, u_f):
    def g(z):
        dq = jnp.zeros((nv,), dtype).at[jnp.array(list(sv.order))].set(z[:n])
        qp2, qv2 = step_plain(qp_f + dq[:, None, None] * 0 + dq[:nq].reshape(nq,1,1)*0 + dq.reshape(nv,1,1)*0.0 if False else qp_f, qv_f, u_f)
        return qp2
    return jax.jacfwd(lambda z: step_plain(qp_f, qv_f + z[:nv].reshape(nv,1,1), uk)[1])(jnp.zeros((2*n+nu,), dtype))
timeit_compile("jacfwd step (KxB lanes)", jac, qpk, qvk, uk)
print("done", flush=True)
