"""Phase-level timing of the push_ncl N=100 batched workload on TPU."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import time
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from trajoptkp_tpu.config.loader import make_task, load_scenes_for_task
from trajoptkp_tpu.solver.ilqr import ILQRConfig
from trajoptkp_tpu.solver import batched as sb
from trajoptkp_tpu.app import _batch_init_controls

import os, sys
dtype = jnp.float32
task = make_task("pushing_no_clutter", dtype=dtype)
H, N = 1000, 100
DERIV = sys.argv[1] if len(sys.argv) > 1 else "ad_time"
MINN = int(sys.argv[2]) if len(sys.argv) > 2 else 1
if MINN != 1:
    task = task.replace(keypoint_cfg=task.keypoint_cfg.replace(min_N=MINN))
cfg = ILQRConfig(max_iterations=10, min_iterations=10, deriv_mode=DERIV)
qpos, qvel, targets = load_scenes_for_task(task, "/root/reference/TestTasks/push_ncl", N)
qpos, qvel, U = _batch_init_controls(task, H, qpos, qvel, targets)

# rebuild the phase fns like make_batched_phase_optimise does
from trajoptkp_tpu.derivs.fd import default_chunk_size
cfg = cfg.replace(deriv_chunk=max(8, default_chunk_size(task.model) // N))
print("deriv_chunk:", cfg.deriv_chunk)
model, sv = task.model, task.sv
from trajoptkp_tpu.keypoints.methods import generate_keypoints
from trajoptkp_tpu.solver.ilqr import (_deriv_budget, backward_pass_lambda_loop,
    compute_derivatives, default_alphas, forward_pass, rollout)
budget = _deriv_budget(task.keypoint_cfg, H, sv.ndof, None)
kp_cfg = task.keypoint_cfg
alphas = default_alphas(cfg.num_parallel_rollouts, dtype)
sv_idx = jnp.array(sv.order)
dt = model.timestep
print("kp method:", kp_cfg.name, "budget:", budget, "ndof:", sv.ndof)

def with_targets(t):
    return task.replace(residual_targets=t)

@jax.jit
def rollout_b(qp, qv, U, tg):
    return jax.vmap(lambda a, b, c, t: rollout(with_targets(t), a, b, c))(qp, qv, U, tg)

@jax.jit
def derivs_b(traj, tg):
    def one(tr, t):
        vel_sv = tr.qvel[:H][:, sv_idx]
        mask = generate_keypoints(kp_cfg, vel_sv, dt)
        return compute_derivatives(with_targets(t), tr, mask, budget,
                                   mode=DERIV, chunk_size=cfg.deriv_chunk)
    return jax.vmap(one)(traj, tg)

@jax.jit
def bp_b(A, B, l_x, l_xx, l_u, l_uu, lamb):
    return jax.vmap(lambda a, b, lx, lxx, lu, luu, lm:
                    backward_pass_lambda_loop(a, b, lx, lxx, lu, luu, lm, cfg)
                    )(A, B, l_x, l_xx, l_u, l_uu, lamb)

@jax.jit
def fp_b(traj, k, K, oc, tg):
    return jax.vmap(lambda tr, kk, KK, o, t:
                    forward_pass(with_targets(t), tr, kk, KK, alphas, o)
                    )(traj, k, K, oc, tg)

args = (jnp.asarray(qpos, dtype), jnp.asarray(qvel, dtype),
        jnp.asarray(U, dtype), jnp.asarray(targets, dtype))

def timeit(f, *a, n=3, label=""):
    out = f(*a); jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a); jax.block_until_ready(jax.tree.leaves(out)[0])
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:10s}: {ms:9.1f} ms")
    return out

traj = timeit(rollout_b, *args, label="rollout")
tg = args[3]
(A, B, l_x, l_xx, l_u, l_uu, pct) = timeit(derivs_b, traj, tg, label="derivs")
lamb = jnp.full((N,), cfg.lambda_init, dtype)
(k, K, dJ, lamb2, ex) = timeit(bp_b, A, B, l_x, l_xx, l_u, l_uu, lamb, label="bp")
oc = traj.costs.sum(-1)
timeit(fp_b, traj, k, K, oc, tg, label="fp")
print("pct derivs:", float(jnp.mean(pct)))
