"""Headline benchmark: acrobot open-loop iLQR solve throughput + latency.

Reference baseline (BASELINE.md): acrobot, H=500, dt=0.01, SI_1 (full
derivatives), maxIter 10 — mean optimisation time 40.7 ms on a desktop CPU
using all cores, i.e. ~24.6 solves/s with the machine saturated
(`PaperData/iLQR_C++_Data/iLQR/acrobot_openloop_20240816_1121`).

We report the same workload as device throughput: a batch of solves runs as
one vmapped fused-iLQR dispatch (the reference's 100-trial campaigns are a
serial loop over exactly this solve), plus the single-solve latency as a
secondary field.  vs_baseline = our solves/s / reference solves/s.

Derivative mode: exact per-keypoint Jacobians via forward-mode autodiff of
the differentiable stepper (f32 TPU arithmetic cannot support eps=1e-6
central differences; the FD parity mode is exercised in f64 tests).
"""

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    from trajoptkp_tpu.solver.fused import make_fused_optimise
    from trajoptkp_tpu.solver.ilqr import ILQRConfig
    from trajoptkp_tpu.tasks.toys import make_acrobot

    dtype = jnp.float32
    task = make_acrobot(dtype=dtype)
    # reference workload weights (TaskConfigs/toys/acrobot.yaml) + SI_1 full
    # derivatives — the exact configuration of the baseline row
    task = task.replace(
        keypoint_cfg=task.keypoint_cfg.replace(name="set_interval", min_N=1),
    )
    H = 500
    # ad_time: one jacfwd per keypoint time (primal shared across columns);
    # deriv_chunk bounds per-chunk HBM at large batch (TPU tile padding
    # inflates the small FK tensors ~28x)
    cfg = ILQRConfig(
        max_iterations=10, min_iterations=10, deriv_mode="ad_time",
        deriv_chunk=64,
    )
    fused = make_fused_optimise(task, cfg, H)

    qpos0 = task.qpos_start.astype(dtype)
    qvel0 = task.qvel_start.astype(dtype)
    U0 = jnp.zeros((H, task.model.nu), dtype)

    # ---- single-solve latency
    single = jax.jit(fused)
    res = single(qpos0, qvel0, U0)
    jax.block_until_ready(res)
    reduction = float(res.cost_reduction)
    n_rep = 10
    t0 = time.perf_counter()
    for _ in range(n_rep):
        res = single(qpos0, qvel0, U0)
        jax.block_until_ready(res)
    single_ms = (time.perf_counter() - t0) / n_rep * 1e3

    # ---- batched throughput (the campaign workload)
    B = 512
    batched = jax.jit(jax.vmap(fused))
    key = jax.random.PRNGKey(0)
    qpB = qpos0 + 0.3 * jax.random.normal(key, (B, task.model.nq), dtype)
    qvB = jnp.zeros((B, task.model.nv), dtype)
    UB = jnp.zeros((B, H, task.model.nu), dtype)
    resB = batched(qpB, qvB, UB)
    jax.block_until_ready(resB)
    t0 = time.perf_counter()
    n_rep_b = 3
    for _ in range(n_rep_b):
        resB = batched(qpB, qvB, UB)
        jax.block_until_ready(resB)
    batch_s = (time.perf_counter() - t0) / n_rep_b
    solves_per_s = B / batch_s

    baseline_solves_per_s = 1000.0 / 40.7
    print(
        json.dumps(
            {
                "metric": "acrobot_openloop_SI1_H500_solves_per_s",
                "value": round(solves_per_s, 2),
                "unit": "solves/s (batch 512, 10 iters each)",
                "vs_baseline": round(solves_per_s / baseline_solves_per_s, 3),
                "single_solve_ms": round(single_ms, 2),
                "cost_reduction": round(reduction, 4),
                "batch_mean_reduction": round(
                    float(resB.cost_reduction.mean()), 4
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
