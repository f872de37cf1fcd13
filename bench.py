"""Headline benchmark: acrobot open-loop iLQR solve time (BASELINE.md config #1/2).

Reference baseline: acrobot, H=500, dt=0.01, SI_1 (full derivatives),
maxIter 10 — mean optimisation time 40.7 ms on a desktop CPU, all cores
(`/root/reference/PaperData/iLQR_C++_Data/iLQR/acrobot_openloop_20240816_1121`,
see BASELINE.md).  We time the same solve as one fused XLA dispatch on the
available accelerator and report the speedup as vs_baseline (>1 = faster).

Derivative mode: exact per-keypoint Jacobians via forward-mode autodiff of
our differentiable stepper — the TPU-native equivalent of the reference's
central FD (FD parity mode is tested separately in f64; f32 TPU arithmetic
cannot support eps=1e-6 central differences).
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
    # cheap-control weighting so all 10 iterations do productive work
    # (the YAML torque weight makes zero-control a near-optimum; timing a
    # stalled solve would flatter us)
    task = task.replace(
        weights=jnp.array([0.0, 0.0, 0.001, 0.001, 0.01], dtype),
        weights_terminal=jnp.array([100.0, 100.0, 1.0, 1.0, 0.01], dtype),
        keypoint_cfg=task.keypoint_cfg.replace(name="set_interval", min_N=1),
    )
    H = 500
    cfg = ILQRConfig(
        max_iterations=10, min_iterations=10, deriv_mode="ad"
    )
    optimise = jax.jit(make_fused_optimise(task, cfg, H))

    qpos0 = task.qpos_start.astype(dtype)
    qvel0 = task.qvel_start.astype(dtype)
    U0 = jnp.zeros((H, task.model.nu), dtype)

    # warmup / compile
    res = optimise(qpos0, qvel0, U0)
    jax.block_until_ready(res)
    reduction = float(res.cost_reduction)

    n_rep = 20
    t0 = time.perf_counter()
    for _ in range(n_rep):
        res = optimise(qpos0, qvel0, U0)
        jax.block_until_ready(res)
    mean_ms = (time.perf_counter() - t0) / n_rep * 1e3

    baseline_ms = 40.7
    print(
        json.dumps(
            {
                "metric": "acrobot_openloop_SI1_H500_opt_time_ms",
                "value": round(mean_ms, 3),
                "unit": "ms",
                "vs_baseline": round(baseline_ms / mean_ms, 3),
                "cost_reduction": round(reduction, 4),
                "iterations": int(res.num_iterations),
            }
        )
    )


if __name__ == "__main__":
    main()
