"""Headline benchmarks: acrobot + panda-push open-loop solve throughput.

Reference baselines (BASELINE.md, 100-trial means on a desktop CPU using all
cores — the reference is a single-process multi-threaded solver, so its
machine is saturated by one solve):
  - acrobot,  H=500,  dt=0.01,  SI_1, maxIter 10: 40.7 ms  (~24.6 solves/s)
  - push_ncl, H=1000, dt=0.008, SI_1, maxIter 10: 987 ms   (~1.01 solves/s)

We report the same workloads as device throughput: a batch of solves runs as
one (or four, for the phase-batched panda path) TPU dispatches — the
reference's 100-trial campaigns are a serial loop over exactly this solve.
Scenes are the reference's own saved TestTasks CSVs, loaded verbatim
(`/root/reference/src/FileHandler/FileHandler.cpp:471-578`), so the
cost-reduction column is apples-to-apples with BASELINE.md.

vs_baseline = our solves/s / reference solves/s (per metric).

Derivative mode: exact Jacobians via forward-mode autodiff of the
differentiable stepper (f32 TPU arithmetic cannot support eps=1e-6 central
differences; the FD parity mode is exercised in f64 tests).  The acrobot row
uses the lane-last solver (solver/lanes.py) — the batch axis is the minormost
dimension of every tensor, eliminating the ~28x TPU tile-padding bandwidth
waste of vmapped small-matrix code; parity with the generic solver is pinned
by tests/test_lanes*.py.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def bench_acrobot():
    from trajoptkp_tpu.config.loader import load_scenes_for_task
    from trajoptkp_tpu.solver.ilqr import ILQRConfig
    from trajoptkp_tpu.solver.lanes import make_lane_batch_optimise
    from trajoptkp_tpu.tasks.toys import make_acrobot

    dtype = jnp.float32
    task = make_acrobot(dtype=dtype)
    task = task.replace(
        keypoint_cfg=task.keypoint_cfg.replace(name="set_interval", min_N=1),
    )
    H = 500
    cfg = ILQRConfig(max_iterations=10, min_iterations=10,
                     deriv_mode="ad_time")
    B = 512
    lane = jax.jit(make_lane_batch_optimise(task, cfg, H))

    # reference scenes (100), tiled to fill the batch
    qpos, qvel, targets = load_scenes_for_task(
        task, "/root/reference/TestTasks/acrobot", 100
    )
    reps = -(-B // qpos.shape[0])
    qpB = jnp.asarray(np.tile(qpos, (reps, 1))[:B], dtype)
    qvB = jnp.asarray(np.tile(qvel, (reps, 1))[:B], dtype)
    tgB = jnp.asarray(np.tile(targets, (reps, 1))[:B], dtype)
    UB = jnp.zeros((B, H, task.model.nu), dtype)

    res = lane(qpB, qvB, UB, tgB)
    jax.block_until_ready(res.final_cost)
    t0 = time.perf_counter()
    n_rep = 3
    for _ in range(n_rep):
        res = lane(qpB, qvB, UB, tgB)
        jax.block_until_ready(res.final_cost)
    batch_s = (time.perf_counter() - t0) / n_rep
    solves_per_s = B / batch_s
    red100 = float(np.mean(np.asarray(res.cost_reduction)[:100]))

    baseline = 1000.0 / 40.7
    return {
        "metric": "acrobot_openloop_SI1_H500_solves_per_s",
        "value": round(solves_per_s, 2),
        "unit": "solves/s (batch 512 lane-last, 10 iters each)",
        "vs_baseline": round(solves_per_s / baseline, 3),
        "batch_ms": round(batch_s * 1e3, 1),
        "cost_reduction_ref_scenes": round(red100, 4),
        "baseline_cost_reduction": 0.768,
    }


def bench_push():
    from trajoptkp_tpu.app import _batch_init_controls
    from trajoptkp_tpu.config.loader import load_scenes_for_task, make_task
    from trajoptkp_tpu.solver.batched import make_batched_phase_optimise
    from trajoptkp_tpu.solver.ilqr import ILQRConfig

    dtype = jnp.float32
    task = make_task("pushing_no_clutter", dtype=dtype)
    H = 1000
    N = 100
    cfg = ILQRConfig(max_iterations=10, min_iterations=10,
                     deriv_mode="ad_time")
    qpos, qvel, targets = load_scenes_for_task(
        task, "/root/reference/TestTasks/push_ncl", N
    )
    qpos, qvel, U = _batch_init_controls(task, H, qpos, qvel, targets)
    run = make_batched_phase_optimise(task, cfg, H, batch_size=N)
    args = (
        jnp.asarray(qpos, dtype), jnp.asarray(qvel, dtype),
        jnp.asarray(U, dtype), jnp.asarray(targets, dtype),
    )
    res = run(*args)
    jax.block_until_ready(res.final_cost)
    t0 = time.perf_counter()
    res = run(*args)
    jax.block_until_ready(res.final_cost)
    batch_s = time.perf_counter() - t0
    solves_per_s = N / batch_s

    baseline = 1000.0 / 987.0
    return {
        "metric": "push_ncl_openloop_SI1_H1000_solves_per_s",
        "value": round(solves_per_s, 2),
        "unit": f"solves/s (batch {N} ref scenes, 10 iters each)",
        "vs_baseline": round(solves_per_s / baseline, 3),
        "batch_ms": round(batch_s * 1e3, 1),
        "cost_reduction_ref_scenes": round(
            float(np.mean(np.asarray(res.cost_reduction))), 4
        ),
        "baseline_cost_reduction": 0.250,
    }


def main():
    rows = [bench_acrobot()]
    try:
        rows.append(bench_push())
    except Exception as e:  # keep the headline row alive if panda compile dies
        rows.append({
            "metric": "push_ncl_openloop_SI1_H1000_solves_per_s",
            "value": 0.0, "unit": "solves/s", "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:300],
        })
    # headline line (driver parses the first/only JSON line): report acrobot
    # with the push row inlined
    out = dict(rows[0])
    out["push_ncl"] = rows[1]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
