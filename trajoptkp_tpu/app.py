"""App driver: run-mode dispatch (the reference's main.cpp, L7).

Usage:
    python -m trajoptkp_tpu.app --task acrobot --runMode Optimise_once
    python -m trajoptkp_tpu.app --config path/to/general_config.yaml

Run modes (mirroring `/root/reference/src/main.cpp:83-298` and
`generalConfigs/default.yaml`):
    Init_controls                 - build + report the task's init controls
    Optimise_once                 - open-loop optimisation, report stats
    MPC_until_completion          - asynchronous MPC until TaskComplete
    Generate_test_scenes          - write random scene CSVs (TestTasks format)
    Generate_openloop_data        - N-scene open-loop campaign -> summary.csv
    Generate_syncronus_mpc_data   - synchronous MPC campaign
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax

# TRAJOPTKP_PLATFORM=cpu forces the CPU backend.  Needed because the TPU
# plugin on some hosts ignores JAX_PLATFORMS and grabs (or blocks on) the
# chip even for host-only run modes like Replay/Generate_test_scenes.
if os.environ.get("TRAJOPTKP_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["TRAJOPTKP_PLATFORM"])

import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", help="general config YAML (reference schema)")
    p.add_argument("--task", default="acrobot")
    p.add_argument("--optimiser", default="iLQR", choices=["iLQR", "iLQR_SVR"])
    p.add_argument("--runMode", default="Optimise_once")
    p.add_argument("--task_config", help="task YAML overrides (reference schema)")
    p.add_argument("--horizon", type=int, default=None)
    p.add_argument("--maxIter", type=int, default=10)
    p.add_argument("--minIter", type=int, default=5)
    p.add_argument(
        "--deriv_mode", default="auto", choices=["auto", "fd", "ad", "ad_time"],
        help="auto: central FD (reference parity) in f64; exact autodiff "
        "columns on f32/TPU, where eps=1e-6 FD is below float precision",
    )
    p.add_argument("--num_scenes", type=int, default=100)
    p.add_argument(
        "--keypoint",
        help="keypoint-method override, reference naming "
        "(GenTestingData.cpp:869-892): SI_n / AJ_a_b / AA_a_b / VC_a_b / "
        "IE_a_b, e.g. SI_5 or AJ_5_100",
    )
    p.add_argument(
        "--methods",
        help="Generate_openloop_data only: comma-separated keypoint-method "
        "list (reference naming), or 'all' for the task's BASELINE.md set — "
        "one campaign per method over the SAME scene batch "
        "(GenDataOpenLoopMultipleMethods, GenTestingData.cpp:18-134)",
    )
    p.add_argument("--out_dir", default="TestingData")
    p.add_argument(
        "--trajectory",
        help="Replay runMode: saved trajectory .npz (utils/checkpoint.py)",
    )
    p.add_argument("--scenes_dir", help="TestTasks-format scene CSV directory")
    p.add_argument("--f32", action="store_true", help="use float32 (TPU)")
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from .config import (apply_task_config, make_task, read_general_config)
    from .solver.ilqr import ILQRConfig, optimise

    gc = None
    if args.config:
        gc = read_general_config(args.config)
        args.task = gc.task
        args.optimiser = gc.optimiser
        args.runMode = gc.runMode
        args.maxIter = gc.maxIter
        args.minIter = gc.minIter

    dtype = jnp.float32 if args.f32 else jnp.float64
    if not args.f32:
        jax.config.update("jax_enable_x64", True)
    task = make_task(args.task, dtype=dtype)
    if args.deriv_mode == "auto":
        # TPU executes f64 programs in f32 (no native double support):
        # central FD at eps=1e-6 drowns in rounding noise there, so use the
        # exact forward-mode columns of the differentiable stepper instead
        # (time-grouped when dofs share keypoint times — set_interval).
        on_tpu = jax.default_backend() == "tpu"
        if args.f32 or on_tpu:
            si = task.keypoint_cfg is not None and \
                task.keypoint_cfg.name == "set_interval"
            args.deriv_mode = "ad_time" if si else "ad"
        else:
            args.deriv_mode = "fd"
    if args.task_config:
        task = apply_task_config(task, args.task_config)
    if args.keypoint:
        task = task.replace(
            keypoint_cfg=_parse_keypoint_name(task.keypoint_cfg, args.keypoint)
        )
        if args.deriv_mode == "ad" and \
                task.keypoint_cfg.name == "set_interval":
            args.deriv_mode = "ad_time"
    H = args.horizon or task.openloop_horizon
    cfg = ILQRConfig(
        max_iterations=args.maxIter,
        min_iterations=args.minIter,
        deriv_mode=args.deriv_mode,
        filtering=gc.filtering if gc else "none",
        cost_derivs_fd=gc.costDerivsFD if gc else False,
    )

    mode = args.runMode
    if mode == "Init_controls":
        U = _init_controls(task, H)
        print(json.dumps({
            "task": task.name, "horizon": H,
            "u_norm": float(jnp.linalg.norm(U)),
            "u0": np.asarray(U[0]).tolist(),
        }))
    elif mode == "Optimise_once":
        qpos0, qvel0, U = _prepare_start(task, H)
        task = task.replace(qpos_start=qpos0, qvel_start=qvel0)
        if args.optimiser == "iLQR_SVR":
            from .solver.ilqr_svr import SVRConfig, make_svr_optimise

            run = jax.jit(make_svr_optimise(task, cfg, SVRConfig(), H))
            t0 = time.perf_counter()
            res = run(task.qpos_start, task.qvel_start, U,
                      jax.random.PRNGKey(args.seed))
            jax.block_until_ready(res)
            print(json.dumps({
                "task": task.name, "horizon": H, "optimiser": "iLQR_SVR",
                "initial_cost": float(res.initial_cost),
                "final_cost": float(res.final_cost),
                "cost_reduction": float(res.cost_reduction),
                "iterations": int(res.num_iterations),
                "avg_num_dofs": float(res.avg_dofs),
                "final_active_dofs": int(jnp.sum(res.active)),
                "opt_time_ms": (time.perf_counter() - t0) * 1e3,
            }))
        else:
            traj, stats = optimise(
                task, task.qpos_start, task.qvel_start, U, cfg, verbose=True
            )
            print(json.dumps({
                "task": task.name, "horizon": H,
                "initial_cost": stats.initial_cost,
                "final_cost": stats.final_cost,
                "cost_reduction": stats.cost_reduction,
                "iterations": stats.num_iterations,
                "opt_time_ms": stats.opt_time_ms,
            }))
    elif mode == "MPC_until_completion":
        from .mpc import AsyncMPC

        U = _init_controls(task, task.mpc_horizon)
        runner = AsyncMPC(task, cfg, task.mpc_horizon, seed=args.seed)
        qpos_hist, u_hist = runner.run(U, max_steps=2000)
        print(json.dumps({
            "task": task.name, "steps": len(u_hist),
            "replans": len(runner.replan_times_ms),
            "mean_replan_ms": float(np.mean(runner.replan_times_ms))
            if runner.replan_times_ms else None,
        }))
    elif mode == "Generate_test_scenes":
        _generate_scenes(task, args)
    elif mode == "Generate_openloop_data":
        _openloop_campaign(task, cfg, H, args)
    elif mode == "Generate_syncronus_mpc_data":
        _sync_mpc_campaign(task, cfg, args)
    elif mode == "Generate_asynchronus_mpc_data":
        _async_mpc_campaign(task, cfg, args)
    elif mode == "Generate_dynamics_data":
        _dynamics_data(task, cfg, args)
    elif mode == "Analyse_toy_contact":
        from .bench.campaigns import analyse_toy_contact

        rows = analyse_toy_contact(
            task, args.horizon or 200,
            out_dir=os.path.join(args.out_dir, "contact_analysis"),
        )
        print(json.dumps({"rows": len(rows), "first": rows[0],
                          "last": rows[-1]}))
    elif mode == "Analyse_toy_contact_keypoints":
        from .bench.campaigns import analyse_toy_contact_keypoints

        rows = analyse_toy_contact_keypoints(
            task, args.horizon or 200,
            out_dir=os.path.join(args.out_dir, "contact_keypoints"),
        )
        print(json.dumps({"rows": len(rows), "first": rows[0],
                          "last": rows[-1]}))
    elif mode == "Analyse_fd_clamp":
        # reference FD solver-clamp divergence (MuJoCoHelper.cpp:925-937);
        # f64/CPU experiment — see bench.campaigns.fd_clamp_analysis
        from .bench.campaigns import fd_clamp_analysis

        if task.model.dtype == jnp.float32:
            raise SystemExit(
                "Analyse_fd_clamp needs f64 (central-FD eps 1e-6 is below "
                "f32 resolution; rerun without --f32 on CPU)"
            )
        rows = fd_clamp_analysis(
            task, horizon=args.horizon or 100,
            out_dir=os.path.join(args.out_dir, "fd_clamp"),
        )
        con = [r for r in rows if r["contact_active"]]
        print(json.dumps({
            "rows": len(rows), "contact_states": len(con),
            "max_clamp_vs_exact": max(
                (r["clamp_vs_exact"] for r in rows), default=0.0),
            "max_fd_vs_exact": max(
                (r["fd_vs_exact"] for r in rows), default=0.0),
        }))
    elif mode == "Replay":
        # interactive viewer replay when a display exists, PNG sequence
        # otherwise (Visualiser.cpp:233-271 surface; viz/replay.py)
        from .utils.checkpoint import load_trajectory
        from .viz.replay import replay_trajectory

        if not args.trajectory:
            raise SystemExit("--runMode Replay requires --trajectory <npz>")
        traj, _ = load_trajectory(args.trajectory)
        paths = replay_trajectory(
            task.model, np.asarray(traj.qpos),
            out_dir=os.path.join(args.out_dir, "replay"),
        )
        print(json.dumps({
            "replay": "interactive" if paths is None else "png_sequence",
            "frames": int(len(traj.qpos)) if paths is None else len(paths),
        }))
    else:
        raise SystemExit(f"unknown runMode: {mode}")


def _parse_keypoint_name(kp_cfg, name: str):
    """SI_n / AJ_a_b / AA_a_b / VC_a_b / IE_a_b -> KeypointConfig override
    (inverse of bench.harness.method_name, reference naming per
    `GenTestingData.cpp:869-892`); thresholds keep the task's YAML values."""
    parts = name.split("_")
    kinds = {
        "SI": "set_interval", "AJ": "adaptive_jerk", "AA": "adaptive_accel",
        "VC": "velocity_change", "IE": "iterative_error",
    }
    kind = kinds[parts[0]]
    if parts[0] == "SI":
        return kp_cfg.replace(name=kind, min_N=int(parts[1]))
    return kp_cfg.replace(
        name=kind, min_N=int(parts[1]), max_N=int(parts[2])
    )


def _init_controls(task, H):
    """CreateInitOptimisationControls dispatch via the Task hook
    (`ModelTranslator.h:166`; push/sweep/place tasks install the
    PushBaseClass EE servo, others default to zeros,
    `ModelTranslator.cpp:1783-1797`)."""
    if task.init_controls_fn is not None:
        return jax.jit(lambda: task.init_controls_fn(task, H))()
    return jnp.zeros((H, task.model.nu), task.model.dtype)


def _prepare_start(task, H):
    """Setup phase + optimisation init controls (`main.cpp:360-363`):
    CreateInitSetupControls(1000) advances the system (EE behind the
    object), the post-setup state becomes the optimisation start, then
    CreateInitOptimisationControls builds the tape from there.

    Returns (qpos0, qvel0, U_init)."""
    qpos0, qvel0 = task.qpos_start, task.qvel_start
    if task.setup_controls_fn is not None:
        _, qpos0, qvel0 = jax.jit(
            lambda: task.setup_controls_fn(task, 1000)
        )()
    if task.init_controls_fn is not None:
        U = jax.jit(
            lambda: task.init_controls_fn(task, H, qpos0, qvel0)
        )()
    else:
        U = jnp.zeros((H, task.model.nu), task.model.dtype)
    return qpos0, qvel0, U


def _generate_scenes(task, args):
    from .config import SceneSpec, save_scene_csv

    rng = np.random.default_rng(args.seed)
    out = os.path.join(args.out_dir, "TestTasks", task.name)
    for i in range(args.num_scenes):
        if task.scene_generator_fn is not None:
            # per-task rejection-sampled scene (ReturnRandomStartState,
            # e.g. tasks/pushing.py clutter generator)
            start, bodies, targets = task.scene_generator_fn(task, rng)
            spec = SceneSpec(robot_start=np.asarray(start),
                             body_starts=[np.asarray(b) for b in bodies],
                             residual_targets=np.asarray(targets))
        else:
            # task-generic jitter of start configuration + targets
            qpos = np.asarray(task.qpos_start, dtype=np.float64)
            n_rj = min(task.model.nu, len(qpos))
            start = qpos[:n_rj] + 0.2 * rng.standard_normal(n_rj)
            targets = np.asarray(task.residual_targets, dtype=np.float64)
            targets = targets + 0.1 * rng.standard_normal(targets.shape)
            spec = SceneSpec(robot_start=start, body_starts=[],
                             residual_targets=targets)
        save_scene_csv(os.path.join(out, f"{i}.csv"), spec)
    print(json.dumps({"scenes_written": args.num_scenes, "dir": out}))


def _openloop_campaign(task, cfg, H, args):
    from .bench import openloop_campaign

    N = args.num_scenes
    nq, nv, nu = task.model.nq, task.model.nv, task.model.nu
    dtype = task.model.dtype
    if args.scenes_dir:
        # reference TestTasks scenes, verbatim (GenDataOpenloopOptimisation
        # loads TestTasks/<task>/<i>.csv per trial, GenTestingData.cpp:169-176)
        from .config.loader import load_scenes_for_task

        qpos, qvel, targets = load_scenes_for_task(task, args.scenes_dir, N)
        N = qpos.shape[0]
        controls_noise = 0.0
    else:
        rng = np.random.default_rng(args.seed)
        qpos = np.tile(np.asarray(task.qpos_start), (N, 1))
        n_rj = min(nu, nq)
        qpos[:, :n_rj] += 0.2 * rng.standard_normal((N, n_rj))
        qvel = np.zeros((N, nv))
        targets = np.tile(np.asarray(task.residual_targets), (N, 1))
        controls_noise = 0.5
    qpos, qvel, U = _batch_init_controls(task, H, qpos, qvel, targets)
    stamp = time.strftime("%Y%m%d_%H%M")
    out_dir = os.path.join(
        args.out_dir, f"{task.name}_openloop_{stamp}"
    )
    if args.methods:
        from .bench.harness import openloop_multi_method

        methods = None if args.methods == "all" else args.methods.split(",")
        results = openloop_multi_method(
            task, qpos, qvel, targets, U, cfg, out_dir=out_dir,
            methods=methods, controls_noise=controls_noise,
            optimiser=args.optimiser,
        )
        print(json.dumps({
            "campaign": out_dir,
            "methods": {
                m: {
                    "mean_cost_reduction": float(
                        np.mean([r.cost_reduction for r in rows])
                    ),
                    "mean_opt_time_ms": float(
                        np.mean([r.opt_time_ms for r in rows])
                    ),
                }
                for m, rows in results.items()
            },
        }))
        return
    rows = openloop_campaign(
        task, qpos, qvel, targets, U, cfg, out_dir=out_dir,
        controls_noise=controls_noise, optimiser=args.optimiser,
    )
    print(json.dumps({
        "campaign": out_dir, "trials": len(rows),
        "mean_cost_reduction": float(np.mean([r.cost_reduction for r in rows])),
        "mean_opt_time_ms": float(np.mean([r.opt_time_ms for r in rows])),
        "mean_avg_num_dofs": float(np.mean([r.avg_num_dofs for r in rows])),
    }))


def _batch_init_controls(task, H, qpos, qvel, targets):
    """Per-scene setup phase + init controls (the reference campaigns run
    CreateInitSetupControls(1000) then CreateInitOptimisationControls per
    loaded scene, `GenTestingData.cpp:169-200`).

    Returns (qpos0 (N,nq), qvel0 (N,nv), U (N,H,nu)) — post-setup starts."""
    dtype = task.model.dtype
    qpos = jnp.asarray(qpos, dtype)
    qvel = jnp.asarray(qvel, dtype)
    targets = jnp.asarray(targets, dtype)
    if task.setup_controls_fn is not None:
        setup = jax.jit(jax.vmap(
            lambda qp, qv, tg: task.setup_controls_fn(task, 1000, qp, qv, tg)
        ))
        _, qpos, qvel = setup(qpos, qvel, targets)
    if task.init_controls_fn is not None:
        run = jax.jit(jax.vmap(
            lambda qp, qv, tg: task.init_controls_fn(task, H, qp, qv, tg)
        ))
        U = np.asarray(run(qpos, qvel, targets))
    else:
        U = np.zeros((qpos.shape[0], H, task.model.nu))
    return np.asarray(qpos), np.asarray(qvel), U


def _sync_mpc_campaign(task, cfg, args):
    """GenDataMPCHorizons (`GenTestingData.cpp:275-326`): replan-time vs
    horizon sweep (the BASELINE.md walker table) when --horizon is not
    pinned; single-horizon timing otherwise."""
    from .bench.campaigns import sync_mpc_horizon_sweep

    horizons = (
        [args.horizon] if args.horizon
        else [20, 30, 40, 50, 60, 70, 80]
    )
    out_dir = os.path.join(
        args.out_dir,
        f"{task.name}_sync_mpc_{time.strftime('%Y%m%d_%H%M')}",
    )
    rows = sync_mpc_horizon_sweep(
        task, cfg, horizons, n_replans=200, out_dir=out_dir, seed=args.seed
    )
    print(json.dumps({"campaign": out_dir, "rows": rows}))


def _async_mpc_campaign(task, cfg, args):
    from .bench import async_mpc_campaign

    N = min(args.num_scenes, 25)  # async trials are wall-clock serial
    if args.scenes_dir:
        # reference TestTasks scenes (TestingMPC loads them per trial,
        # GenTestingData.cpp:376-383)
        from .config.loader import load_scenes_for_task

        qpos, _, _ = load_scenes_for_task(task, args.scenes_dir, N)
        qpos = np.asarray(qpos)
        N = qpos.shape[0]
    else:
        rng = np.random.default_rng(args.seed)
        qpos = np.tile(np.asarray(task.qpos_start), (N, 1))
        n_rj = min(task.model.nu, task.model.nq)
        qpos[:, :n_rj] += 0.2 * rng.standard_normal((N, n_rj))
    out_dir = os.path.join(
        args.out_dir, f"{task.name}_async_mpc_{time.strftime('%Y%m%d_%H%M')}"
    )
    rows = async_mpc_campaign(
        task, cfg, qpos, task.mpc_horizon, max_steps=500, out_dir=out_dir
    )
    print(json.dumps({"campaign": out_dir, "trials": len(rows)}))


def _dynamics_data(task, cfg, args):
    from .bench import dump_derivatives
    from .solver.ilqr import rollout

    H = min(args.horizon or task.openloop_horizon, 200)
    U = _init_controls(task, H)
    traj = rollout(task, task.qpos_start, task.qvel_start, U)
    out_dir = os.path.join(
        args.out_dir, f"{task.name}_dynamics_{time.strftime('%Y%m%d_%H%M')}"
    )
    dump_derivatives(task, traj, out_dir, cfg)
    print(json.dumps({"dir": out_dir, "horizon": H}))


if __name__ == "__main__":
    main()
