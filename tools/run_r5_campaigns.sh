#!/bin/bash
# Round-5 campaign regeneration (VERDICT r4 asks #2, #3, #5, #7).
# Run from the repo root on the TPU host; each block writes committed
# TestingData artifacts.
set -x
cd "$(dirname "$0")/.."

# 1. walker_run synchronous-MPC replan-rate table (BASELINE.md walker table;
#    GenDataMPCHorizons) — host-driven lane executor, per-replan timing
timeout 7200 python -m trajoptkp_tpu.app --task walker_run \
  --runMode Generate_syncronus_mpc_data --keypoint SI_1 --f32 \
  --out_dir TestingData

# 2. acrobot open-loop multi-method campaign over the reference TestTasks
#    scenes (BASELINE.md acrobot block, incl. the lane-IE row)
timeout 7200 python -m trajoptkp_tpu.app --task acrobot \
  --runMode Generate_openloop_data --methods all \
  --scenes_dir /root/reference/TestTasks/acrobot --num_scenes 100 \
  --maxIter 10 --minIter 10 --f32 --out_dir TestingData

# 3. async-MPC campaign artifact (episode_cost / task_complete columns,
#    TestingMPC analogue) — 25 reference scenes
timeout 7200 python -m trajoptkp_tpu.app --task pushing_no_clutter \
  --runMode Generate_asynchronus_mpc_data \
  --scenes_dir /root/reference/TestTasks/push_ncl --num_scenes 25 \
  --f32 --out_dir TestingData

# 4. reaching open-loop multi-method campaign
timeout 7200 python -m trajoptkp_tpu.app --task reaching \
  --runMode Generate_openloop_data --methods all \
  --scenes_dir /root/reference/TestTasks/reaching --num_scenes 100 \
  --maxIter 10 --minIter 10 --f32 --out_dir TestingData

# 5. push_ncl open-loop multi-method campaign
timeout 10800 python -m trajoptkp_tpu.app --task pushing_no_clutter \
  --runMode Generate_openloop_data --methods all \
  --scenes_dir /root/reference/TestTasks/push_ncl --num_scenes 100 \
  --maxIter 10 --minIter 10 --f32 --out_dir TestingData
