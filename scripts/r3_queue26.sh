#!/usr/bin/env bash
# Round-3 queue 26: DiffTRe on the 5-state LJ + pressure workload.
# The trajectory-gradient fits stalled at depth -0.83 under per-epoch
# estimator noise (ROUND3.md LJ close-out); DiffTRe's inner steps are
# deterministic (fixed frames), which is exactly the missing property.
# Run A: warm start from the best validated candidate (r3g best_eval).
# Run B: from the plain BI pretrain (standalone-engine control).
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

run difftre_warm python scripts/run_difftre.py \
  -data lj_0.845_0.75 lj_0.845_1.2 lj_0.7_1 lj_0.5_1.2 lj_0.3_1.2 \
  -size 5 -lr 3e-4 -n_outer 30 -inner_steps 60 \
  -n_frames 48 -steps_between 60 -equil_steps 1200 \
  -pressure_weight 0.3 -target_nsim 30 -capacity_slack 2.5 \
  -init_pkl results/lj_multi_r3g/0/best_eval.pkl \
  -logdir results/lj_difftre_r3

run difftre_scratch python scripts/run_difftre.py \
  -data lj_0.845_0.75 lj_0.845_1.2 lj_0.7_1 lj_0.5_1.2 lj_0.3_1.2 \
  -size 5 -lr 3e-4 -n_outer 30 -inner_steps 60 \
  -n_frames 48 -steps_between 60 -equil_steps 1200 \
  -pressure_weight 0.3 -target_nsim 30 -capacity_slack 2.5 \
  -pretrain 2000 \
  -logdir results/lj_difftre_scratch_r3

run bench_difftre python benchmarks/bench_difftre.py

run validate_difftre python scripts/validate_lj_best.py \
  -run results/lj_difftre_r3 \
  -candidates best.pkl truth ../lj_difftre_scratch_r3/best.pkl \
  ../lj_multi_r3g/0/best_eval.pkl

echo "=== QUEUE26 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
