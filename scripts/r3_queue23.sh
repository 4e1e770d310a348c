#!/usr/bin/env bash
# Round-3 queue 23: LJ depth polish + official bench re-check.
# lj_multi_r3g (bias-corrected targets) is the best VALIDATED candidate
# (|dP| 0.737) but its well depth sits at -0.83 vs truth -0.98, and the
# truth control scores 15x better on the same objective -- the gap is
# optimization, not information.  Continue from r3g's best_eval at a
# lower lr with frequent equilibrated-eval selection.
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

run lj_polish python scripts/run_lj.py \
  -data lj_0.845_0.75 lj_0.845_1.2 lj_0.7_1 lj_0.5_1.2 lj_0.3_1.2 \
  -size 5 -opt_freq 120 -lr 1e-5 -pretrain 0 -burnin 30 \
  -init_pkl results/lj_multi_r3g/0/best_eval.pkl \
  -frame_skip 1 -state_reset_every 10 -grad_clip 1.0 -nepochs 300 \
  -pressure_weight 0.3 -capacity_slack 2.5 -eval_every 10 \
  -target_nsim 30 \
  -logdir results/lj_multi_r3h

run validate_lj_r3h python scripts/validate_lj_best.py \
  -run results/lj_multi_r3h/0 \
  -candidates best_eval.pkl truth ../../lj_multi_r3g/0/best_eval.pkl

run bench_official python bench.py

echo "=== QUEUE23 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
