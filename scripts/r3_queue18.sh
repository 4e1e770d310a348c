#!/usr/bin/env bash
# Round-3 queue 18 (post-restart): rerun the two refinement fits with
# the fixed best-model machinery (off-by-one fix 787b52c, equilibrated
# eval f35e2a8, capacity_slack plumbing 2380ea6), then the low-noise
# validation of the pressure fit's selected candidates.
#  - lj_multi_r3b's best.pkl was epoch 0 and lost to the raw pretrain
#    under validate_lj_best (train-loss selection is drift-biased);
#    best_eval.pkl tracks the in-loop equilibrated metric instead.
#  - capacity_slack 2.5: the lj_0.3_1.2 state overflowed the 1.6
#    default during validation rollouts.
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

run lj_pressure4 python scripts/run_lj.py \
  -data lj_0.845_0.75 lj_0.845_1.2 lj_0.7_1 lj_0.5_1.2 lj_0.3_1.2 \
  -size 5 -opt_freq 120 -lr 2e-5 -pretrain 2000 -burnin 30 \
  -frame_skip 1 -state_reset_every 10 -grad_clip 1.0 -nepochs 200 \
  -pressure_weight 0.05 -capacity_slack 2.5 -eval_every 10 \
  -logdir results/lj_multi_r3c

run lj_rdf_vacf2 python scripts/run_lj.py \
  -data lj_0.845_0.75 -size 4 -dt 0.01 -vacf_weight 0.5 \
  -opt_freq 120 -lr 1e-4 -pretrain 2000 -burnin 20 -frame_skip 1 \
  -grad_clip 1.0 -nepochs 150 -eval_every 10 -capacity_slack 2.0 \
  -logdir results/lj_vacf_r3b

run validate_lj_r3c python scripts/validate_lj_best.py \
  -run results/lj_multi_r3c/0 \
  -candidates best_eval.pkl best.pkl pretrain

echo "=== QUEUE18 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
