#!/usr/bin/env bash
# Round-3 queue 20: (a) LJ pressure-fit refinement at the STABLE lr
# (2e-5) with a 6x stronger pressure weight -- r3c showed lr 2e-5 wins
# the validated combined score but pw 0.05 leaves the depth direction
# soft (-0.837); r3d showed lr 1e-4 diverges and never beats its own
# pretrain under eval selection.  (b) unified validation incl. the r3c
# candidate.  (c) supervised force-matching workload (Trainer stack at
# workload scale + validation-by-use).  (d) hyperopt random-search
# artifact over the reference's GNN sigopt space (10 trials).
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

run lj_pressure6 python scripts/run_lj.py \
  -data lj_0.845_0.75 lj_0.845_1.2 lj_0.7_1 lj_0.5_1.2 lj_0.3_1.2 \
  -size 5 -opt_freq 120 -lr 2e-5 -pretrain 2000 -burnin 30 \
  -frame_skip 1 -state_reset_every 10 -grad_clip 1.0 -nepochs 200 \
  -pressure_weight 0.3 -capacity_slack 2.5 -eval_every 10 \
  -logdir results/lj_multi_r3e

run validate_lj_r3e python scripts/validate_lj_best.py \
  -run results/lj_multi_r3e/0 \
  -candidates best_eval.pkl truth \
  ../../lj_multi_r3c/0/best_eval.pkl ../../lj_multi_r3/0/best.pkl

run supervised python scripts/run_supervised.py \
  -logdir results/supervised_r3

run si_transfer_4k python scripts/si_transfer.py \
  -capacity_slack 3.0 -logdir results/si_4k_r3

run hyperopt python scripts/run_hyperopt.py \
  -logdir results/hyperopt_r3 -n_trials 10 -nepochs 150

echo "=== QUEUE20 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
