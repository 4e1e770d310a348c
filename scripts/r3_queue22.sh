#!/usr/bin/env bash
# Round-3 queue 22: LJ pressure fit with BIAS-CORRECTED targets.
# Diagnosis (validate_lj_r3e): the self-generated P targets were
# under-equilibrated (skip=2 fixed => 200 steps from the lattice); the
# dense-cold state lj_0.845_0.75's target read 0.804 where the same
# truth potential under the low-noise protocol measures 1.046 -- and
# that state's pressure is what pins the well depth.  get_target_obs
# now scales the discard prefix with n_sim; -target_nsim 30 gives
# 1000 steps equilibration + 2000 steps of sampling per state.
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

run lj_pressure7 python scripts/run_lj.py \
  -data lj_0.845_0.75 lj_0.845_1.2 lj_0.7_1 lj_0.5_1.2 lj_0.3_1.2 \
  -size 5 -opt_freq 120 -lr 2e-5 -pretrain 2000 -burnin 30 \
  -frame_skip 1 -state_reset_every 10 -grad_clip 1.0 -nepochs 200 \
  -pressure_weight 0.3 -capacity_slack 2.5 -eval_every 10 \
  -target_nsim 30 \
  -logdir results/lj_multi_r3g

run validate_lj_r3g python scripts/validate_lj_best.py \
  -run results/lj_multi_r3g/0 \
  -candidates best_eval.pkl truth \
  ../../lj_multi_r3c/0/best_eval.pkl ../../lj_multi_r3/0/best.pkl

echo "=== QUEUE22 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
