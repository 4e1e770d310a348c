#!/usr/bin/env bash
# Round-5 queue 1: the reopened LJ/DiffTRe thread (VERDICT r4 item 1).
# (a) Single-epoch stability probes: replay the exact round-4 failure
#     shape (one 15000-step single-epoch scan, the sample_frames
#     equilibration path) at the lj_multi_r3g candidate AND at the
#     registry truth potential, now with the in-scan wrap.  Before the
#     fix these died at ~7k steps; both must be stable now.
# (b) The prescribed warm6 configuration (lr 1e-5, ess_min 0.5,
#     equil 3000) -- executing for the FIRST time with working sampling.
# (c) Low-noise validation of the result vs truth and the r3g start.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p results/r5_logs

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r5_logs/queue.log
  timeout "$TMO" "$@" > "results/r5_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r5_logs/queue.log
}

TMO=2400
run diag_single_cand python scripts/diag_lj_stability.py \
  -init_pkl results/lj_multi_r3g/0/best_eval.pkl \
  -steps 15000 -chunk 15000 -seeds 1

run diag_single_truth python scripts/diag_lj_stability.py \
  --truth -steps 15000 -chunk 15000 -seeds 1

TMO=3300
run difftre_r5 python scripts/run_difftre.py \
  -data lj_0.845_0.75 lj_0.845_1.2 lj_0.7_1 lj_0.5_1.2 lj_0.3_1.2 \
  -size 5 -lr 1e-5 -ess_min 0.5 -n_outer 12 -inner_steps 40 \
  -n_frames 48 -steps_between 100 -equil_steps 3000 \
  -pressure_weight 0.3 -target_nsim 30 -capacity_slack 2.5 \
  -init_pkl results/lj_multi_r3g/0/best_eval.pkl \
  -logdir results/lj_difftre_r5

TMO=2700
run validate_difftre_r5 python scripts/validate_lj_best.py \
  -run results/lj_difftre_r5 \
  -eq_epochs 8 -sample_epochs 16 \
  -candidates best.pkl truth ../lj_multi_r3g/0/best_eval.pkl

echo "=== QUEUE1 COMPLETE $(date -u) ===" | tee -a results/r5_logs/queue.log
