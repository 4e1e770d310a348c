#!/usr/bin/env bash
# Round-4 queue 13: DiffTRe warm retake with the rethermalized lattice
# rebuild (warm5 died to the fixed-velocity outer-0 replay: six reverts,
# every retry re-ran the identical equilibration blowup).  equil 3000 is
# the middle ground between warm3's 1200 (visibly unequilibrated
# targets) and warm5's 6000 (inside the warm-start potential's
# instability window from the lattice).
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
  timeout "$TMO" "$@" > "results/r4_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
}

TMO=3300
run difftre_warm6 python scripts/run_difftre.py \
  -data lj_0.845_0.75 lj_0.845_1.2 lj_0.7_1 lj_0.5_1.2 lj_0.3_1.2 \
  -size 5 -lr 1e-5 -ess_min 0.5 -n_outer 12 -inner_steps 40 \
  -n_frames 48 -steps_between 100 -equil_steps 3000 \
  -pressure_weight 0.3 -target_nsim 30 -capacity_slack 2.5 \
  -init_pkl results/lj_multi_r3g/0/best_eval.pkl \
  -logdir results/lj_difftre_warm6_r4

TMO=2400
run validate_difftre6 python scripts/validate_lj_best.py \
  -run results/lj_difftre_warm6_r4 \
  -eq_epochs 8 -sample_epochs 16 \
  -candidates best.pkl truth ../lj_multi_r3g/0/best_eval.pkl

echo "=== QUEUE13 COMPLETE $(date -u) ===" | tee -a results/r4_logs/queue.log
