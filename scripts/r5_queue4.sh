#!/usr/bin/env bash
# Round-5 queue 4: DiffTRe continuation.  The queue-1 run (lr 1e-5, 12
# outers) was stable end-to-end with the in-scan wrap -- loss 0.41 ->
# 0.146, depth -0.827 -> -0.846 moving toward the -0.98 truth at
# ~0.0016/outer.  Continue from its best iterate with 36 more outers at
# lr 2e-5, then low-noise-validate all candidates.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p results/r5_logs

if [ -f /tmp/r5q3.pid ]; then
  while kill -0 "$(cat /tmp/r5q3.pid)" 2>/dev/null; do sleep 30; done
fi

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r5_logs/queue.log
  timeout "$TMO" "$@" > "results/r5_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r5_logs/queue.log
}

TMO=9600
run difftre_r5b python scripts/run_difftre.py \
  -data lj_0.845_0.75 lj_0.845_1.2 lj_0.7_1 lj_0.5_1.2 lj_0.3_1.2 \
  -size 5 -lr 2e-5 -ess_min 0.5 -n_outer 36 -inner_steps 40 \
  -n_frames 48 -steps_between 100 -equil_steps 3000 \
  -pressure_weight 0.3 -target_nsim 30 -capacity_slack 2.5 \
  -init_pkl results/lj_difftre_r5/best.pkl \
  -logdir results/lj_difftre_r5b

TMO=2700
run validate_difftre_r5b python scripts/validate_lj_best.py \
  -run results/lj_difftre_r5b \
  -eq_epochs 8 -sample_epochs 16 \
  -candidates best.pkl ../lj_difftre_r5/best.pkl truth \
  ../lj_multi_r3g/0/best_eval.pkl

echo "=== QUEUE4 COMPLETE $(date -u) ===" | tee -a results/r5_logs/queue.log
