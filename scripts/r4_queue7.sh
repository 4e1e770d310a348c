#!/usr/bin/env bash
# Round-4 queue 7: DiffTRe retake with the divergence guard (the 01:33
# relaunch of queue 5 NaN'd at outer 4: one Adam step walked the
# potential into an MTS-free but MD-unstable region and a NaN ESS then
# bypassed the resampling guard -- difftre.py now reverts to last-good
# params, halves the update scale, rebuilds the MD state and
# re-equilibrates).  Then the validation sweep, the gradient-cost
# bench, and the new Ewald workloads (molten-salt charge recovery +
# epoch-cost bench) on the real chip.
set -uo pipefail
cd "$(dirname "$0")/.."

# wait for queue 6 (PID file written at launch)
if [ -f /tmp/q6.pid ]; then
  while kill -0 "$(cat /tmp/q6.pid)" 2>/dev/null; do sleep 60; done
fi

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
  timeout "$TMO" "$@" > "results/r4_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
}

TMO=7200
run difftre_warm2 python scripts/run_difftre.py \
  -data lj_0.845_0.75 lj_0.845_1.2 lj_0.7_1 lj_0.5_1.2 lj_0.3_1.2 \
  -size 5 -lr 3e-4 -n_outer 30 -inner_steps 60 \
  -n_frames 48 -steps_between 60 -equil_steps 1200 \
  -pressure_weight 0.3 -target_nsim 30 -capacity_slack 2.5 \
  -init_pkl results/lj_multi_r3g/0/best_eval.pkl \
  -logdir results/lj_difftre_r4

TMO=3600
run validate_difftre python scripts/validate_lj_best.py \
  -run results/lj_difftre_r4 \
  -candidates best.pkl truth ../lj_multi_r3g/0/best_eval.pkl

run bench_difftre python benchmarks/bench_difftre.py

run salt python scripts/run_salt.py -logdir results/salt_r4

run bench_ewald python benchmarks/bench_ewald.py 3 5

echo "=== QUEUE7 COMPLETE $(date -u) ===" | tee -a results/r4_logs/queue.log
