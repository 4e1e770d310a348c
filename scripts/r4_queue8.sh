#!/usr/bin/env bash
# Round-4 queue 8 (reordered): after queue 7, run the quick
# measurements and the queue-6 retakes first; the DiffTRe scratch
# control is last because it is the most expendable.
set -uo pipefail
cd "$(dirname "$0")/.."

if [ -f /tmp/q7.pid ]; then
  while kill -0 "$(cat /tmp/q7.pid)" 2>/dev/null; do sleep 60; done
fi

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
  timeout "$TMO" "$@" > "results/r4_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
}

TMO=2400
run bench_mts_4k python benchmarks/bench_mts.py 8

run isom_plateau python scripts/run_isom.py -nepochs 160 \
  -logdir results/isom_r4b

run bench_official python bench.py

TMO=3600
run npt_lj2 python scripts/run_npt_fit.py -data lj_0.845_1.2 \
  -size 3 -nepochs 150 -opt_freq 60 -lr 5e-3 \
  -logdir results/npt_lj_r4b

run tpair_multi2 python scripts/run_water_multi.py --tpair \
  -data H20_298K_redd H20_308K_redd H20_368K_redd -val H20_338K_redd \
  -nepochs 500 -nsim 10 -logdir results/water_tpair_multi_r4

TMO=5400
run difftre_scratch python scripts/run_difftre.py \
  -data lj_0.845_0.75 lj_0.845_1.2 lj_0.7_1 lj_0.5_1.2 lj_0.3_1.2 \
  -size 5 -lr 3e-4 -n_outer 20 -inner_steps 60 \
  -n_frames 48 -steps_between 60 -equil_steps 1200 \
  -pressure_weight 0.3 -target_nsim 30 -capacity_slack 2.5 \
  -pretrain 2000 \
  -logdir results/lj_difftre_scratch_r4

echo "=== QUEUE8 COMPLETE $(date -u) ===" | tee -a results/r4_logs/queue.log
