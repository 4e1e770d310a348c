#!/usr/bin/env bash
# Round-4 queue 12: the tpair-multistate retake under the new recovery
# semantics (trust-region step-scale grow-back, 1/64 floor, salvage
# inference on bailout -- commit 3cfc147), plus the TPU numbers for the
# new Ewald table-mode real-space term.
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
  timeout "$TMO" "$@" > "results/r4_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
}

TMO=2700
run tpair_multi5 python scripts/run_water_multi.py --tpair \
  -data H20_298K_redd H20_308K_redd H20_368K_redd -val H20_338K_redd \
  -nepochs 300 -nsim 10 -capacity_slack 3.0 \
  -logdir results/water_tpair_multi_r4

TMO=1800
run bench_ewald_table python benchmarks/bench_ewald.py 3 5

echo "=== QUEUE12 COMPLETE $(date -u) ===" | tee -a results/r4_logs/queue.log
