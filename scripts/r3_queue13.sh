#!/usr/bin/env bash
# Eleventh round-3 queue: tpair retake #3 on a FRESH logdir -- retake #2
# resumed from the overflow-poisoned epoch-119 checkpoint in the same
# logdir and NaN-bailed immediately.
set -uo pipefail
cd "$(dirname "$0")/.."

while ! grep -q "QUEUE12 COMPLETE" results/r3_logs/queue.log 2>/dev/null; do
  sleep 60
done

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

rm -rf results/water_tpair_table_r3b
run water_tpair5 python scripts/run_water.py --tpair \
  -data H20_298K_redd H20_308K_redd H20_368K_redd -val H20_338K_redd \
  -nepochs 400 -nsim 10 -rdf_backend pallas -frame_skip 1 \
  -capacity_slack 2.0 -logdir results/water_tpair_table_r3b

echo "=== QUEUE13 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
