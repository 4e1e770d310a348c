#!/usr/bin/env bash
# Ninth round-3 queue: tpair retake #2 -- the pallas/frame_skip-1 retake
# (water_tpair3) hit pair-table neighbor-capacity overflow at epoch 116
# and NaN-bailed; capacity_slack now reaches the pair/tpair table
# constructors (fit_rdf.build_fit) and is raised to 2.0 here.
set -uo pipefail
cd "$(dirname "$0")/.."

while ! grep -q "QUEUE10 COMPLETE" results/r3_logs/queue.log 2>/dev/null; do
  sleep 60
done

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

run water_tpair4 python scripts/run_water.py --tpair \
  -data H20_298K_redd H20_308K_redd H20_368K_redd -val H20_338K_redd \
  -nepochs 400 -nsim 10 -rdf_backend pallas -frame_skip 1 \
  -capacity_slack 2.0 -logdir results/water_tpair_table_r3

echo "=== QUEUE11 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
