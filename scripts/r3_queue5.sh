#!/usr/bin/env bash
# Trailing round-3 queue: retry the slack-1.25 validation fit (first
# attempt hung waiting on the compile tunnel and was killed).
set -uo pipefail
cd "$(dirname "$0")/.."

while ! grep -q "QUEUE4 COMPLETE" results/r3_logs/queue.log 2>/dev/null; do
  sleep 60
done

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

rm -rf results/water_slim_r3
run water_slim2 python scripts/run_water.py -nepochs 150 -nsim 5 \
  -compute_dtype bf16 -capacity_slack 1.25 \
  -logdir results/water_slim_r3

echo "=== QUEUE5 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
