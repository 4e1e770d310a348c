#!/usr/bin/env bash
# Eighth round-3 queue: per-step time attribution for the headline epoch
# (bench_step_budget.py) -- decides the next headline optimization
# (neighbor-refresh cadence at slack capacity vs force-path work).
set -uo pipefail
cd "$(dirname "$0")/.."

while ! grep -q "QUEUE9 COMPLETE" results/r3_logs/queue.log 2>/dev/null; do
  sleep 60
done

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

run bench_step_budget python benchmarks/bench_step_budget.py

echo "=== QUEUE10 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
