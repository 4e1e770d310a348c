#!/usr/bin/env bash
# Twelfth round-3 queue: MTS (r-RESPA) headline bench -- GNN evaluated at
# the outer step only, prior at 0.5 fs inner steps.
set -uo pipefail
cd "$(dirname "$0")/.."

while ! grep -q "QUEUE13 COMPLETE" results/r3_logs/queue.log 2>/dev/null; do
  sleep 60
done

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

run bench_mts python benchmarks/bench_mts.py

echo "=== QUEUE14 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
