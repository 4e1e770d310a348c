#!/usr/bin/env bash
# Round-3 queue 25: large-N gather-kernel comparison (XLA gather vs the
# Pallas fused gather-filter-reduce) on the fit epoch.
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

run gnn_large_pallas python benchmarks/bench_gnn_large.py

echo "=== QUEUE25 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
