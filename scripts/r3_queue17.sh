#!/usr/bin/env bash
# bench.py with the new MTS secondary field -- the official headline run.
set -uo pipefail
cd "$(dirname "$0")/.."

while ! grep -q "QUEUE16 COMPLETE" results/r3_logs/queue.log 2>/dev/null; do
  sleep 60
done

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

run bench_final3 python bench.py

echo "=== QUEUE17 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
