#!/usr/bin/env bash
# Thirteenth round-3 queue: MTS water-fit validation -- full 500-epoch
# water fit at -mts 2 (GNN at 1 fs, prior at 0.5 fs): quality must land
# at the single-rate MSE scale with the bench_mts speedup.
set -uo pipefail
cd "$(dirname "$0")/.."

while ! grep -q "QUEUE14 COMPLETE" results/r3_logs/queue.log 2>/dev/null; do
  sleep 60
done

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

run water_mts python scripts/run_water.py \
  -data H20_298K_redd -mts 2 -compute_dtype bf16 -capacity_slack 1.25 \
  -nepochs 500 -nsim 10 -logdir results/water_mts_r3

echo "=== QUEUE15 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
