#!/usr/bin/env bash
# Tenth round-3 queue: large-N flagship demo -- 4096-atom water GNN fit
# on the O(N) cell-list edge builder (nbr_mode='cells').  The reference
# cannot run this config at all: its torch topology is O(N^2) memory
# with a host sync per step (torchmd/topology.py:30-73).
set -uo pipefail
cd "$(dirname "$0")/.."

while ! grep -q "QUEUE11 COMPLETE" results/r3_logs/queue.log 2>/dev/null; do
  sleep 60
done

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

run water_4k python scripts/run_water.py \
  -data H20_298K_redd -size 8 -nbr_mode cells \
  -compute_dtype bf16 -rdf_backend pallas -frame_skip 1 \
  -nepochs 300 -nsim 10 -logdir results/water_4k_r3

echo "=== QUEUE12 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
