#!/usr/bin/env bash
# Round-3 queue 24: compose the two best water configs -- the 4096-atom
# cells-path box (results/water_4k_r3, MSE 0.00137, ~11.5 s/epoch) and
# MTS k=2 (results/water_mts_r3, 1.64x, MSE 0.0040 at 512) -- into one
# run: biggest box, half the GNN evaluations per simulated fs.
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

run water_4k_mts python scripts/run_water.py \
  -size 8 -nbr_mode cells -rdf_backend pallas -frame_skip 1 \
  -compute_dtype bf16 -nepochs 300 -mts 2 \
  -logdir results/water_4k_mts_r3

echo "=== QUEUE24 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
