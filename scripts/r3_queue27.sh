#!/usr/bin/env bash
# Round-3 queue 27: water 4k MTS retake at the validated Q=50 bath mass
# (queue-24's NaN at epoch 6 ran under the since-reverted N-scaled Q
# default -- this isolates MTS as the only variable vs water_4k_r3).
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

run water_4k_mts2 python scripts/run_water.py \
  -size 8 -nbr_mode cells -rdf_backend pallas -frame_skip 1 \
  -compute_dtype bf16 -nepochs 300 -mts 2 \
  -logdir results/water_4k_mts_r3b

echo "=== QUEUE27 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
