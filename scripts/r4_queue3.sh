#!/usr/bin/env bash
# Round-4 queue 3: 4k x MTS bisection, probes 3+4.
# Ruled out so far: bath mass value (q24/q27), MTK vs reference link
# masses (probe 1), bf16 (probe 2: f32 NaN'd at epoch 7 identically).
# Probe 3: halve the outer step (dt 0.25 x k=2 -> outer 0.5 fs, the
#   step the single-rate 4k run integrates stably) -- isolates "1.0 fs
#   GNN impulse at 4k" as the failure.
# Probe 4: 512 atoms + cells builder + MTS (outer 1.0 fs) -- isolates
#   the cells edge builder (the 512 MTS success used nbr_mode=table).
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
  timeout 14400 "$@" > "results/r4_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
}

run water_512_mts_cells python scripts/run_water.py \
  -size 4 -nbr_mode cells -rdf_backend pallas -frame_skip 1 \
  -compute_dtype bf16 -nepochs 60 -mts 2 \
  -logdir results/water_512_mts_cells_r4

run water_4k_mts_dt25 python scripts/run_water.py \
  -size 8 -nbr_mode cells -rdf_backend pallas -frame_skip 1 \
  -compute_dtype bf16 -nepochs 60 -mts 2 -dt_override 0.25 \
  -logdir results/water_4k_mts_dt25_r4

echo "=== QUEUE3 COMPLETE $(date -u) ===" | tee -a results/r4_logs/queue.log
