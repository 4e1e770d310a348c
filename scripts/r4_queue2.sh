#!/usr/bin/env bash
# Round-4 queue 2: 4k x MTS bisection, probe 2.
# Probe 1 (MTK tau=25 fs masses) NaN'd at epoch 7 -- thermostat masses
# are not the variable (queue 24: N-scaled Q, NaN ep 6; queue 27: Q=50,
# NaN ep 4).  Remaining deltas vs the stable 512-atom MTS run: bf16
# filter nets (1% force error applied as 2x-weight impulses) and the
# 1.0 fs outer step itself at 8x the atom count (8x the per-step tail
# exposure to steep first-shell configurations).  This probe drops
# bf16 only.
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
  timeout 14400 "$@" > "results/r4_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
}

run water_4k_mts_f32 python scripts/run_water.py \
  -size 8 -nbr_mode cells -rdf_backend pallas -frame_skip 1 \
  -compute_dtype float32 -nepochs 300 -mts 2 -nhc_tau 25 \
  -logdir results/water_4k_mts_r4f32

echo "=== QUEUE2 COMPLETE $(date -u) ===" | tee -a results/r4_logs/queue.log
