#!/usr/bin/env bash
# Round-4 queue 4: 4k x MTS bisection, probes 5+6.
# Ruled out: bath masses (q24/q27/probe1), bf16 (probe2), cells builder
# (probe3: 512+cells+MTS stable), outer step size (probe4: outer 0.5 fs
# STILL NaNs at 4k while single-rate 0.5 fs is stable 300 epochs).
# Probe 5: lr=0 -- pure MD through the MTS stepper at the pretrain
#   params.  NaN => the stepper itself diverges at 4k; stable => the
#   instability is training-coupled.
# Probe 6: prior forced DENSE at 4k -- the one remaining structural
#   difference vs the stable 512 runs (mode='auto' flips the prior to
#   the padded sparse list at N^2 > 2^20; in MTS the prior is the inner
#   fast force evaluated 3x per outer step).
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
  timeout 14400 "$@" > "results/r4_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
}

run water_4k_mts_lr0 python scripts/run_water.py \
  -size 8 -nbr_mode cells -rdf_backend pallas -frame_skip 1 \
  -compute_dtype bf16 -nepochs 60 -mts 2 -lr_override 0.0 \
  -logdir results/water_4k_mts_lr0_r4

run water_4k_mts_dense python scripts/run_water.py \
  -size 8 -nbr_mode cells -rdf_backend pallas -frame_skip 1 \
  -compute_dtype bf16 -nepochs 30 -mts 2 -prior_mode dense \
  -logdir results/water_4k_mts_dense_r4

echo "=== QUEUE4 COMPLETE $(date -u) ===" | tee -a results/r4_logs/queue.log
