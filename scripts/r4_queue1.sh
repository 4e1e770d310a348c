#!/usr/bin/env bash
# Round-4 queue 1: water 4k x MTS, third take.
# Queue 24 (N-scaled Q) NaN'd at epoch 6; queue 27 (Q=50, the validated
# single-rate 4k mass) NaN'd at epoch 4 -- so the bath-mass *value* was
# not the variable.  Hypothesis: the reference-convention link masses
# [Q, Q/N, ...] (md.py:191-193) give Q/N = 0.012 at N=4096 -- a stiff
# chain that integrates at dt=0.5 fs but not at the MTS outer step of
# 1.0 fs (the 512-atom MTS run had Q/N = 0.098, 8x softer).  Probe/fix:
# canonical N-invariant MTK masses via -nhc_tau (Q0 = N_dof kT tau^2,
# Qk = kT tau^2), tau = 25 fs = 25x the outer step.
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
  timeout 14400 "$@" > "results/r4_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
}

run water_4k_mts_tau python scripts/run_water.py \
  -size 8 -nbr_mode cells -rdf_backend pallas -frame_skip 1 \
  -compute_dtype bf16 -nepochs 300 -mts 2 -nhc_tau 25 \
  -logdir results/water_4k_mts_r4

echo "=== QUEUE1 COMPLETE $(date -u) ===" | tee -a results/r4_logs/queue.log
