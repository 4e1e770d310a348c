#!/usr/bin/env bash
# Sixth round-3 queue: RDF+VACF joint fit (the mdgrad paper's canonical
# LJ experiment; first committed run with vacf_weight > 0).  dt=0.01
# matches the registry VACF target's lag grid
# (vacf_rho0.845_T0.75_dt0.01.csv).
set -uo pipefail
cd "$(dirname "$0")/.."

while ! grep -q "QUEUE7 COMPLETE" results/r3_logs/queue.log 2>/dev/null; do
  sleep 60
done

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

run lj_rdf_vacf python scripts/run_lj.py \
  -data lj_0.845_0.75 -size 4 -dt 0.01 -vacf_weight 0.5 \
  -opt_freq 120 -lr 1e-4 -pretrain 2000 -burnin 20 -frame_skip 1 \
  -grad_clip 1.0 -nepochs 150 -logdir results/lj_vacf_r3

echo "=== QUEUE8 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
