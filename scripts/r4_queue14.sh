#!/usr/bin/env bash
# Round-4 queue 14: tpair-multistate from SCRATCH with the well-depth
# guard (u_reg_weight 5, floor 1.5x the pretrained depth) -- the queue
# 10-12 close-out diagnosed the epoch-186 instability as the well
# walking to -3 eV (~117 kT); the guard makes that region expensive.
# regrow + salvage semantics active throughout.
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
  timeout "$TMO" "$@" > "results/r4_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
}

TMO=5400
run tpair_multi6 python scripts/run_water_multi.py --tpair \
  -data H20_298K_redd H20_308K_redd H20_368K_redd -val H20_338K_redd \
  -nepochs 300 -nsim 10 -capacity_slack 3.0 \
  -overflow_policy regrow -u_reg_weight 5.0 -u_floor_mult 1.5 \
  -logdir results/water_tpair_multi_r4b

echo "=== QUEUE14 COMPLETE $(date -u) ===" | tee -a results/r4_logs/queue.log
