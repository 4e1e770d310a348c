#!/usr/bin/env bash
# Round-4 queue 9: retakes exposed by queue 6's first pass --
#  1. NPT LJ EOS calibration with best-model selection/patience stop
#     (first run converged at epoch 30 then drifted along the EOS-
#     degenerate valley to rho 1.80)
#  2. tpair 3-temp multistate resume (died NaN at epoch 185/500; the
#     driver now restores last-good and halves the update scale)
set -uo pipefail
cd "$(dirname "$0")/.."

if [ -f /tmp/q8.pid ]; then
  while kill -0 "$(cat /tmp/q8.pid)" 2>/dev/null; do sleep 60; done
fi

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
  timeout "$TMO" "$@" > "results/r4_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
}

TMO=3600
run npt_lj2 python scripts/run_npt_fit.py -data lj_0.845_1.2 \
  -size 3 -nepochs 150 -opt_freq 60 -lr 5e-3 \
  -logdir results/npt_lj_r4b

run tpair_multi2 python scripts/run_water_multi.py --tpair \
  -data H20_298K_redd H20_308K_redd H20_368K_redd -val H20_338K_redd \
  -nepochs 500 -nsim 10 -logdir results/water_tpair_multi_r4

echo "=== QUEUE9 COMPLETE $(date -u) ===" | tee -a results/r4_logs/queue.log
