#!/usr/bin/env bash
# Round-5 queue 11: tpair attempt 6 (VERDICT item 2), contingent on
# attempt 5 (r5e) bailing.  Runs under the erosion-triggered backtrack
# (the r5d postmortem: fail/clean thrash bled the step-scale budget
# with 29 backtracks unused) + dt-backoff + fresh seed.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p results/r5_logs

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r5_logs/queue.log
  timeout "$TMO" "$@" > "results/r5_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r5_logs/queue.log
}

if grep -q "NaN bailout" results/r5_logs/tpair_multi_r5e.log; then
  TMO=5400
  run tpair_multi_r5f python scripts/run_water_multi.py --tpair \
    -data H20_298K_redd H20_308K_redd H20_368K_redd -val H20_338K_redd \
    -nepochs 360 -nsim 10 -capacity_slack 3.0 \
    -overflow_policy regrow -u_reg_weight 5.0 -u_floor_mult 1.5 \
    -lr_schedule cosine -max_backtracks 30 -seed 3 --dt_backoff \
    -logdir results/water_tpair_multi_r5f
else
  echo "=== r5e succeeded; queue 11 skipped $(date -u) ===" | tee -a results/r5_logs/queue.log
fi

echo "=== QUEUE11 COMPLETE $(date -u) ===" | tee -a results/r5_logs/queue.log
