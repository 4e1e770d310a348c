#!/usr/bin/env bash
# Round-5 queue 10: the tpair lottery, attempts 4-5 (VERDICT item 2).
# Evidence so far: the loss-27-31 band is a per-descent stability
# lottery (~1/3 pass rate both pre- and post-wrap-fix: r4b passed, two
# pre-fix runs died at ~186; post-fix r5 passed the band but was
# crippled by the plateau lr collapse, r5b/r5c died in it).  Give the
# run more tickets: a big backtrack budget (each backtrack = one fresh
# descent draw), gentle 0.25 re-entry step scale, a fresh seed, and
# extra epochs to compensate the rewinds.  Attempt 5 (different seed)
# only runs if attempt 4 bails.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p results/r5_logs

# wait for queue 9 (difftre_r5c + validation) to finish
if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r5_logs/queue.log
  timeout "$TMO" "$@" > "results/r5_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r5_logs/queue.log
}

TMO=5400
run tpair_multi_r5d python scripts/run_water_multi.py --tpair \
  -data H20_298K_redd H20_308K_redd H20_368K_redd -val H20_338K_redd \
  -nepochs 360 -nsim 10 -capacity_slack 3.0 \
  -overflow_policy regrow -u_reg_weight 5.0 -u_floor_mult 1.5 \
  -lr_schedule cosine -max_backtracks 30 -seed 1 \
  -logdir results/water_tpair_multi_r5d

if grep -q "NaN bailout" results/r5_logs/tpair_multi_r5d.log; then
  run tpair_multi_r5e python scripts/run_water_multi.py --tpair \
    -data H20_298K_redd H20_308K_redd H20_368K_redd -val H20_338K_redd \
    -nepochs 360 -nsim 10 -capacity_slack 3.0 \
    -overflow_policy regrow -u_reg_weight 5.0 -u_floor_mult 1.5 \
    -lr_schedule cosine -max_backtracks 30 -seed 2 --dt_backoff \
    -logdir results/water_tpair_multi_r5e
fi

echo "=== QUEUE10 COMPLETE $(date -u) ===" | tee -a results/r5_logs/queue.log
