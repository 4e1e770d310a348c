#!/usr/bin/env bash
# Round-5 queue 8: runs after the (orphaned) difftre_r5b continuation.
#   1. bench_headline4 -- the scan-unroll ladder (idle host): the clean
#      round-2 probe pinned the N=512 epoch as fusion-count bound
#      (~1.04 ms/step vs 0.27 ms MXU / 2.1 ms HBM floors); unroll=k is
#      the remaining semantics-preserving lever.
#   2. validate_difftre_r5b -- low-noise validation of the 36-outer
#      lr 2e-5 continuation with a same-protocol truth control.
#   3. tpair_multi_r5b -- VERDICT item 2 rerun under the fixed driver
#      (logdir cleaned: the killed 03:50 run left epoch-99 checkpoints
#      that FitCheckpointer would resume from).
#   4. bench.py -- official headline under whatever config wins.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p results/r5_logs

# wait for the difftre python (orphaned child of the killed queue 7)
if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r5_logs/queue.log
  timeout "$TMO" "$@" > "results/r5_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r5_logs/queue.log
}

TMO=2400
run bench_headline4 python benchmarks/bench_headline_r5.py base unroll2 \
  unroll4 unroll8 unroll4_direct

TMO=2700
run validate_difftre_r5b python scripts/validate_lj_best.py \
  -run results/lj_difftre_r5b \
  -eq_epochs 8 -sample_epochs 16 \
  -candidates best.pkl ../lj_difftre_r5/best.pkl truth

TMO=5400
run tpair_multi_r5b python scripts/run_water_multi.py --tpair \
  -data H20_298K_redd H20_308K_redd H20_368K_redd -val H20_338K_redd \
  -nepochs 300 -nsim 10 -capacity_slack 3.0 \
  -overflow_policy regrow -u_reg_weight 5.0 -u_floor_mult 1.5 \
  -logdir results/water_tpair_multi_r5b

TMO=1800
run bench_official python bench.py

echo "=== QUEUE8 COMPLETE $(date -u) ===" | tee -a results/r5_logs/queue.log
