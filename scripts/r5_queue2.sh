#!/usr/bin/env bash
# Round-5 queue 2 (runs after queue 1 frees the chip):
#  (a) 4k-cells budget decomposition + share_aux/skin variants
#      (VERDICT r4 item 3 -- find the >=3x)
#  (b) tpair-multistate rerun of the queue-14 depth-guard config with
#      LIVE EMA best-iterate selection (VERDICT r4 item 2)
#  (c) NPT density calibration with windowed-average selection + RDF
#      degeneracy-breaking term (item 5)
#  (d) molten-salt charge recovery with cosine lr decay + live EMA
#      selection (item 6)
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p results/r5_logs

# wait for queue 1 to release the TPU
if [ -f /tmp/r5q1.pid ]; then
  while kill -0 "$(cat /tmp/r5q1.pid)" 2>/dev/null; do sleep 30; done
fi

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r5_logs/queue.log
  timeout "$TMO" "$@" > "results/r5_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r5_logs/queue.log
}

TMO=3600
run bench_4k_budget python benchmarks/bench_4k_budget.py

TMO=5400
run tpair_multi_r5 python scripts/run_water_multi.py --tpair \
  -data H20_298K_redd H20_308K_redd H20_368K_redd -val H20_338K_redd \
  -nepochs 300 -nsim 10 -capacity_slack 3.0 \
  -overflow_policy regrow -u_reg_weight 5.0 -u_floor_mult 1.5 \
  -logdir results/water_tpair_multi_r5

TMO=3600
run npt_lj_r5 python scripts/run_npt_fit.py -data lj_0.845_1.2 \
  -size 3 -nepochs 150 -opt_freq 60 -lr 5e-3 \
  -logdir results/npt_lj_r5

TMO=1800
run salt_r5 python scripts/run_salt.py -logdir results/salt_r5

echo "=== QUEUE2 COMPLETE $(date -u) ===" | tee -a results/r5_logs/queue.log
