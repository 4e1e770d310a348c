#!/usr/bin/env bash
# Round-5 queue 6: relaunch of the work lost to the machine restart at
# 01:45 UTC (queue 4 died ~68 min into difftre_r5b; queue 5 never ran),
# reordered so the unmet verdict-item criteria land first:
#   1. bench_headline2  -- round-2 headline probe: direct backprop +
#      skin/uf ladder with the DENSE prior kept (VERDICT item 4)
#   2. bench_4k_budget2 -- share_aux epoch variants after the adjoint
#      bool-leaf fix (VERDICT item 3 measurement)
#   3. water_direct_r5  -- the slim-r3 headline fit protocol with
#      adjoint=0 (direct backprop): fit-validates the candidate new
#      headline config (criterion: inference MSE in the slim-r3/r2
#      band, <= 0.02)
#   4. water_4k_share_r5 -- 300-epoch 4k fit under share_prior_aux
#      (VERDICT item 3 "fit unchanged" criterion: MSE <= 0.002)
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p results/r5_logs

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r5_logs/queue.log
  timeout "$TMO" "$@" > "results/r5_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r5_logs/queue.log
}

TMO=3600
run bench_headline2 python benchmarks/bench_headline_r5.py base direct \
  direct_uf4 direct_uf8 uf2 uf4 uf8 frozen_dense noobs_dense \
  tau104_dense share

run bench_4k_budget2 python benchmarks/bench_4k_budget.py base share \
  share_uf3 share_skin5 share_pallas share_onehot share_uf3_pl

TMO=2700
run water_direct_r5 python scripts/run_water.py -nepochs 150 -nsim 5 \
  -compute_dtype bf16 -capacity_slack 1.25 -adjoint 0 \
  -logdir results/water_direct_r5

TMO=7200
run water_4k_share python scripts/run_water.py -size 8 -nbr_mode cells \
  -rdf_backend pallas -frame_skip 1 -nepochs 300 --share_prior_aux \
  -data H20_298K_redd -logdir results/water_4k_share_r5

echo "=== QUEUE6 COMPLETE $(date -u) ===" | tee -a results/r5_logs/queue.log
