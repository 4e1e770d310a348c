#!/usr/bin/env bash
# Round-5 queue 5: reruns unblocked by the adjoint bool-leaf fix
# (38042d9) and the fit_rdf_multi inference/plateau fixes.
#   1. bench_4k_budget variants -- the components probe showed the
#      prior's sparse rebuild is 158 ms of the ~196 ms per-step budget
#      at N=4096; share_aux deletes it (VERDICT item 3).
#   2. headline round-2 probe -- per-call timing + dense-prior skin/uf
#      variants (the first sweep's 'frozen' 0.1 ms was a harness
#      artifact; share_aux itself HURTS at N=512).
#   3. 4k fit under share_prior_aux -- item 3's "fit unchanged" check.
#   4. tpair-multistate rerun under the fixed driver (VERDICT item 2).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p results/r5_logs

if [ -f /tmp/r5q4.pid ]; then
  while kill -0 "$(cat /tmp/r5q4.pid)" 2>/dev/null; do sleep 60; done
fi

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r5_logs/queue.log
  timeout "$TMO" "$@" > "results/r5_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r5_logs/queue.log
}

TMO=3600
run bench_4k_budget2 python benchmarks/bench_4k_budget.py base share \
  share_uf3 share_skin5 share_pallas share_onehot share_uf3_pl

run bench_headline2 python benchmarks/bench_headline_r5.py base share \
  direct direct_uf4 direct_uf8 \
  uf2 uf4 uf8 frozen_dense frozen noobs_dense tau104_dense

TMO=7200
run water_4k_share python scripts/run_water.py -size 8 -nbr_mode cells \
  -rdf_backend pallas -frame_skip 1 -nepochs 300 --share_prior_aux \
  -data H20_298K_redd -logdir results/water_4k_share_r5

TMO=5400
run tpair_multi_r5b python scripts/run_water_multi.py --tpair \
  -data H20_298K_redd H20_308K_redd H20_368K_redd -val H20_338K_redd \
  -nepochs 300 -nsim 10 -capacity_slack 3.0 \
  -overflow_policy regrow -u_reg_weight 5.0 -u_floor_mult 1.5 \
  -logdir results/water_tpair_multi_r5b

echo "=== QUEUE5 COMPLETE $(date -u) ===" | tee -a results/r5_logs/queue.log
