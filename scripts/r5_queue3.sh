#!/usr/bin/env bash
# Round-5 queue 3: headline-plateau decomposition on the real chip
# (VERDICT r4 item 4).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p results/r5_logs

if [ -f /tmp/r5q2.pid ]; then
  while kill -0 "$(cat /tmp/r5q2.pid)" 2>/dev/null; do sleep 30; done
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

run bench_headline python benchmarks/bench_headline_r5.py

# item-3 done-criterion second half: the 4k fit result must be
# unchanged under the shared-aux config (r3 protocol: 300 epochs,
# cells edges, pallas RDF, frame_skip 1 -> MSE 0.00137)
TMO=7200
run water_4k_share python scripts/run_water.py -size 8 -nbr_mode cells \
  -rdf_backend pallas -frame_skip 1 -nepochs 300 --share_prior_aux \
  -data H20_298K_redd -logdir results/water_4k_share_r5

echo "=== QUEUE3 COMPLETE $(date -u) ===" | tee -a results/r5_logs/queue.log
