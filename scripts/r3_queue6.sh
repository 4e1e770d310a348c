#!/usr/bin/env bash
# Fourth round-3 queue: after queue5, quantify the PairPotentials
# mode='table' win (the lj_pressure OOM fix) with the A/B epoch bench
# and a table-mode retake of the tpair workload.
set -uo pipefail
cd "$(dirname "$0")/.."

while ! grep -q "QUEUE5 COMPLETE" results/r3_logs/queue.log 2>/dev/null; do
  sleep 60
done

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

run bench_pair_table python benchmarks/bench_pair_table.py

# tpair retake on the table path: same config as water_tpair2 (which ran
# dense at ~30 s/epoch), fresh logdir -> workload-scale dense/table A/B
# frame_skip 1: the dense-run RDF came out over-structured (peak 3.6 vs
# 2.6) -- the under-averaged estimator failure documented in BENCH.md;
# per-frame averaging over all 192 window frames via the streaming
# pallas backend
run water_tpair3 python scripts/run_water.py --tpair \
  -data H20_298K_redd H20_308K_redd H20_368K_redd -val H20_338K_redd \
  -nepochs 400 -nsim 10 -rdf_backend pallas -frame_skip 1 \
  -logdir results/water_tpair_table_r3

echo "=== QUEUE6 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
