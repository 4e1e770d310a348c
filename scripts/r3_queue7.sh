#!/usr/bin/env bash
# Fifth round-3 queue: 7-temperature concurrent water GNN fit -- the
# flagship multistate demo at the reference's full temperature spread
# (serial loop it replaces: /root/reference/scripts/fit_rdf_gnn.py:388).
set -uo pipefail
cd "$(dirname "$0")/.."

while ! grep -q "QUEUE6 COMPLETE" results/r3_logs/queue.log 2>/dev/null; do
  sleep 60
done

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

run water_multi7 python scripts/run_water_multi.py \
  -data H20_298K_redd H20_308K_redd H20_338K_redd H20_368K_redd \
        H20_288K_wu H20_388K_wu H20_0.978_342K \
  -nepochs 500 -nsim 10 -logdir results/water_multi7_r3

run bench_final2 python bench.py

echo "=== QUEUE7 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
