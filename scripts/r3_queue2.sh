#!/usr/bin/env bash
# Follow-up queue: waits for r3_queue.sh to finish, then runs the
# re-tuned tpair fit and the corrected benches.
set -uo pipefail
cd "$(dirname "$0")/.."

while ! grep -q "QUEUE COMPLETE" results/r3_logs/queue.log 2>/dev/null; do
  sleep 60
done

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

# tpair retake: pallas streaming RDF loss (the 400-bin dense backward
# was ~30 s/epoch), 300 epochs
run water_tpair2 python scripts/run_water.py --tpair \
  -data H20_298K_redd H20_308K_redd H20_368K_redd -val H20_338K_redd \
  -nepochs 300 -nsim 10 -rdf_backend pallas \
  -logdir results/water_tpair_r3

# slim-capacity x dtype on the headline
run bench_backward2 python benchmarks/bench_backward2.py

# corrected multistate wall-clock (equal K both sides), small + flagship
run bench_multistate_small python benchmarks/bench_multistate_gnn.py 2
run bench_multistate_512 python benchmarks/bench_multistate_gnn.py 4

# slack-1.25 validation fit: overflow-free at full fit length?
run water_slim python scripts/run_water.py -nepochs 150 -nsim 5 \
  -compute_dtype bf16 -capacity_slack 1.25 \
  -logdir results/water_slim_r3

echo "=== QUEUE2 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
