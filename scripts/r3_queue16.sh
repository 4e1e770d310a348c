#!/usr/bin/env bash
# water_4k inference retake: resumes from the epoch-299 checkpoint (the
# training completed; only the inference phase OOM'd on the xla
# observer) and runs the 800-bin inference on the pallas backend.
set -uo pipefail
cd "$(dirname "$0")/.."

while ! grep -q "QUEUE15 COMPLETE" results/r3_logs/queue.log 2>/dev/null; do
  sleep 60
done

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

run water_4k_inf python scripts/run_water.py \
  -data H20_298K_redd -size 8 -nbr_mode cells \
  -compute_dtype bf16 -rdf_backend pallas -frame_skip 1 \
  -nepochs 300 -nsim 10 -logdir results/water_4k_r3

echo "=== QUEUE16 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
