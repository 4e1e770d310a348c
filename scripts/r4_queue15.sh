#!/usr/bin/env bash
# Round-4 queue 15: per-state stability probe of the lj_multi_r3g
# candidate (which state kills the DiffTRe sampling, and when), plus
# the same probe on the TRUTH potential as a control.
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
  timeout "$TMO" "$@" > "results/r4_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
}

TMO=2700
run diag_stability python scripts/diag_lj_stability.py \
  -init_pkl results/lj_multi_r3g/0/best_eval.pkl -steps 15000 -seeds 2

echo "=== QUEUE15 COMPLETE $(date -u) ===" | tee -a results/r4_logs/queue.log
