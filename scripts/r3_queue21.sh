#!/usr/bin/env bash
# Round-3 queue 21: full-scale retinal quantum-yield optimization.
# Round 1 committed only 3 epochs (yield 0.592 -> 0.606); the reference
# improves its GIF yield over 40-60 epochs (demo/isom.sh: -nepochs 40).
# Run the full 40 at the same settings.
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

run gnn_large_mfu python benchmarks/bench_gnn_large.py

run bench_npt python benchmarks/bench_npt.py

run isom_full python scripts/run_isom.py \
  -logdir results/isom_r3 -lr 1e-2 -nepochs 40

echo "=== QUEUE21 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
