#!/usr/bin/env bash
# Third round-3 queue: waits for r3_queue2.sh, then runs the new
# pallas-gather A/B, the multistate overhead ablation, and the RELAUNCHED
# 5-state LJ + pressure fit (the first attempt OOM'd at compile; fixed by
# the lax.map/checkpoint virial, commit e073d30).
set -uo pipefail
cd "$(dirname "$0")/.."

while ! grep -q "QUEUE2 COMPLETE" results/r3_logs/queue.log 2>/dev/null; do
  sleep 60
done

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

run bench_pallas_gather python benchmarks/bench_pallas_gather.py
run bench_multistate_ablate python benchmarks/bench_multistate_ablate.py

rm -rf results/lj_multi_r3
run lj_pressure2 python scripts/run_lj.py \
  -data lj_0.845_0.75 lj_0.845_1.2 lj_0.7_1 lj_0.5_1.2 lj_0.3_1.2 \
  -size 5 -opt_freq 120 -lr 1e-4 -pretrain 2000 -burnin 30 \
  -frame_skip 1 -state_reset_every 10 -grad_clip 1.0 -nepochs 200 \
  -pressure_weight 0.05 -logdir results/lj_multi_r3

run bench_final python bench.py

echo "=== QUEUE3 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
