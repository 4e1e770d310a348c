#!/usr/bin/env bash
# Seventh round-3 queue: refinement follow-ups after the vacf run.
#  - lj_pressure3: the pressure-target fit at lr 2e-5 (the lr 1e-4 run
#    never descended below its pretrained epoch-0 loss -- per-epoch
#    instantaneous virial noise ~ +-0.3 at P~0.5 swamps a 1e-4 step;
#    smaller steps let the pressure term refine instead of wander).
set -uo pipefail
cd "$(dirname "$0")/.."

while ! grep -q "QUEUE8 COMPLETE" results/r3_logs/queue.log 2>/dev/null; do
  sleep 60
done

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

run lj_pressure3 python scripts/run_lj.py \
  -data lj_0.845_0.75 lj_0.845_1.2 lj_0.7_1 lj_0.5_1.2 lj_0.3_1.2 \
  -size 5 -opt_freq 120 -lr 2e-5 -pretrain 2000 -burnin 30 \
  -frame_skip 1 -state_reset_every 10 -grad_clip 1.0 -nepochs 200 \
  -pressure_weight 0.05 -logdir results/lj_multi_r3b

echo "=== QUEUE9 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
