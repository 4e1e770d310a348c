#!/usr/bin/env bash
# Round-3 queue 19: (a) lr-1e-4 retake of the 5-state LJ+pressure fit
# WITH the fixed best_eval machinery (the r3c lr-2e-5 refinement won the
# validated combined objective but regressed the well depth to -0.84;
# the original -0.975-depth run predates the equilibrated-eval
# selection), (b) unified validation of every candidate incl. the
# ground-truth-potential protocol control, (c) RDF+VACF decomposition
# for the vacf joint fit, (d) a-Si 4096-atom size-transfer inference.
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

run lj_pressure5 python scripts/run_lj.py \
  -data lj_0.845_0.75 lj_0.845_1.2 lj_0.7_1 lj_0.5_1.2 lj_0.3_1.2 \
  -size 5 -opt_freq 120 -lr 1e-4 -pretrain 2000 -burnin 30 \
  -frame_skip 1 -state_reset_every 10 -grad_clip 1.0 -nepochs 200 \
  -pressure_weight 0.05 -capacity_slack 2.5 -eval_every 10 \
  -logdir results/lj_multi_r3d

run validate_lj_r3d python scripts/validate_lj_best.py \
  -run results/lj_multi_r3d/0 \
  -candidates best_eval.pkl pretrain truth \
  ../../lj_multi_r3/0/best.pkl ../../lj_multi_r3c/0/best_eval.pkl

run validate_vacf_r3b python scripts/validate_lj_best.py \
  -run results/lj_vacf_r3b/0 \
  -candidates best_eval.pkl best.pkl pretrain truth

run si_transfer_4k python scripts/si_transfer.py \
  -logdir results/si_4k_r3

echo "=== QUEUE19 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
