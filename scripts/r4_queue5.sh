#!/usr/bin/env bash
# Round-4 queue 5: the DiffTRe rerun (VERDICT r3 next-round #1).
# Round 3's queue 26 compile-OOMed (all-frames vmap of the jvp-of-grad
# virial, 76.4G vs 15.75G HBM); the engine now chunks per-frame maps
# through lax.map(batch_size=8) + jax.checkpoint (CLAUDE.md rule 7).
# Same workload: 5-state LJ + pressure targets, warm from the best
# validated trajectory-gradient candidate + a from-scratch control,
# then the gradient-cost bench and a full validation sweep.
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
  timeout 14400 "$@" > "results/r4_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
}

run difftre_warm python scripts/run_difftre.py \
  -data lj_0.845_0.75 lj_0.845_1.2 lj_0.7_1 lj_0.5_1.2 lj_0.3_1.2 \
  -size 5 -lr 3e-4 -n_outer 30 -inner_steps 60 \
  -n_frames 48 -steps_between 60 -equil_steps 1200 \
  -pressure_weight 0.3 -target_nsim 30 -capacity_slack 2.5 \
  -init_pkl results/lj_multi_r3g/0/best_eval.pkl \
  -logdir results/lj_difftre_r4

run difftre_scratch python scripts/run_difftre.py \
  -data lj_0.845_0.75 lj_0.845_1.2 lj_0.7_1 lj_0.5_1.2 lj_0.3_1.2 \
  -size 5 -lr 3e-4 -n_outer 30 -inner_steps 60 \
  -n_frames 48 -steps_between 60 -equil_steps 1200 \
  -pressure_weight 0.3 -target_nsim 30 -capacity_slack 2.5 \
  -pretrain 2000 \
  -logdir results/lj_difftre_scratch_r4

run bench_difftre python benchmarks/bench_difftre.py

run validate_difftre python scripts/validate_lj_best.py \
  -run results/lj_difftre_r4 \
  -candidates best.pkl truth ../lj_difftre_scratch_r4/best.pkl \
  ../lj_multi_r3g/0/best_eval.pkl

echo "=== QUEUE5 COMPLETE $(date -u) ===" | tee -a results/r4_logs/queue.log
