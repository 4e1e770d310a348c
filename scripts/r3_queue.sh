#!/usr/bin/env bash
# Round-3 TPU workload queue: one job at a time on the single chip.
# Logs under results/r3_logs/. Run from repo root in the background.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p results/r3_logs

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
  timeout 14400 "$@" > "results/r3_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r3_logs/queue.log
}

# 1. backward-attack sweep (informs the headline)
run bench_backward python benchmarks/bench_backward.py

# 2. GNN multistate wall-clock (serial loop vs stacked program)
run bench_multistate_gnn python benchmarks/bench_multistate_gnn.py 4

# 2b. consolidated pallas pair-kernel table (one protocol, all paths)
run bench_pair_kernel python benchmarks/bench_pair_kernel.py

# 3. water multi-T concurrent GNN fit (the flagship demo)
run water_multi python scripts/run_water_multi.py \
  -logdir results/water_multi_r3 -nepochs 500 -nsim 10

# 4. temperature-transferable TpairMLP: 3 train temps + held-out 338 K
run water_tpair python scripts/run_water.py --tpair \
  -data H20_298K_redd H20_308K_redd H20_368K_redd -val H20_338K_redd \
  -nepochs 500 -nsim 10 -logdir results/water_tpair_r3

# 5. angle-target water fit at compute_dtype=mixed
run water_angle_mixed python scripts/run_water.py --angle \
  -compute_dtype mixed -nepochs 500 -nsim 20 \
  -logdir results/water_angle_mixed_r3

# 6. 5-state LJ rerun with the virial-pressure target
run lj_pressure python scripts/run_lj.py \
  -data lj_0.845_0.75 lj_0.845_1.2 lj_0.7_1 lj_0.5_1.2 lj_0.3_1.2 \
  -size 5 -opt_freq 120 -lr 1e-4 -pretrain 2000 -burnin 30 \
  -frame_skip 1 -state_reset_every 10 -grad_clip 1.0 -nepochs 200 \
  -pressure_weight 0.05 -logdir results/lj_multi_r3

# 7. stripe cut12 continuation (+300 epochs from the r2 checkpoint)
mkdir -p results/stripe_r3
cp -r results/stripe_cut12_r2/0 results/stripe_r3/0 2>/dev/null || true
run stripe_cont python scripts/run_stripe.py \
  -data overlap_0.9766_T0.07_cut12 -cutoff 12.0 -nepochs 450 \
  -logdir results/stripe_r3
run stripe_analyze python scripts/analyze_stripe.py \
  results/stripe_r3/0 overlap_0.9766_T0.07_cut12 -out results/stripe_r3

# 8. official headline bench (MFU + bounded vs_baseline)
run bench python bench.py

echo "=== QUEUE COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
