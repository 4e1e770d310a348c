#!/usr/bin/env bash
# Consolidated round-3 follow-up queue (replaces r3_queue2.sh/r3_queue3.sh,
# which were killed while still waiting): short decision-informing benches
# first, then the two big verdict-item fits, then the final headline bench.
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

# -- short benches that inform headline/default decisions -------------------
run bench_pallas_gather python benchmarks/bench_pallas_gather.py
run bench_multistate_ablate python benchmarks/bench_multistate_ablate.py
run bench_backward2 python benchmarks/bench_backward2.py

# slack-1.25 validation fit: overflow-free at full fit length?
run water_slim python scripts/run_water.py -nepochs 150 -nsim 5 \
  -compute_dtype bf16 -capacity_slack 1.25 \
  -logdir results/water_slim_r3

# -- big verdict-item fits --------------------------------------------------
# tpair retake: pallas streaming RDF loss (the 400-bin dense backward was
# ~30 s/epoch), 300 epochs, 3 train temps + held-out 338 K
run water_tpair2 python scripts/run_water.py --tpair \
  -data H20_298K_redd H20_308K_redd H20_368K_redd -val H20_338K_redd \
  -nepochs 300 -nsim 10 -rdf_backend pallas \
  -logdir results/water_tpair_r3

# 5-state LJ + virial pressure (first attempt compile-OOM'd; fixed by the
# lax.map/checkpoint virial, commit e073d30)
rm -rf results/lj_multi_r3
run lj_pressure2 python scripts/run_lj.py \
  -data lj_0.845_0.75 lj_0.845_1.2 lj_0.7_1 lj_0.5_1.2 lj_0.3_1.2 \
  -size 5 -opt_freq 120 -lr 1e-4 -pretrain 2000 -burnin 30 \
  -frame_skip 1 -state_reset_every 10 -grad_clip 1.0 -nepochs 200 \
  -pressure_weight 0.05 -logdir results/lj_multi_r3

# corrected multistate wall-clock (equal K both sides), small + flagship
run bench_multistate_small python benchmarks/bench_multistate_gnn.py 2

run bench_final python bench.py

echo "=== QUEUE4 COMPLETE $(date -u) ===" | tee -a results/r3_logs/queue.log
