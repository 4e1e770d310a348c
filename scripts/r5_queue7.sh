#!/usr/bin/env bash
# Round-5 queue 7: (1) CLEAN headline rerun -- the queue-6 sweep was
# contaminated by a concurrent 14-min CPU pytest run (base read 81.4 ms
# vs the clean 58.6; the 1-core host serializes dispatch against any
# other load), so keep the host idle this time; (2) the tpair-multistate
# rerun under the fixed driver (VERDICT item 2); (3) the DiffTRe 36-outer
# lr 2e-5 continuation + validation (VERDICT item 1 stretch: depth),
# relaunched after the 01:45 UTC machine restart killed the original.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p results/r5_logs

if [ -f /tmp/r5q6.pid ]; then
  while kill -0 "$(cat /tmp/r5q6.pid)" 2>/dev/null; do sleep 30; done
fi

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r5_logs/queue.log
  timeout "$TMO" "$@" > "results/r5_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r5_logs/queue.log
}

TMO=2400
run bench_headline3 python benchmarks/bench_headline_r5.py base direct \
  tau104_dense frozen_dense noobs_dense uf4

TMO=5400
run tpair_multi_r5b python scripts/run_water_multi.py --tpair \
  -data H20_298K_redd H20_308K_redd H20_368K_redd -val H20_338K_redd \
  -nepochs 300 -nsim 10 -capacity_slack 3.0 \
  -overflow_policy regrow -u_reg_weight 5.0 -u_floor_mult 1.5 \
  -logdir results/water_tpair_multi_r5b

TMO=7800
run difftre_r5b python scripts/run_difftre.py \
  -data lj_0.845_0.75 lj_0.845_1.2 lj_0.7_1 lj_0.5_1.2 lj_0.3_1.2 \
  -size 5 -lr 2e-5 -ess_min 0.5 -n_outer 36 -inner_steps 40 \
  -n_frames 48 -steps_between 100 -equil_steps 3000 \
  -pressure_weight 0.3 -target_nsim 30 -capacity_slack 2.5 \
  -init_pkl results/lj_difftre_r5/best.pkl \
  -logdir results/lj_difftre_r5b

TMO=2700
run validate_difftre_r5b python scripts/validate_lj_best.py \
  -run results/lj_difftre_r5b \
  -eq_epochs 8 -sample_epochs 16 \
  -candidates best.pkl ../lj_difftre_r5/best.pkl truth

echo "=== QUEUE7 COMPLETE $(date -u) ===" | tee -a results/r5_logs/queue.log
