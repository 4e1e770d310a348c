#!/usr/bin/env bash
# Round-5 queue 9:
#   1. tpair_multi_r5c -- VERDICT item 2, third attempt, under the
#      checkpoint-backtrack recovery + cosine lr decay landed after the
#      queue-8 postmortem (the NaN path could never walk params back;
#      reactive plateau scheduling both collapsed on noise and failed
#      to temper late-run steps).
#   2. difftre_r5c -- gentle lr 1e-5 continuation from the r5b best
#      (combined 0.05663, depth -0.8653): the lr 2e-5 leg burned 6 of
#      36 outers in an ESS-collapse excursion; halving lr trades speed
#      for staying inside the trust region while the depth marches.
#   3. validate_difftre_r5c -- low-noise validation with truth control.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p results/r5_logs

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r5_logs/queue.log
  timeout "$TMO" "$@" > "results/r5_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r5_logs/queue.log
}

TMO=5400
run tpair_multi_r5c python scripts/run_water_multi.py --tpair \
  -data H20_298K_redd H20_308K_redd H20_368K_redd -val H20_338K_redd \
  -nepochs 300 -nsim 10 -capacity_slack 3.0 \
  -overflow_policy regrow -u_reg_weight 5.0 -u_floor_mult 1.5 \
  -lr_schedule cosine \
  -logdir results/water_tpair_multi_r5c

TMO=7800
run difftre_r5c python scripts/run_difftre.py \
  -data lj_0.845_0.75 lj_0.845_1.2 lj_0.7_1 lj_0.5_1.2 lj_0.3_1.2 \
  -size 5 -lr 1e-5 -ess_min 0.5 -n_outer 24 -inner_steps 40 \
  -n_frames 48 -steps_between 100 -equil_steps 3000 \
  -pressure_weight 0.3 -target_nsim 30 -capacity_slack 2.5 \
  -init_pkl results/lj_difftre_r5b/best.pkl \
  -logdir results/lj_difftre_r5c

TMO=2700
run validate_difftre_r5c python scripts/validate_lj_best.py \
  -run results/lj_difftre_r5c \
  -eq_epochs 8 -sample_epochs 16 \
  -candidates best.pkl ../lj_difftre_r5b/best.pkl truth

echo "=== QUEUE9 COMPLETE $(date -u) ===" | tee -a results/r5_logs/queue.log
