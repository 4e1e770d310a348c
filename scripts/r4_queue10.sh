#!/usr/bin/env bash
# Round-4 queue 10 (final): DiffTRe warm retake under the new recovery
# (rethermalize + optimizer-state revert, commit 95d3a2b) at lr 1e-4 --
# warm2's lr 3e-4 collapsed ESS to 0.02 after one Adam step (1 inner
# step/outer, i.e. reweighting never engaged) and then walked into the
# state-driven NaN that param-revert alone replays deterministically.
# Then the low-noise validation sweep (shortened eq/sample to fit the
# round: 8/16 epochs vs the r3h protocol's 10/20 -- still ~30x less
# noisy than the 1-epoch training estimator), then the tpair-multistate
# resume past its epoch-185 death.
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
  timeout "$TMO" "$@" > "results/r4_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
}

TMO=3300
run difftre_warm3 python scripts/run_difftre.py \
  -data lj_0.845_0.75 lj_0.845_1.2 lj_0.7_1 lj_0.5_1.2 lj_0.3_1.2 \
  -size 5 -lr 1e-4 -n_outer 20 -inner_steps 30 \
  -n_frames 48 -steps_between 60 -equil_steps 1200 \
  -pressure_weight 0.3 -target_nsim 30 -capacity_slack 2.5 \
  -init_pkl results/lj_multi_r3g/0/best_eval.pkl \
  -logdir results/lj_difftre_warm_r4

TMO=2400
run validate_difftre2 python scripts/validate_lj_best.py \
  -run results/lj_difftre_warm_r4 \
  -eq_epochs 8 -sample_epochs 16 \
  -candidates best.pkl truth ../lj_multi_r3g/0/best_eval.pkl

TMO=2700
run tpair_multi3 python scripts/run_water_multi.py --tpair \
  -data H20_298K_redd H20_308K_redd H20_368K_redd -val H20_338K_redd \
  -nepochs 300 -nsim 10 -logdir results/water_tpair_multi_r4

echo "=== QUEUE10 COMPLETE $(date -u) ===" | tee -a results/r4_logs/queue.log
