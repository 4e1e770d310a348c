#!/usr/bin/env bash
# Round-4 queue 11: the two retakes the queue-10 postmortems call for.
#
# 1. tpair_multi4 -- resume the 3-temp concurrent TpairMLP fit past its
#    epoch-186 neighbor-capacity overflow (368 K state densified beyond
#    slack 2.0): same logdir, -capacity_slack 3.0 (table K is a
#    build-time shape, so the resume costs one recompile; params/opt/MD
#    states restore from the epoch-184 checkpoint).
# 2. difftre_warm5 -- the lr-1e-5 / ess_min-0.5 configuration the
#    queue-10 diagnosis prescribes: a per-parameter step small enough
#    that total-U moves ~kT (extensive energy, N=500) so reweighting
#    actually ENGAGES (multiple deterministic inner steps per sample),
#    plus 5x the equilibration (the outer-0 frames at equil=1200 were
#    visibly unequilibrated: p_hat ~2x the long-run pressures).
#    Success bar: inner steps > 1 sustained, and validation >= the
#    warm start (no degradation).  This is a demonstration run for the
#    engine's designed regime, not the LJ-workload winner -- BENCH.md
#    records the trajectory-gradient fit as the standing best.
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
  timeout "$TMO" "$@" > "results/r4_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
}

TMO=2700
run tpair_multi4 python scripts/run_water_multi.py --tpair \
  -data H20_298K_redd H20_308K_redd H20_368K_redd -val H20_338K_redd \
  -nepochs 300 -nsim 10 -capacity_slack 3.0 \
  -logdir results/water_tpair_multi_r4

TMO=3300
run difftre_warm5 python scripts/run_difftre.py \
  -data lj_0.845_0.75 lj_0.845_1.2 lj_0.7_1 lj_0.5_1.2 lj_0.3_1.2 \
  -size 5 -lr 1e-5 -ess_min 0.5 -n_outer 12 -inner_steps 40 \
  -n_frames 48 -steps_between 100 -equil_steps 6000 \
  -pressure_weight 0.3 -target_nsim 30 -capacity_slack 2.5 \
  -init_pkl results/lj_multi_r3g/0/best_eval.pkl \
  -logdir results/lj_difftre_warm5_r4

TMO=2400
run validate_difftre5 python scripts/validate_lj_best.py \
  -run results/lj_difftre_warm5_r4 \
  -eq_epochs 8 -sample_epochs 16 \
  -candidates best.pkl truth ../lj_multi_r3g/0/best_eval.pkl

echo "=== QUEUE11 COMPLETE $(date -u) ===" | tee -a results/r4_logs/queue.log
