#!/usr/bin/env bash
# Round-4 queue 6: the remaining VERDICT-r3 run artifacts, chained
# after queue 5 (DiffTRe) releases the chip.
#  1. 4k x MTS warm start (the bisection's conclusion: the NaN is
#     training-induced -- seed from the converged single-rate 4k
#     checkpoint and fine-tune under MTS)
#  2. isomerization to its plateau (VERDICT #7)
#  3. supervised rerun with the energy reference shift (VERDICT #8)
#  4. tpair through the multistate path, 3 temps + held-out val (#5)
#  5. NPT LJ EOS-calibration fit (first pressure-metadata consumer, #6)
#  6. SHA hyperopt at the r3 budget (#9)
#  7. tpair table-mode retake under overflow_policy=regrow (#3)
set -uo pipefail
cd "$(dirname "$0")/.."

# wait for queue 5 (PID file written at launch)
if [ -f /tmp/q5.pid ]; then
  while kill -0 "$(cat /tmp/q5.pid)" 2>/dev/null; do sleep 60; done
fi

run() {
  name=$1; shift
  echo "=== $name : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
  timeout 7200 "$@" > "results/r4_logs/$name.log" 2>&1
  echo "=== $name done rc=$? : $(date -u +%H:%M:%S) ===" | tee -a results/r4_logs/queue.log
}

run water_4k_mts_warm python scripts/run_water.py \
  -size 8 -nbr_mode cells -rdf_backend pallas -frame_skip 1 \
  -compute_dtype bf16 -nepochs 100 -mts 2 \
  -init_pkl results/water_4k_r3/0/fit-ckpt-299.pkl \
  -logdir results/water_4k_mts_warm_r4

run isom python scripts/run_isom.py -nepochs 100 \
  -logdir results/isom_r4

run supervised python scripts/run_supervised.py \
  -logdir results/supervised_r4

run tpair_multi python scripts/run_water_multi.py --tpair \
  -data H20_298K_redd H20_308K_redd H20_368K_redd -val H20_338K_redd \
  -nepochs 500 -nsim 10 -logdir results/water_tpair_multi_r4

run npt_lj python scripts/run_npt_fit.py -data lj_0.845_1.2 \
  -size 3 -nepochs 150 -opt_freq 60 -lr 5e-3 \
  -logdir results/npt_lj_r4

run hyperopt_sha python scripts/run_hyperopt.py \
  -logdir results/hyperopt_r4 -algo sha -n_trials 18 -nepochs 150

run tpair_table_regrow python scripts/run_water.py --tpair \
  -data H20_298K_redd H20_308K_redd H20_368K_redd -val H20_338K_redd \
  -nepochs 400 -nsim 10 -rdf_backend pallas -frame_skip 1 \
  -capacity_slack 2.0 -overflow_policy regrow \
  -logdir results/water_tpair_table_r4

echo "=== QUEUE6 COMPLETE $(date -u) ===" | tee -a results/r4_logs/queue.log
