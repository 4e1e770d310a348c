#!/usr/bin/env python
"""Per-state dynamical-stability probe for a saved LJ pair candidate.

The r4 DiffTRe warm retakes (warm5/warm6) died in SAMPLING at the
lj_multi_r3g warm-start params for every momenta redraw once the
per-outer trajectory exceeded ~7-8k steps, while the short-outer warm3
run (4k steps/outer, params moving between outers) survived -- evidence
that the best trajectory-gradient candidate is itself dynamically
unstable over production-length runs.  This probe runs each state point
separately at the fixed candidate params and reports where (and
whether) the trajectory goes non-finite, over several momenta seeds.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-init_pkl", type=str,
                   default="results/lj_multi_r3g/0/best_eval.pkl")
    p.add_argument("-data", type=str, nargs="+",
                   default=["lj_0.845_0.75", "lj_0.845_1.2", "lj_0.7_1",
                            "lj_0.5_1.2", "lj_0.3_1.2"])
    p.add_argument("-size", type=int, default=5)
    p.add_argument("-sigma", type=float, default=0.9)
    p.add_argument("-cutoff", type=float, default=2.5)
    p.add_argument("-steps", type=int, default=15000)
    p.add_argument("-chunk", type=int, default=500,
                   help="epoch length; -chunk == -steps replays the "
                        "round-4 failure mode (one long single-epoch "
                        "scan, the DiffTRe sample_frames equilibration "
                        "shape) -- safe only with the in-scan wrap")
    p.add_argument("-seeds", type=int, default=2)
    p.add_argument("-capacity_slack", type=float, default=2.5)
    p.add_argument("--truth", action="store_true",
                   help="probe the registry ground-truth potential "
                        "instead of the saved candidate (sampler "
                        "control: any blowup is the engine, not the "
                        "candidate)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from mdgrad_tpu import potentials as pot_zoo, units
    from mdgrad_tpu.nn import PairMLP
    from mdgrad_tpu.interface import PairPotentials, Stack
    from mdgrad_tpu.md import NoseHooverChain, Simulation, rethermalize
    from mdgrad_tpu.train.fit_rdf_pair import get_system, registry_T_kelvin
    from mdgrad_tpu.data.registry import pair_data_dict

    print("devices:", jax.devices(), flush=True)
    net = PairMLP(n_gauss=int(args.cutoff // 0.1), r_start=0.0,
                  r_end=args.cutoff, n_width=128, n_layers=3,
                  nonlinear="SELU")
    prior = pot_zoo.LJFamily(epsilon=2.0, sigma=args.sigma, rep_pow=6,
                             attr_pow=3)
    src = None
    if not args.truth:
        with open(args.init_pkl, "rb") as f:
            blob = pickle.load(f)
        src = blob["params"] if "params" in blob else blob

    for tag in args.data:
        entry = pair_data_dict[tag]
        dt = entry.get("dt", 0.01)
        for seed in range(args.seeds):
            rng = np.random.default_rng(seed)
            system = get_system(tag, args.size, pair_data_dict, rng=rng)
            if args.truth:
                from mdgrad_tpu.train.fit_rdf_pair import \
                    resolve_target_pot
                tp = resolve_target_pot(entry["target_pot"])
                stack = Stack({"pair": PairPotentials(system, tp,
                                                      cutoff=args.cutoff)})
            else:
                stack = Stack({
                    "pairnn": PairPotentials(
                        system, net, cutoff=args.cutoff, mode="table",
                        capacity_slack=args.capacity_slack),
                    "pair": PairPotentials(system, prior,
                                           cutoff=args.cutoff),
                })
            integ = NoseHooverChain(stack, system,
                                    T=registry_T_kelvin(entry), Q=50.0,
                                    num_chains=5, adjoint=False)
            sim = Simulation(system, integ)
            if not args.truth:
                params = dict(sim.params)
                params["pairnn"] = jax.device_put(src["pairnn"])
                sim.params = params
            st, aux = sim.initial_state()
            sim.state = rethermalize(
                st, registry_T_kelvin(entry) * units.kB,
                system.get_masses(), rng=rng, dim=system.dim)
            sim.aux = aux
            died = None
            for start in range(0, args.steps, args.chunk):
                sim.simulate(steps=args.chunk, dt=dt,
                             frequency=args.chunk)
                if not np.all(np.isfinite(np.asarray(sim.state.q))):
                    died = start + args.chunk
                    break
            status = (f"NaN by step {died}" if died
                      else f"stable through {args.steps}")
            print(f"{tag} seed {seed}: {status}", flush=True)


if __name__ == "__main__":
    main()
