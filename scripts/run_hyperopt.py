#!/usr/bin/env python
"""Hyperparameter search over fitting objectives (random search).

Parity target: the reference's SigOpt loops (/root/reference/scripts/
run_sigopt.py:37-117 defines the GNN and pair search spaces and loops
suggestions).  SigOpt is a hosted service unavailable here; this driver
samples the same spaces with plain random search and logs
(assignment, objective) pairs to JSON, which covers the in-repo usage
(the spaces double as the schema of tunables).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# search spaces transcribed from reference run_sigopt.py:39-80
GNN_SPACE = {
    "n_atom_basis": ("cat", ["tiny", "low", "mid"]),
    "n_filters": ("cat", ["tiny", "low", "mid"]),
    "n_convolutions": ("int", 2, 4),
    "cutoff": ("float", 4.0, 8.0),
    "gaussian_width": ("float", 0.05, 0.5),
    "lr": ("log", 1e-5, 1e-3),
    "opt_freq": ("int", 40, 200),
    "nbins": ("int", 60, 128),
    "sigma": ("float", 1.5, 3.0),
    "epsilon": ("log", 5e-3, 2e-2),
}

PAIR_SPACE = {
    "n_width": ("int", 64, 160),
    "n_layers": ("int", 2, 5),
    "nonlinear": ("cat", ["SELU", "ELU", "Tanh"]),
    "cutoff": ("float", 4.0, 8.0),
    "gaussian_width": ("float", 0.05, 0.5),
    "lr": ("log", 1e-5, 1e-3),
    "opt_freq": ("int", 40, 200),
    "nbins": ("int", 60, 128),
    "sigma": ("float", 1.5, 3.0),
    "epsilon": ("log", 0.5, 2.0),
    "power": ("int", 9, 12),
}


def sample(space, rng):
    out = {}
    for k, spec in space.items():
        kind = spec[0]
        if kind == "cat":
            out[k] = spec[1][rng.integers(len(spec[1]))]
        elif kind == "int":
            out[k] = int(rng.integers(spec[1], spec[2] + 1))
        elif kind == "float":
            out[k] = float(rng.uniform(spec[1], spec[2]))
        elif kind == "log":
            out[k] = float(np.exp(rng.uniform(np.log(spec[1]),
                                              np.log(spec[2]))))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-logdir", type=str, default="outputs/hyperopt")
    p.add_argument("-data", type=str, nargs="+",
                   default=["H20_298K_redd"])
    p.add_argument("-n_trials", type=int, default=20)
    p.add_argument("-nepochs", type=int, default=200)
    p.add_argument("--pair", action="store_true")
    p.add_argument("--dry_run", action="store_true")
    p.add_argument("-dt", type=float, default=0.5)
    p.add_argument("-seed", type=int, default=0)
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    space = PAIR_SPACE if args.pair else GNN_SPACE
    os.makedirs(args.logdir, exist_ok=True)
    results = []

    from mdgrad_tpu.train.fit_rdf import fit_rdf
    from mdgrad_tpu.data import exp_rdf_data_dict, pair_data_dict
    registry = dict(exp_rdf_data_dict)
    registry.update({k: pair_data_dict[k] for k in pair_data_dict
                     if k not in registry})
    for trial in range(args.n_trials):
        assignments = sample(space, rng)
        sys_params = {
            "dt": args.dt, "n_epochs": 2 if args.dry_run else args.nepochs,
            "n_sim": 1 if args.dry_run else 10,
            "data": args.data, "val": None,
            "size": 2 if args.dry_run else 4,
            "anneal_flag": "False", "pair_flag": args.pair,
            "tpair_flag": False, "topology_update_freq": 1,
        }
        if args.dry_run:
            assignments["opt_freq"] = 21
            # small dry-run boxes cannot host the full cutoff range
            assignments["cutoff"] = min(assignments["cutoff"], 2.5)
            assignments["gaussian_width"] = min(
                assignments["gaussian_width"], 0.2)
            sys_params.update(frame_skip=5, test_nbins=100,
                              pretrain_iters=30)
        try:
            out = fit_rdf(assignments, sys_params,
                          registry=registry)
            obj = float(out["objective"])
        except Exception as e:  # NaN-type failures score a penalty
            print(f"trial {trial} failed: {e}")
            obj = 5.0
        results.append({"trial": trial, "objective": obj,
                        "assignments": assignments})
        results.sort(key=lambda r: r["objective"])
        with open(os.path.join(args.logdir, "results.json"), "w") as f:
            json.dump(results, f, indent=1)
        print(f"trial {trial}: objective {obj:.5f} "
              f"(best {results[0]['objective']:.5f})")


if __name__ == "__main__":
    main()
