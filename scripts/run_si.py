#!/usr/bin/env python
"""Amorphous-silicon RDF fitting runner.

Parity target: /root/reference/scripts/run_si.py:19-46 -- GNN assignments
with annealing from start_T for the crystalline-target entry.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-logdir", type=str, default="outputs/si")
    p.add_argument("-data", type=str, nargs="+", default=["Si_2.293_100K"])
    p.add_argument("-nepochs", type=int, default=1000)
    p.add_argument("--anneal", action="store_true")
    p.add_argument("--dry_run", action="store_true")
    args = p.parse_args()

    assignments = {
        "cutoff": 3.0, "epsilon": 0.0148, "gaussian_width": 0.12,
        "lr": 0.0002, "n_atom_basis": "tiny", "n_filters": "low",
        "n_convolutions": 3, "nbins": 119, "opt_freq": 26,
        "sigma": 1.877, "start_T": 1000.0, "anneal_freq": 5,
        "anneal_rate": 4.0,
    }
    sys_params = {
        "dt": 1.0, "n_epochs": args.nepochs, "n_sim": 10,
        "data": args.data, "val": None, "size": 4,
        "anneal_flag": "True" if args.anneal else "False",
        "pair_flag": False, "tpair_flag": False,
        "topology_update_freq": 1,
    }
    if args.dry_run:
        assignments["opt_freq"] = 25
        sys_params.update(n_epochs=2, n_sim=1, size=2, frame_skip=5,
                          test_nbins=100)

    from mdgrad_tpu.train.fit_rdf import fit_rdf
    out = fit_rdf(assignments, sys_params,
                  model_path=os.path.join(args.logdir, "0"))
    print("objective:", out["objective"])


if __name__ == "__main__":
    main()
