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
    p.add_argument("-cutoff", type=float, default=5.0)
    p.add_argument("-opt_freq", type=int, default=40)
    p.add_argument("-start_T", type=float, default=1500.0)
    p.add_argument("-anneal_rate", type=float, default=5.0)
    p.add_argument("-epsilon", type=float, default=0.05)
    p.add_argument("-sigma", type=float, default=2.0)
    p.add_argument("-lr", type=float, default=2e-4)
    p.add_argument("-nbins", type=int, default=119)
    p.add_argument("-rdf_backend", type=str, default="xla",
                   choices=["xla", "pallas"],
                   help="pallas streams the soft histogram; use for "
                        "high-resolution (-nbins 800) refinement, where "
                        "the training loss matches the 800-bin inference "
                        "metric exactly")
    p.add_argument("-compute_dtype", type=str, default="float32")
    p.add_argument("--no_anneal", action="store_true")
    p.add_argument("--reset_opt", action="store_true",
                   help="fresh optimizer when resuming from a checkpoint")
    p.add_argument("--dry_run", action="store_true")
    args = p.parse_args()

    # r2 recipe: the amorphous target cannot be reached from a cold
    # diamond crystal -- melt-quench annealing (start_T 1500 K -> 100 K)
    # disorders the structure the way the reference's anneal path does
    # (fit_rdf_gnn.py:392-399); cutoff 5 A covers the second Si shell
    # (~3.8 A, the r1 cutoff 3.0 saw only the first); the stronger
    # ExcludedVolume prior closes the learned short-range hole.
    assignments = {
        "cutoff": args.cutoff, "epsilon": args.epsilon,
        "gaussian_width": 0.125, "lr": args.lr,
        "n_atom_basis": "tiny", "n_filters": "low",
        "n_convolutions": 3, "nbins": args.nbins,
        "rdf_backend": args.rdf_backend, "opt_freq": args.opt_freq,
        "sigma": args.sigma, "start_T": args.start_T, "anneal_freq": 2,
        "anneal_rate": args.anneal_rate,
        "compute_dtype": args.compute_dtype,
    }
    sys_params = {
        "dt": 1.0, "n_epochs": args.nepochs, "n_sim": 20,
        "data": args.data, "val": None, "size": 4,
        "anneal_flag": "False" if args.no_anneal else "True",
        "pair_flag": False, "tpair_flag": False,
        "topology_update_freq": 1,
        "reset_opt_on_resume": args.reset_opt,
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
