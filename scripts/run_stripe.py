#!/usr/bin/env python
"""2-D stripe-phase (SplineOverlap) pair-potential fitting runner.

Parity target: the reference registers 2-D stripe systems
(/root/reference/scripts/data.py:454-483, SplineOverlap potential
torchmd/potentials.py:123-149) and fits them through the same fit_lj
driver with a 2-D square-lattice System
(fit_rdf_pair.py:124-155).  40x40 = 1600 atoms, reduced units, kT = 0.07.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-logdir", type=str, default="outputs/stripe")
    p.add_argument("-data", type=str, nargs="+",
                   default=["overlap_0.9766_T0.07"])
    p.add_argument("-cutoff", type=float, default=8.0)
    p.add_argument("-dt", type=float, default=0.005)
    p.add_argument("-lr", type=float, default=1e-3)
    p.add_argument("-sigma", type=float, default=0.55)
    p.add_argument("-pretrain", type=int, default=1000)
    p.add_argument("-nepochs", type=int, default=300)
    p.add_argument("-opt_freq", type=int, default=60,
                   help="MD steps per epoch")
    p.add_argument("-frame_skip", type=int, default=5,
                   help="RDF frame subsampling; 1 averages every step "
                        "(the per-epoch RDF estimator's noise floor sets "
                        "the converged loss -- more frames, lower floor)")
    p.add_argument("--dry_run", action="store_true")
    args = p.parse_args()

    assignments = {
        "nbins": 128, "opt_freq": args.opt_freq, "lr": args.lr,
        "sigma": args.sigma, "gaussian_width": 0.1, "n_width": 128,
        "n_layers": 3, "nonlinear": "SELU",
        "rdf_weight": 1.0, "vacf_weight": 0.0, "train_vacf": "False",
        # the SplineOverlap ground truth is BOUNDED at r=0 (soft core,
        # V0/(16 pi) ~ 20); a hard r^-12 prior gets canceled by BI
        # pretraining wherever the target g > 0, leaving a cliff below
        # the data range -> first-epoch NaN.  Use the bounded
        # GaussianCore prior instead (potentials.GaussianCore).
        "prior": "gauss", "prior_epsilon": 2.0,
    }
    sys_params = {
        "size": 25, "cutoff": args.cutoff, "t_range": 20,
        "n_epochs": args.nepochs, "n_sim": 10, "data": args.data,
        "val": None, "topology_update_freq": 1,
        "pretrain_iters": args.pretrain, "dt": args.dt,
        "frame_skip": args.frame_skip,
    }
    if args.dry_run:
        assignments["opt_freq"] = 11
        sys_params.update(n_epochs=2, n_sim=1, t_range=5,
                          frame_skip=2, pretrain_iters=30)

    from mdgrad_tpu.train.fit_rdf_pair import fit_lj
    out = fit_lj(assignments, sys_params,
                 model_path=os.path.join(args.logdir, "0"))
    print("objective:", out["objective"])


if __name__ == "__main__":
    main()
