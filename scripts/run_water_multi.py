#!/usr/bin/env python
"""Concurrent multi-temperature water fitting: the sharded replacement
for the reference's serial state-point loop
(/root/reference/scripts/fit_rdf_gnn.py:388).

All requested temperatures train in ONE compiled dp-sharded program
(train/fit_rdf_multi.py); on a single chip the stacked program fills the
device the serial loop leaves idle."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-logdir", type=str, default="outputs/water_multi")
    p.add_argument("-data", type=str, nargs="+",
                   default=["H20_298K_redd", "H20_308K_redd",
                            "H20_338K_redd"])
    p.add_argument("-val", type=str, nargs="+", default=None,
                   help="held-out state points: evaluated at inference "
                        "with the trained params, never trained on")
    p.add_argument("-nepochs", type=int, default=500)
    p.add_argument("-nsim", type=int, default=10)
    p.add_argument("-size", type=int, default=4)
    p.add_argument("-frame_skip", type=int, default=20)
    p.add_argument("-lr", type=float, default=None)
    p.add_argument("-compute_dtype", type=str, default="float32")
    p.add_argument("--tpair", action="store_true",
                   help="temperature-transferable TPairMLP u(r, kT) -- "
                        "the model whose fit IS a multi-temperature fit "
                        "(per-state kT grafted inside the vmapped body)")
    p.add_argument("-capacity_slack", type=float, default=2.0)
    p.add_argument("-overflow_policy", type=str, default="warn",
                   choices=["warn", "skip", "regrow"])
    p.add_argument("-regrow_factor", type=float, default=1.5)
    p.add_argument("-u_reg_weight", type=float, default=0.0,
                   help="well-depth guard weight (pair/tpair): penalize "
                        "deepening past u_floor_mult x pretrained depth")
    p.add_argument("-u_floor_mult", type=float, default=1.5)
    p.add_argument("-pretrain", type=int, default=1000)
    p.add_argument("-lr_schedule", type=str, default="plateau",
                   choices=["plateau", "cosine"],
                   help="cosine: deterministic decay to cosine_alpha*lr "
                        "over the run (tempers late-run steps; immune to "
                        "the plateau schedule's noise-triggered collapse)")
    p.add_argument("-cosine_alpha", type=float, default=0.05)
    p.add_argument("-backtrack_every", type=int, default=10,
                   help="snapshot cadence for checkpoint-backtrack "
                        "NaN recovery")
    p.add_argument("-max_backtracks", type=int, default=8)
    p.add_argument("--dt_backoff", action="store_true",
                   help="halve the training dt for dt_hold clean epochs "
                        "after each backtrack (integration-error rescue)")
    p.add_argument("-dt_hold", type=int, default=20)
    p.add_argument("-seed", type=int, default=0,
                   help="rng seed for lattice momenta + rethermalize "
                        "draws -- a fresh stochastic path through the "
                        "hazardous loss region")
    p.add_argument("--dry_run", action="store_true")
    args = p.parse_args()

    if args.tpair:
        # pair-MLP best params (reference run_water.py:55-56); nbins 109
        # keeps the multistate dense soft-histogram in HBM (the serial
        # driver's 400-bin loss streams through the Pallas RDF kernel,
        # which the stacked engine does not use); inference stays 800-bin
        assignments = {
            "cutoff": 6.0, "epsilon": 1.8245160642515632,
            "gaussian_width": 0.15, "lr": args.lr or 0.0006548601438181719,
            "n_layers": 3, "n_width": 115, "nbins": 109,
            "nonlinear": "ELU", "opt_freq": 192, "power": 12,
            "sigma": 1.68191635809129,
        }
    else:
        # GNN best params (reference run_water.py:32-46)
        assignments = {
            "cutoff": 6.0, "epsilon": 0.010637550996566496,
            "gaussian_width": 0.195, "lr": args.lr or 0.0001839,
            "n_atom_basis": "low", "n_filters": "low", "n_convolutions": 2,
            "nbins": 109, "opt_freq": 52, "sigma": 2.61227614490785,
            "compute_dtype": args.compute_dtype,
        }
    sys_params = {
        "dt": 0.5, "n_epochs": args.nepochs, "n_sim": args.nsim,
        "data": args.data, "val": args.val, "size": args.size,
        "frame_skip": args.frame_skip, "topology_update_freq": 1,
        "tpair_flag": args.tpair, "capacity_slack": args.capacity_slack,
        "overflow_policy": args.overflow_policy,
        "regrow_factor": args.regrow_factor,
        "u_reg_weight": args.u_reg_weight,
        "u_floor_mult": args.u_floor_mult,
        "pretrain_iters": args.pretrain,
        "lr_schedule": args.lr_schedule,
        "cosine_alpha": args.cosine_alpha,
        "backtrack_every": args.backtrack_every,
        "max_backtracks": args.max_backtracks,
        "dt_backoff": args.dt_backoff,
        "dt_hold": args.dt_hold,
    }
    if args.dry_run:
        assignments["opt_freq"] = 25
        sys_params.update(n_epochs=2, n_sim=1, size=2, frame_skip=5,
                          test_nbins=100, pretrain_iters=50)

    import numpy as np
    from mdgrad_tpu.train.fit_rdf_multi import fit_rdf_multistate
    out = fit_rdf_multistate(assignments, sys_params,
                             model_path=os.path.join(args.logdir, "0"),
                             rng=np.random.default_rng(args.seed))
    print("objective:", out["objective"])
    for tag, fin in out.get("final", {}).items():
        print(f"  {tag}: mse {fin['mse']:.4f}")
    if out.get("nan_bailout"):
        print(f"NaN bailout at epoch {out.get('bailout_epoch')} -- "
              "inference salvaged from the last-good snapshot")


if __name__ == "__main__":
    main()
