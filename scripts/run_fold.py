#!/usr/bin/env python
"""Polymer-folding runner (parity: /root/reference/demo/run_fold.py:59-65)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-logdir", type=str, default="outputs/fold")
    p.add_argument("-nepochs", type=int, default=500)
    p.add_argument("-method", type=str, default="NH_verlet",
                   choices=["NH_verlet", "verlet", "rk4"])
    p.add_argument("--dry_run", action="store_true")
    args = p.parse_args()

    params = {
        "n_atoms": 50, "n_spiral": 10, "a_spiral": 1.5,
        "dz_spiral": 0.25, "loss_cutoff": 5.0, "k0": 2.0,
        "epsilon": 0.1, "sigma": 1.0, "n_atom_basis": 64,
        "n_filters": 64, "n_gaussians": 32, "n_convolutions": 3,
        "cutoff": 4.0, "T": 0.05, "method": args.method, "dt": 0.02,
        "tau": 49, "lr": 1e-3, "l_b": 1.0, "l_a": 1.0, "l_d": 1.0,
        "l_dis": 1.0, "n_epochs": args.nepochs,
    }
    if args.dry_run:
        params.update(n_atoms=16, n_spiral=3, tau=11, n_epochs=3,
                      n_atom_basis=32, n_filters=32, n_gaussians=16,
                      n_convolutions=2, cutoff=3.0, loss_cutoff=4.0)

    from mdgrad_tpu.train.fold import train_fold
    out = train_fold(params, model_path=args.logdir)
    print("objective:", out["objective"])


if __name__ == "__main__":
    main()
