#!/usr/bin/env python
"""Molten-salt charge recovery through the Ewald path (see
mdgrad_tpu/train/fit_salt.py).  Beyond-reference workload: no charged
system exists in the reference."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-logdir", default="results/salt")
    p.add_argument("-n_cells", type=int, default=3)
    p.add_argument("-a", type=float, default=6.2)
    p.add_argument("-T", type=float, default=2500.0)
    p.add_argument("-q_true", type=float, default=0.8)
    p.add_argument("-q0", type=float, default=0.4)
    p.add_argument("-nepochs", type=int, default=200)
    p.add_argument("-tau", type=int, default=60)
    p.add_argument("-lr", type=float, default=2e-2)
    p.add_argument("-target_nsim", type=int, default=16)
    args = p.parse_args()
    print("devices:", jax.devices(), flush=True)

    from mdgrad_tpu.train.fit_salt import fit_salt
    res = fit_salt(model_path=args.logdir, n_cells=args.n_cells, a=args.a,
                   T_kelvin=args.T, q_true=args.q_true, q0=args.q0,
                   n_epochs=args.nepochs, tau=args.tau, lr=args.lr,
                   target_nsim=args.target_nsim,
                   log=lambda *a: print(*a, flush=True))
    print(f"final qscale {res['q_final']:.4f} (truth {res['q_true']}), "
          f"loss {res['loss_final']:.6f}")


if __name__ == "__main__":
    main()
