#!/usr/bin/env python
"""Retinal quantum-yield optimization runner.

Parity target: /root/reference/demo/isom.py __main__ (:226-316) and
demo/isom.sh: ``python isom.py -logdir isom -lr 1e-2 -nepochs 40``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-logdir", type=str, default="outputs/isom")
    p.add_argument("-lr", type=float, default=1e-2)
    p.add_argument("-nepochs", type=int, default=40)
    p.add_argument("--adam", action="store_true", default=False)
    p.add_argument("--dry_run", action="store_true")
    args = p.parse_args()

    kwargs = dict(n_epochs=args.nepochs, lr=args.lr, adam=args.adam,
                  logdir=args.logdir)
    if args.dry_run:
        kwargs.update(n_epochs=2, n_steps=500, look_back=200)

    from mdgrad_tpu.train.isom import fit_isomerization
    out = fit_isomerization(**kwargs)
    print("final yield:", out["q_yields"][-1])


if __name__ == "__main__":
    main()
