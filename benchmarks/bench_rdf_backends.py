#!/usr/bin/env python
"""RDF backend crossover: XLA dense (N,N,G) vs Pallas frame-batched
streaming kernel, forward+backward, on the real TPU.

Closes VERDICT r1 weak #6 / next #10: measure where the Pallas kernel
pays for itself and record the crossover in BENCH.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mdgrad_tpu.system import System
from mdgrad_tpu.observables import rdf


def timeit(fn, *a, n=20):
    fn(*a)[0].block_until_ready() if isinstance(fn(*a), tuple) else None
    out = fn(*a)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    F, G = 20, 128
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}")
    rows = []
    for n in (512, 1024, 2048, 4096, 8192):
        L = (n / 0.034) ** (1 / 3)   # ~water number density, Angstrom
        pos = rng.uniform(0, L, (n, 3))
        system = System(pos, cell=[L, L, L])
        xyzs = jnp.asarray(rng.uniform(0, L, (F, n, 3)), jnp.float32)
        res = {"N": n}
        for backend in ("xla", "pallas"):
            try:
                obs = rdf(system, nbins=G, r_range=(0.5, 7.5),
                          backend=backend)

                @jax.jit
                def loss(x, obs=obs):
                    return (obs(x)[2] ** 2).mean()

                fwd = jax.jit(loss)
                grad = jax.jit(jax.grad(loss))
                t_f = timeit(lambda x: (fwd(x),), xyzs)
                t_g = timeit(lambda x: (grad(x),), xyzs)
                res[backend] = (t_f, t_g)
                print(f"N={n:5d} {backend:6s} fwd {t_f:8.2f} ms"
                      f"  grad {t_g:8.2f} ms  (F={F})")
            except Exception as e:  # noqa: BLE001 - OOM at large N is data
                res[backend] = ("ERR", str(e)[:80])
                print(f"N={n:5d} {backend:6s} FAILED: {str(e)[:120]}")
        rows.append(res)
    print("\n| N | xla fwd+grad (ms) | pallas fwd+grad (ms) | winner |")
    print("|---|---|---|---|")
    for r in rows:
        def tot(k):
            v = r.get(k)
            return None if (v is None or v[0] == "ERR") else v[0] + v[1]
        tx, tp = tot("xla"), tot("pallas")
        win = ("pallas" if (tx is None or (tp is not None and tp < tx))
               else "xla")
        fmt = lambda t: "OOM/ERR" if t is None else f"{t:.2f}"
        print(f"| {r['N']} | {fmt(tx)} | {fmt(tp)} | {win} |")


if __name__ == "__main__":
    main()
