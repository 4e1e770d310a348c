#!/usr/bin/env python
"""ONE consolidated Pallas-pair-kernel table (VERDICT r2 weak #7).

Same measurement protocol for every N and every path -- a single jitted
energy+force evaluation, averaged over reps after warmup:

  xla     -- XLA dense masked O(N^2) value_and_grad (autodiff force)
  pallas  -- fused plain kernel (energy + analytic in-kernel forces)
  dpallas -- make_lj_force custom-vjp kernel (the differentiable path
             that sits inside fitting adjoints), force-only call

Round 2 reported the plain kernel losing at N=1372 in one table while
the custom-vjp path won 2.3x at the same N in another (different
protocols).  This bench settles the per-N verdict under one protocol.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mdgrad_tpu import units
from mdgrad_tpu.system import System
from mdgrad_tpu import potentials
from mdgrad_tpu.interface import PairPotentials
from mdgrad_tpu.ops.pallas_pair import lj_energy_forces, make_lj_force

CUT = 2.5


def setup(size):
    sys_ = System.from_lattice("fcc", size, 1.679)
    sys_.set_temperature(1.2 / units.kB, rng=np.random.default_rng(0))
    xyz = jnp.asarray(sys_.get_positions())
    cell_len = jnp.asarray(np.diag(sys_.get_cell()))
    return sys_, xyz, cell_len


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    print(f"devices: {jax.devices()}", flush=True)
    print(f"{'N':>6} {'xla(us)':>9} {'pallas(us)':>11} "
          f"{'dpallas(us)':>12} {'pallas/xla':>11} {'dpallas/xla':>12}",
          flush=True)
    for size in (3, 7, 10, 13):      # 108 / 1372 / 4000 / 8788
        sys_, xyz, cell_len = setup(size)
        lj = potentials.LennardJones(1.0, 1.0)
        inter = PairPotentials(sys_, lj, cutoff=CUT, mode="dense")
        p = lj.init_params()

        xla = jax.jit(jax.value_and_grad(
            lambda q: inter.energy(p, q, ())))
        t_x = timeit(xla, xyz)

        pal = jax.jit(lambda q: lj_energy_forces(
            q, cell_len, CUT, 1.0, 1.0))
        t_p = timeit(pal, xyz)

        dforce = make_lj_force(np.asarray(cell_len), CUT)
        dpal = jax.jit(lambda q: dforce(q, 1.0, 1.0))
        t_d = timeit(dpal, xyz)

        n = xyz.shape[0]
        print(f"{n:>6} {t_x * 1e6:>9.0f} {t_p * 1e6:>11.0f} "
              f"{t_d * 1e6:>12.0f} {t_x / t_p:>10.2f}x "
              f"{t_x / t_d:>11.2f}x", flush=True)


if __name__ == "__main__":
    main()
