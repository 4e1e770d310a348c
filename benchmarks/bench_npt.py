#!/usr/bin/env python
"""NPT overhead: NVT (NHC) vs NPT (NHC + Berendsen barostat) epoch
throughput, fwd-only and fwd+bwd, LJ liquid.

The barostat adds one strain-derivative grad-eval per step
(thermo.pressure) on top of the stepper's one force eval -- the
expected ceiling is ~2x; XLA fusion inside the scan usually lands
better.  No reference comparison exists (the reference has no
constant-pressure path)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mdgrad_tpu import potentials, units
from mdgrad_tpu.system import System
from mdgrad_tpu.interface import PairPotentials
from mdgrad_tpu.md import NoseHooverChain, NPTBerendsenNHC, Simulation

RHO, T_RED, CUT, TAU = 0.845, 1.2, 2.5, 120
A = (4 / RHO) ** (1 / 3)


def bench(kind, size=6, reps=5):
    sys_ = System.from_lattice("fcc", size, A)  # size=6 -> 864 atoms
    sys_.set_temperature(T_RED / units.kB, rng=np.random.default_rng(0))
    pair = PairPotentials(sys_, potentials.LennardJones(1.0, 1.0),
                          cutoff=CUT)
    if kind == "nvt":
        integ = NoseHooverChain(pair, sys_, T=T_RED / units.kB, Q=50.0,
                                num_chains=5, adjoint=True)
    else:
        integ = NPTBerendsenNHC(pair, sys_, T=T_RED / units.kB, P=3.6,
                                Q=50.0, num_chains=5, adjoint=True)
    sim = Simulation(sys_, integ)
    ode = sim.epoch_fn(0.005, TAU)
    state, aux = sim.initial_state()
    ctrl = integ.default_ctrl()

    def fwd(p):
        traj, _ = ode(p, state, aux, ctrl)
        return (traj.q[-1] ** 2).mean()

    for tag, fn in (("fwd", jax.jit(fwd)),
                    ("fwd+bwd", jax.jit(jax.value_and_grad(fwd)))):
        out = fn(sim.params)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(sim.params)
        jax.block_until_ready(out)
        el = (time.perf_counter() - t0) / reps
        n = sys_.get_number_of_atoms()
        print(f"N={n} {kind:4s} {tag:8s} {el * 1e3:8.1f} ms/epoch "
              f"({TAU / el:8.1f} steps/s)")


def main():
    print(f"devices: {jax.devices()}")
    for kind in ("nvt", "npt"):
        bench(kind)


if __name__ == "__main__":
    main()
