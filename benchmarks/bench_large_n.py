#!/usr/bin/env python
"""Large-N LJ NVE sampling throughput: cell list vs Pallas dense-tile vs
XLA dense, on the real TPU.

VERDICT r1 #3 closure: the fixed-capacity cell list (ops/cells.py) exists
to reach scales the reference's O(N^2) topology (torchmd/topology.py:30-73)
cannot; this records the 50k-atom number.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from mdgrad_tpu.system import System
from mdgrad_tpu import potentials, units
from mdgrad_tpu.interface import PairPotentials
from mdgrad_tpu.ops.cells import CellLJPair
from mdgrad_tpu.md import NVE, Simulation

CUT = 2.5


def make_system(n_cells, rng):
    sys_ = System.from_lattice("fcc", n_cells, 1.679)
    sys_.set_temperature(1.2 / units.kB, rng=rng)  # kT = 1.2 reduced
    sys_.positions = sys_.positions + 0.05 * rng.standard_normal(
        sys_.positions.shape)
    return sys_


def bench(pot_name, system, steps=200, dt=0.002):
    n = system.get_number_of_atoms()
    if pot_name == "dense":
        pot = PairPotentials(system, potentials.LennardJones(0.9, 1.0),
                             cutoff=CUT, mode="dense")
    elif pot_name == "cells":
        pot = CellLJPair(system, CUT, sigma=0.9, epsilon=1.0)
    elif pot_name == "pallas":
        from mdgrad_tpu.ops.pallas_pair import PallasLJPair
        pot = PallasLJPair(system, CUT, sigma=0.9, epsilon=1.0)
    integ = NVE(pot, system, adjoint=False)
    sim = Simulation(system, integ)
    # compile + warm with the SAME shape that is timed (a different
    # `steps` is a different XLA program)
    traj = sim.simulate(steps=steps, dt=dt, frequency=steps)
    jax.block_until_ready(traj.q)
    t0 = time.perf_counter()
    traj = sim.simulate(steps=steps, dt=dt, frequency=steps)
    jax.block_until_ready(traj.q)
    el = time.perf_counter() - t0
    sps = steps / el
    print(f"N={n:6d} {pot_name:7s} {sps:9.1f} steps/s "
          f"({n * sps / 1e6:8.1f} Matom-steps/s)")
    return sps


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}")
    for n_cells, backends in [
        (7, ("dense", "pallas", "cells")),     # 1,372
        (14, ("pallas", "cells")),             # 10,976
        (23, ("pallas", "cells")),             # 48,668
        (32, ("cells",)),                      # 131,072
    ]:
        system = make_system(n_cells, rng)
        for b in backends:
            try:
                bench(b, system)
            except Exception as e:  # noqa: BLE001 - OOM is a data point
                print(f"N={system.get_number_of_atoms()} {b} FAILED: "
                      f"{str(e)[:100]}")


if __name__ == "__main__":
    main()
