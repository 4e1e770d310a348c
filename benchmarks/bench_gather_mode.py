#!/usr/bin/env python
"""Measure the gather vs one-hot aggregation crossover in N.

Sets `mdgrad_tpu.nn.schnet.ONEHOT_MAX_ATOMS` (the 'auto' threshold):
the (N*K, N) one-hot matmul's FLOPs are quadratic in N while the
gather's bytes are linear, so the winning mode flips with system size
(VERDICT r2 weak #5).  Full fit-epoch fwd+bwd (adjoint) timing -- the
mode also changes the BACKWARD (scatter-adds vs matmuls), so forward-
only timing would mislead.
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
from mdgrad_tpu.nn import SchNet
from mdgrad_tpu.interface import GNNPotentials
from mdgrad_tpu.md import NoseHooverChain, Simulation

TAU = 30


def bench(mode, size, reps=3, basis=64):
    rng = np.random.default_rng(0)
    sys_ = System.from_lattice("fcc", size, 1.679)
    sys_.set_temperature(1.0 / units.kB, rng=rng)
    n = sys_.get_number_of_atoms()
    gnn = SchNet({"n_atom_basis": basis, "n_filters": basis,
                  "n_gaussians": 32, "n_convolutions": 2, "cutoff": 2.5,
                  "compute_dtype": "bf16", "gather_mode": mode})
    inter = GNNPotentials(sys_, gnn, cutoff=2.5,
                          nbr_mode="cells" if n > 4000 else "table",
                          k_max=64)
    integ = NoseHooverChain(inter, sys_, T=1.0 / units.kB, Q=50.0,
                            num_chains=5, adjoint=True)
    sim = Simulation(sys_, integ)
    ode = sim.epoch_fn(0.005, TAU)
    state, aux = sim.initial_state()
    ctrl = integ.default_ctrl()

    def loss(p):
        traj, _ = ode(p, state, aux, ctrl)
        return (traj.q[-1] ** 2).sum()

    vg = jax.jit(jax.value_and_grad(loss))
    l, g = vg(sim.params)
    jax.block_until_ready(l)
    t0 = time.perf_counter()
    for _ in range(reps):
        l, g = vg(sim.params)
    jax.block_until_ready(l)
    el = (time.perf_counter() - t0) / reps
    print(f"N={n:6d} {mode:6s} {el * 1e3:9.1f} ms/epoch "
          f"({TAU / el:7.1f} fit steps/s)", flush=True)
    return n, el


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rows = {}
    for size in (4, 6, 8, 10, 13):   # 256 / 864 / 2048 / 4000 / 8788
        for mode in ("onehot", "gather"):
            try:
                n, el = bench(mode, size)
                rows.setdefault(n, {})[mode] = el
            except Exception as e:  # noqa: BLE001
                print(f"size={size} {mode} FAILED: {str(e)[:150]}",
                      flush=True)
    print("\nN      onehot/gather speed ratio (>1 => gather wins)")
    for n, r in sorted(rows.items()):
        if len(r) == 2:
            print(f"{n:6d} {r['onehot'] / r['gather']:.2f}")


if __name__ == "__main__":
    main()
