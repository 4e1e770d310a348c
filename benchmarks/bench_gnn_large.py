#!/usr/bin/env python
"""Large-N GNN *fit epoch* (fwd+bwd adjoint): dense top_k table builder
vs the cell-list table builder (GNNPotentials nbr_mode='table' vs
'cells'), on the real TPU.

VERDICT r1 #3 closure, part 2: a >=4k-atom fit epoch where the cell list
beats the dense O(N^2) path.
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
from mdgrad_tpu.observables import rdf as rdf_obs

CUT = 2.5
TAU = 50


def bench(mode, size, reps=5):
    rng = np.random.default_rng(0)
    sys_ = System.from_lattice("fcc", size, 1.679)
    sys_.set_temperature(1.0 / units.kB, rng=rng)
    n = sys_.get_number_of_atoms()
    # mode "cells+pl" = cells edge builder + the Pallas fused
    # gather-filter-reduce aggregation kernel (ops/pallas_gather):
    # documented as losing to one-hot at N=512 (BENCH.md) but never
    # measured where the gather path itself is the winner (large N)
    nbr_mode, gather_mode = (("cells", "pallas") if mode == "cells+pl"
                             else (mode, "auto"))
    gnn = SchNet({"n_atom_basis": 32, "n_filters": 32, "n_gaussians": 16,
                  "n_convolutions": 2, "cutoff": CUT,
                  "compute_dtype": "bf16", "gather_mode": gather_mode})
    inter = GNNPotentials(sys_, gnn, cutoff=CUT, nbr_mode=nbr_mode,
                          k_max=64)
    integ = NoseHooverChain(inter, sys_, T=1.0 / units.kB, Q=50.0,
                            num_chains=5, adjoint=True,
                            topology_update_freq=1)
    sim = Simulation(sys_, integ)
    ode = sim.epoch_fn(0.005, TAU)
    obs = rdf_obs(sys_, nbins=100, r_range=(0.75, 2.4),
                  backend="pallas" if n > 2048 else "xla")
    state, aux = sim.initial_state()
    ctrl = integ.default_ctrl()

    @jax.jit
    def epoch_loss_grad(p):
        traj, _ = ode(p, state, aux, ctrl)
        _, _, g = obs(traj.q[::10])
        return ((g - 1.0) ** 2).mean()

    vg = jax.jit(jax.value_and_grad(epoch_loss_grad))
    compiled = vg.lower(sim.params).compile()
    (l, g) = compiled(sim.params)
    jax.block_until_ready(l)
    t0 = time.perf_counter()
    for _ in range(reps):
        l, g = compiled(sim.params)
    jax.block_until_ready(l)
    el = (time.perf_counter() - t0) / reps
    sps = TAU / el
    # MFU at scale: the low single-chip MFU at N=512 is occupancy-bound
    # (BENCH.md round-3 log); quantify how much utilization the large-N
    # path buys back
    mfu_s = ""
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        fl = float(ca.get("flops", 0.0))
        if fl > 0:
            tflops = fl / el / 1e12
            mfu_s = (f"  {fl / 1e9:7.1f} GFLOP/epoch {tflops:6.2f} "
                     f"TFLOP/s ({100.0 * tflops / 197.0:.2f}% MFU)")
    except Exception:  # noqa: BLE001
        pass
    print(f"N={n:6d} {mode:6s} {el * 1e3:9.1f} ms/epoch "
          f"({sps:7.1f} fit steps/s)  loss={float(l):.4f}{mfu_s}")
    return el


def main():
    print(f"devices: {jax.devices()}")
    for size in (10, 13):          # 4,000 / 8,788 atoms
        times = {}
        for mode in ("table", "cells", "cells+pl"):
            try:
                times[mode] = bench(mode, size)
            except Exception as e:  # noqa: BLE001
                print(f"size={size} {mode} FAILED: {str(e)[:120]}")
        if "table" in times and "cells" in times:
            print(f"  -> cells speedup {times['table'] / times['cells']:.2f}x")
        if "cells" in times and "cells+pl" in times:
            print(f"  -> pallas-gather vs XLA gather "
                  f"{times['cells'] / times['cells+pl']:.2f}x")


if __name__ == "__main__":
    main()
