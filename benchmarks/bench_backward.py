#!/usr/bin/env python
"""Attack the adjoint backward on the water-SchNet headline (VERDICT r2
item 2): measure variants of the 512-atom tau=52 RDF-fit epoch.

Variants:
  base       -- bench.py configuration (stored-frame adjoint replay)
  reverse    -- true O(1) reverse-time adjoint (no stored frames: less
                HBM traffic in exchange for reverse reconstruction)
  direct     -- plain scan autodiff (stores activations; r2 lost here)
  slim_k     -- tighter neighbor capacity (capacity_slack 1.25 vs 1.6)
  skin       -- Verlet skin 0.6 A + topology refresh every 4 steps
  f32        -- float32 filter net (the angle-target quality config)
  mixed      -- f32 edge filters, bf16 node filter + split aggregation
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mdgrad_tpu.system import System
from mdgrad_tpu.nn import SchNet
from mdgrad_tpu import potentials
from mdgrad_tpu.interface import GNNPotentials, PairPotentials, Stack
from mdgrad_tpu.md import NoseHooverChain, Simulation
from mdgrad_tpu.observables import rdf as rdf_obs
from mdgrad_tpu.data.registry import get_unit_len

TAU = 52
DT = 0.5 * 0.09822694788464063


def build(dtype="bf16", slack=1.6, skin=0.0, update_freq=1,
          adjoint=True):
    L = get_unit_len(0.99749, 18.01528, 8)
    system = System.from_lattice("diamond", 4, L, symbol="O")
    system.masses = np.full(512, 18.01528)
    system.set_temperature(298.0, rng=np.random.default_rng(0))
    gnn = SchNet({"n_atom_basis": 128, "n_filters": 128,
                  "n_gaussians": 40, "n_convolutions": 2, "cutoff": 6.0,
                  "compute_dtype": dtype})
    stack = Stack({
        "nn": GNNPotentials(system, gnn, cutoff=6.0,
                            capacity_slack=slack, skin=skin),
        "prior": PairPotentials(system, potentials.ExcludedVolume(
            sigma=2.6, epsilon=0.01, power=12), cutoff=6.0,
            mode="dense"),
    })
    integ = NoseHooverChain(stack, system, T=298.0, Q=50.0, num_chains=5,
                            adjoint=adjoint,
                            topology_update_freq=update_freq)
    sim = Simulation(system, integ)
    obs = rdf_obs(system, nbins=109, r_range=(1.8, 7.5))
    return system, sim, integ, obs


def bench(name, reps=5, **kw):
    system, sim, integ, obs = build(**kw)
    ode = sim.epoch_fn(DT, TAU)
    state, aux = sim.initial_state()
    ctrl = integ.default_ctrl()
    g_target = jnp.ones(109)

    def loss_fn(params):
        traj, _ = ode(params, state, aux, ctrl)
        _, _, g = obs(traj.q[::10])
        return ((g - g_target) ** 2).mean()

    vg = jax.jit(jax.value_and_grad(loss_fn))
    try:
        loss, grads = vg(sim.params)
        jax.block_until_ready(loss)
    except Exception as e:  # noqa: BLE001
        print(f"{name:10s} FAILED: {str(e)[:120]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(reps):
        loss, grads = vg(sim.params)
    jax.block_until_ready(loss)
    el = (time.perf_counter() - t0) / reps
    sps = (TAU - 1) / el
    print(f"{name:10s} {el * 1e3:7.1f} ms/epoch  {sps:7.1f} steps/s  "
          f"loss={float(loss):.5f}", flush=True)
    return sps


def main():
    print(f"devices: {jax.devices()}", flush=True)
    bench("base")
    bench("reverse", adjoint="reverse")
    bench("direct", adjoint=False)
    bench("slim_k", slack=1.25)
    bench("skin", skin=0.6, update_freq=4)
    bench("skin_slim", skin=0.6, update_freq=4, slack=1.25)
    bench("f32", dtype="float32")
    bench("mixed", dtype="mixed")
    bench("f32_skin", dtype="float32", skin=0.6, update_freq=4,
          slack=1.25)
    bench("mix_skin", dtype="mixed", skin=0.6, update_freq=4, slack=1.25)
    bench("bf16_all", skin=0.6, update_freq=4, slack=1.25)


if __name__ == "__main__":
    main()
