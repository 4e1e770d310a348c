#!/usr/bin/env python
"""Headline-epoch A/B: SchNet aggregation via XLA one-hot matmul vs the
Pallas in-VMEM one-hot pair (ops/pallas_gather.py, gather_mode='pallas').

Same protocol as benchmarks/bench_backward.py (tau=52 fwd+bwd epoch,
512-atom water config, capacity_slack 1.25); sweeps dtype x mode so the
headline pick and the mixed-precision row are both covered.
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


def build(dtype="bf16", gather_mode="onehot", slack=1.25):
    L = get_unit_len(0.99749, 18.01528, 8)
    system = System.from_lattice("diamond", 4, L, symbol="O")
    system.masses = np.full(512, 18.01528)
    system.set_temperature(298.0, rng=np.random.default_rng(0))
    gnn = SchNet({"n_atom_basis": 128, "n_filters": 128,
                  "n_gaussians": 40, "n_convolutions": 2, "cutoff": 6.0,
                  "compute_dtype": dtype, "gather_mode": gather_mode})
    stack = Stack({
        "nn": GNNPotentials(system, gnn, cutoff=6.0, capacity_slack=slack),
        "prior": PairPotentials(system, potentials.ExcludedVolume(
            sigma=2.6, epsilon=0.01, power=12), cutoff=6.0, mode="dense"),
    })
    integ = NoseHooverChain(stack, system, T=298.0, Q=50.0, num_chains=5,
                            adjoint=True)
    sim = Simulation(system, integ)
    obs = rdf_obs(system, nbins=109, r_range=(1.8, 7.5))
    return sim, integ, obs


def bench(name, reps=5, **kw):
    sim, integ, obs = build(**kw)
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
        print(f"{name:16s} FAILED: {str(e)[:160]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(reps):
        loss, grads = vg(sim.params)
    jax.block_until_ready(loss)
    el = (time.perf_counter() - t0) / reps
    print(f"{name:16s} {el * 1e3:7.1f} ms/epoch  {(TAU - 1) / el:7.1f} "
          f"steps/s  loss={float(loss):.5f}", flush=True)
    return (TAU - 1) / el


def main():
    print(f"devices: {jax.devices()}", flush=True)
    bench("onehot_bf16")
    bench("pallas_bf16", gather_mode="pallas")
    bench("onehot_mixed", dtype="mixed")
    bench("pallas_mixed", dtype="mixed", gather_mode="pallas")
    bench("onehot_f32", dtype="float32")
    bench("pallas_f32", dtype="float32", gather_mode="pallas")


if __name__ == "__main__":
    main()
