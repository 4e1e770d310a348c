#!/usr/bin/env python
"""PairPotentials mode='dense' vs mode='table' on the MLP pair-fit
epoch (the LJ 5-state config: N=500, tau=120, PairMLP 3x128).

Dense mode materializes (N, N, hidden) MLP activations -- 123 MB per
layer at N=500/h=128.  With the virial-pressure target those buffers
OOM'd the 30 GB v5e (results/r3_logs/lj_pressure.log); the (N, K)
table cuts them ~13x.  This bench times the fit-shaped epoch
(value_and_grad of an RDF MSE through the NHC adjoint trajectory)
both ways, with and without the pressure term.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mdgrad_tpu.system import System
from mdgrad_tpu import potentials, units
from mdgrad_tpu.nn import PairMLP
from mdgrad_tpu.interface import PairPotentials, Stack
from mdgrad_tpu.md import NoseHooverChain, Simulation
from mdgrad_tpu.observables import rdf as rdf_obs
from mdgrad_tpu import thermo

TAU = 120
DT = 0.005
RHO, T_RED = 0.845, 0.75
CUTOFF = 2.5


def build(mode):
    a = (4.0 / RHO) ** (1.0 / 3.0)
    system = System.from_lattice("fcc", 5, a)  # 500 atoms
    system.set_temperature(T_RED / units.kB, rng=np.random.default_rng(0))
    net = PairMLP(n_gauss=int(CUTOFF // 0.1), r_start=0.0, r_end=CUTOFF,
                  n_width=128, n_layers=3, nonlinear="SELU")
    stack = Stack({
        "pairnn": PairPotentials(system, net, cutoff=CUTOFF, mode=mode),
        "pair": PairPotentials(system, potentials.LJFamily(
            epsilon=2.0, sigma=0.9, rep_pow=6, attr_pow=3), cutoff=2.5),
    })
    integ = NoseHooverChain(stack, system, T=T_RED / units.kB, Q=50.0,
                            num_chains=5, adjoint=True)
    sim = Simulation(system, integ)
    obs = rdf_obs(system, nbins=100, r_range=(0.75, CUTOFF))
    return system, stack, sim, integ, obs


def bench(name, mode, pressure_weight=0.0, reps=5):
    system, stack, sim, integ, obs = build(mode)
    ode = sim.epoch_fn(DT, TAU)
    state, aux = sim.initial_state()
    ctrl = integ.default_ctrl()
    g_target = jnp.ones(100)

    masses = system.get_masses()
    cell = system.get_cell()

    def loss_fn(params):
        traj, final_aux = ode(params, state, aux, ctrl)
        _, _, g = obs(traj.q[::5])
        loss = ((g - g_target) ** 2).mean()
        if pressure_weight:
            # sequential rematerialized per-frame virial on a coarse
            # frame grid (train/fit_rdf_pair.py pressure_frame_skip)
            @jax.checkpoint
            def frame_pressure(qv):
                q, v = qv
                # per-frame topology refresh: a stale table biases the
                # virial (see fit_rdf_pair frame_pressure)
                fa = stack.aux_update(q, aux)
                return thermo.pressure(stack, params, q, fa, v,
                                       masses, cell)

            p = jax.lax.map(frame_pressure,
                            (traj.q[::10], traj.v[::10])).mean()
            loss = loss + pressure_weight * (p - 1.0) ** 2
        return loss

    vg = jax.jit(jax.value_and_grad(loss_fn))
    try:
        loss, grads = vg(sim.params)
        jax.block_until_ready(loss)
    except Exception as e:  # noqa: BLE001
        print(f"{name:16s} FAILED: {str(e)[:140]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(reps):
        loss, grads = vg(sim.params)
    jax.block_until_ready(loss)
    el = (time.perf_counter() - t0) / reps
    print(f"{name:16s} {el * 1e3:8.1f} ms/epoch  "
          f"{(TAU - 1) / el:7.1f} steps/s  loss={float(loss):.5f}",
          flush=True)
    return el


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    d = bench("dense", "dense")
    t = bench("table", "table")
    if d and t:
        print(f"table speedup (rdf loss): {d / t:.2f}x", flush=True)
    dp = bench("dense+pressure", "dense", pressure_weight=0.05)
    tp = bench("table+pressure", "table", pressure_weight=0.05)
    if dp and tp:
        print(f"table speedup (rdf+P loss): {dp / tp:.2f}x", flush=True)
