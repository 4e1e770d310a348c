"""MTS (r-RESPA) vs single-rate NHC on the water-SchNet headline.

Protocol: identical simulated time per epoch (26 fs, the official
tau=52 x 0.5 fs window), fwd+bwd fit-shaped epoch (RDF loss through the
trajectory adjoint).  The single-rate stepper evaluates the SchNet GNN
every 0.5 fs; MTS evaluates it once per OUTER step (1.0 / 2.0 fs) with
the cheap ExcludedVolume prior integrated at 0.5 fs inner steps.

Metric: simulated fs per wall second (and the dt=0.5fs-equivalent
steps/s, = fs/s / 0.5, for comparison against the official headline).
Loss and mean kinetic temperature are printed as physics checks: the
RESPA trajectories sample the same ensemble, so the RDF loss must land
at the same estimator-noise scale.
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
from mdgrad_tpu import potentials, thermo
from mdgrad_tpu.interface import GNNPotentials, PairPotentials, Stack
from mdgrad_tpu.md import NoseHooverChain, MTSNoseHooverChain, Simulation
from mdgrad_tpu.observables import rdf as rdf_obs
from mdgrad_tpu.data.registry import get_unit_len

FS = 0.09822694788464063  # 1 fs in internal time units
T_TOTAL_FS = 26.0         # simulated time per epoch (tau=52 @ 0.5 fs)


def build(n_inner=None, outer_fs=0.5, size=4):
    L = get_unit_len(0.99749, 18.01528, 8)
    system = System.from_lattice("diamond", size, L, symbol="O")
    n = system.get_number_of_atoms()
    system.masses = np.full(n, 18.01528)
    system.set_temperature(298.0, rng=np.random.default_rng(0))
    gnn = SchNet({"n_atom_basis": 128, "n_filters": 128, "n_gaussians": 40,
                  "n_convolutions": 2, "cutoff": 6.0,
                  "compute_dtype": "bf16"})
    # size>=8 (4096 atoms): the fit configuration -- O(N) cells edge
    # builder for the GNN, sparse prior (dense N^2 pair math stops
    # winning past ~2k atoms, CLAUDE.md rule 5)
    nbr_mode = "cells" if n > 2048 else "table"
    stack = Stack({
        "nn": GNNPotentials(system, gnn, cutoff=6.0, capacity_slack=1.25,
                            nbr_mode=nbr_mode),
        "prior": PairPotentials(system, potentials.ExcludedVolume(
            sigma=2.6, epsilon=0.01, power=12), cutoff=6.0,
            mode="dense" if n <= 2048 else "table"),
    })
    if n_inner is None:
        integ = NoseHooverChain(stack, system, T=298.0, Q=50.0,
                                num_chains=5, adjoint=True)
    else:
        integ = MTSNoseHooverChain(stack, system, T=298.0, Q=50.0,
                                   num_chains=5, adjoint=True,
                                   fast_keys=("prior",), n_inner=n_inner)
    sim = Simulation(system, integ)
    obs = rdf_obs(system, nbins=109, r_range=(1.8, 7.5))
    return system, sim, integ, obs


def bench(name, n_inner=None, outer_fs=0.5, reps=5, size=4):
    tau = int(round(T_TOTAL_FS / outer_fs))
    dt = outer_fs * FS
    system, sim, integ, obs = build(n_inner, outer_fs, size=size)
    ode = sim.epoch_fn(dt, tau)
    state, aux = sim.initial_state()
    ctrl = integ.default_ctrl()
    g_target = jnp.ones(109)
    stride = max(1, tau // 5)

    def loss_fn(params):
        traj, _ = ode(params, state, aux, ctrl)
        _, _, g = obs(traj.q[::stride])
        temp = thermo.temperature(traj.v[-1], system.get_masses())
        return ((g - g_target) ** 2).mean(), temp

    vg = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    (loss, temp), grads = vg(sim.params)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(reps):
        (loss, temp), grads = vg(sim.params)
    jax.block_until_ready(loss)
    el = (time.perf_counter() - t0) / reps
    fs_per_s = (tau - 1) * outer_fs / el
    print(f"{name:22s} {el*1e3:7.1f} ms/epoch  {fs_per_s:8.1f} fs/s "
          f"(= {fs_per_s/0.5:7.1f} dt=0.5fs-equiv steps/s)  "
          f"loss={float(loss):.4f}  T_kin={float(temp)/8.617e-5:.0f} K",
          flush=True)
    return fs_per_s


if __name__ == "__main__":
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print(f"devices: {jax.devices()}  size={size} "
          f"({8 * size ** 3} atoms)", flush=True)
    base = bench("single-rate dt=0.5fs", size=size)
    m2 = bench("MTS k=2 outer=1.0fs", n_inner=2, outer_fs=1.0, size=size)
    m4 = bench("MTS k=4 outer=2.0fs", n_inner=4, outer_fs=2.0, size=size)
    print(f"speedup vs single-rate: k=2 {m2/base:.2f}x, k=4 {m4/base:.2f}x",
          flush=True)
