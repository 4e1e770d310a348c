#!/usr/bin/env python
"""Gradient-cost comparison: trajectory-adjoint epoch vs DiffTRe inner
step, at the multi-state LJ fit scale (N=500, PairMLP 3x128, table
mode).

The adjoint epoch pays tau sequential MD steps forward + tau reverse
(replay); a DiffTRe inner step pays F *batched* energy evaluations
(+ F virial grads with the pressure term).  Same model, same state
point; both jitted and AOT-compiled, 5-rep timing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mdgrad_tpu import potentials as pot_zoo, units
from mdgrad_tpu.nn import PairMLP
from mdgrad_tpu.interface import PairPotentials, Stack
from mdgrad_tpu.md import NoseHooverChain, Simulation
from mdgrad_tpu.observables import rdf as rdf_obs
from mdgrad_tpu.train.difftre import make_bundle, make_rdf_loss, \
    ReweightEstimator, sample_frames
from mdgrad_tpu.train.fit_rdf_pair import get_system, registry_T_kelvin
from mdgrad_tpu.data.registry import pair_data_dict

TAU = 120
F = 48


def time_compiled(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps


def main():
    print("devices:", jax.devices(), flush=True)
    tag = "lj_0.845_0.75"
    entry = pair_data_dict[tag]
    rng = np.random.default_rng(0)
    system = get_system(tag, 5, pair_data_dict, rng=rng)
    kT = registry_T_kelvin(entry) * units.kB
    dt = entry.get("dt", 0.01)

    net = PairMLP(n_gauss=25, r_start=0.0, r_end=2.5, n_width=128,
                  n_layers=3, nonlinear="SELU")
    prior = pot_zoo.LJFamily(epsilon=2.0, sigma=0.9, rep_pow=6,
                             attr_pow=3)
    stack = Stack({
        "pairnn": PairPotentials(system, net, cutoff=2.5, mode="table",
                                 capacity_slack=2.5),
        "pair": PairPotentials(system, prior, cutoff=2.5)})
    integ = NoseHooverChain(stack, system, T=registry_T_kelvin(entry),
                            Q=50.0, num_chains=5, adjoint=True)
    sim = Simulation(system, integ)
    obs = rdf_obs(system, nbins=100, r_range=(0.75, entry["end"]))
    g_target = jnp.ones(100)

    # --- trajectory-adjoint epoch (fit_lj's gradient unit) ------------
    ode = sim.epoch_fn(dt, TAU)
    state, aux = sim.initial_state()
    ctrl = integ.default_ctrl()

    def adjoint_loss(p):
        traj, _ = ode(p, state, aux, ctrl)
        _, _, g = obs(traj.q[::1])
        return ((g - g_target) ** 2).mean()

    vg_adj = jax.jit(jax.value_and_grad(adjoint_loss)) \
        .lower(sim.params).compile()
    t_adj = time_compiled(vg_adj, sim.params)
    print(f"adjoint epoch (tau={TAU}, fwd+bwd): {t_adj * 1e3:9.1f} ms "
          f"-> {TAU / t_adj:8.1f} steps/s", flush=True)

    # --- DiffTRe inner step -------------------------------------------
    frames = sample_frames(sim, F, steps_between=40, dt=dt,
                           equil_steps=400)
    est = ReweightEstimator(stack, frames, sim.params, kT=kT,
                            cell=system.get_cell())
    g_frames = jax.jit(lambda fr: jax.lax.map(
        lambda q: obs(q)[2], fr))(frames)
    loss_rdf = make_rdf_loss(est, g_frames, g_target)
    vg_rw = jax.jit(jax.value_and_grad(
        lambda p: loss_rdf(p)[0])).lower(sim.params).compile()
    t_rw = time_compiled(vg_rw, sim.params)
    print(f"difftre inner step (F={F}, rdf):   {t_rw * 1e3:9.1f} ms "
          f"-> {t_adj / t_rw:6.1f}x cheaper than the adjoint epoch",
          flush=True)

    loss_p = make_rdf_loss(est, g_frames, g_target, pressure_target=1.0,
                           pressure_weight=0.3)
    vg_rwp = jax.jit(jax.value_and_grad(
        lambda p: loss_p(p)[0])).lower(sim.params).compile()
    t_rwp = time_compiled(vg_rwp, sim.params)
    print(f"difftre inner step (+pressure):    {t_rwp * 1e3:9.1f} ms "
          f"-> {t_adj / t_rwp:6.1f}x cheaper than the adjoint epoch",
          flush=True)

    # sampling cost amortized per inner step, for the honest total
    t0 = time.perf_counter()
    sample_frames(sim, F, steps_between=40, dt=dt)
    t_samp = time.perf_counter() - t0
    print(f"sampling {F} frames x 40 steps:    {t_samp * 1e3:9.1f} ms "
          f"(amortized over the inner loop)", flush=True)


if __name__ == "__main__":
    main()
