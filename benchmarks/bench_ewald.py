#!/usr/bin/env python
"""Ewald electrostatics cost: molten-salt MD epochs with and without the
long-range term, fwd and fwd+bwd, at two sizes.

The reciprocal sum is one (N, 3) x (3, Nk) matmul + trig + reduction --
MXU work -- so the expected marginal cost over the short-range pair term
is small until Nk grows with the box.  No reference comparison exists
(the reference's electrostatics is a truncated cutoff sum with no
converged long-range part)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mdgrad_tpu import potentials, units
from mdgrad_tpu.system import System
from mdgrad_tpu.interface import (PairPotentials, EwaldElectrostatics,
                                  Stack)
from mdgrad_tpu.md import NoseHooverChain, Simulation

TAU = 100
T_K = 1500.0


def build(size, with_ewald, mode="dense"):
    a = 5.64
    sys_ = _nacl(size, a)
    sys_.set_temperature(T_K, rng=np.random.default_rng(0))
    q = np.where(np.asarray(sys_.get_atomic_numbers()) == 11, 1.0, -1.0)
    r_cut = min(6.0, a * size / 2 * 0.98)
    prior = PairPotentials(
        sys_, potentials.ExcludedVolume(sigma=2.3, epsilon=0.1, power=9),
        cutoff=r_cut)
    if with_ewald:
        coul = EwaldElectrostatics(sys_, q, r_cut=r_cut, mode=mode,
                                   capacity_slack=2.0)
        inter = Stack({"prior": prior, "coul": coul})
    else:
        inter = prior
    integ = NoseHooverChain(inter, sys_, T=T_K * units.kB, Q=50.0,
                            num_chains=5, adjoint=True)
    sim = Simulation(sys_, integ)
    return sim, integ


def _nacl(size, a):
    frac_na = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                        [0, 0.5, 0.5]])
    frac_cl = (frac_na + np.array([0.5, 0.5, 0.5])) % 1.0
    cells = []
    nums = []
    for i in range(size):
        for j in range(size):
            for k in range(size):
                off = np.array([i, j, k])
                cells.append((frac_na + off) * a)
                nums += [11] * 4
                cells.append((frac_cl + off) * a)
                nums += [17] * 4
    xyz = np.concatenate(cells)
    return System(xyz, cell=np.eye(3) * a * size, numbers=nums)


def bench(size, with_ewald, reps=5, mode="dense"):
    sim, integ = build(size, with_ewald, mode=mode)
    ode = sim.epoch_fn(0.5 * units.fs, TAU)
    state, aux = sim.initial_state()
    ctrl = integ.default_ctrl()

    def fwd(p):
        traj, _ = ode(p, state, aux, ctrl)
        return (traj.q[-1] ** 2).mean()

    n = sim.system.get_number_of_atoms()
    out = {}
    for tag, fn in (("fwd", jax.jit(fwd)),
                    ("fwd+bwd", jax.jit(jax.value_and_grad(fwd)))):
        r = fn(sim.params)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(sim.params)
            jax.block_until_ready(r)
        ms = (time.perf_counter() - t0) / reps * 1e3
        out[tag] = ms
        print(f"N={n} ewald={with_ewald} mode={mode} {tag}: {ms:.2f} "
              f"ms/epoch ({TAU * 1e3 / ms:.0f} steps/s)", flush=True)
    return n, out


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [3, 5]
    print("devices:", jax.devices(), flush=True)
    for size in sizes:
        bench(size, False)
        for mode in ("dense", "table"):
            bench(size, True, mode=mode)
