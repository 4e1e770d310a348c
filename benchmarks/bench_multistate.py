#!/usr/bin/env python
"""Multi-state-point fitting wall-clock: reference-style serial loop over
state points vs ONE state-stacked sharded program
(parallel/multistate.py), on the real TPU.

The reference loops state points serially inside each epoch
(/root/reference/scripts/fit_rdf_gnn.py:388).  The rebuild stacks them on
a leading S axis sharded over the mesh's dp axis; on a single chip that
still wins by batching (bigger ops, one dispatch instead of S), and the
same program scales over chips via XLA collectives (correctness on an
8-virtual-device mesh is asserted by tests/test_multistate.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mdgrad_tpu import units, potentials
from mdgrad_tpu.system import System
from mdgrad_tpu.interface import PairPotentials
from mdgrad_tpu.md import NoseHooverChain, Simulation
from mdgrad_tpu.md.integrators import NVTState
from mdgrad_tpu.observables import rdf as rdf_obs
from mdgrad_tpu.parallel import (make_mesh, MultiStateConfig,
                                 make_multistate_fit)

N_STEPS = 50
NBINS = 100
RDF_RANGE = (0.75, 2.4)
CUTOFF = 2.5


def build(n_states, size):
    rng = np.random.default_rng(11)
    lattice_a = np.linspace(1.679, 1.80, n_states)
    kts = np.linspace(0.9, 1.3, n_states)
    systems, qs, vs = [], [], []
    for a in lattice_a:
        sys_ = System.from_lattice("fcc", size, a)
        systems.append(sys_)
        qs.append(sys_.get_positions())
        vs.append(rng.standard_normal(sys_.get_positions().shape) * 0.4)
    n = systems[0].get_number_of_atoms()
    targets = 1.0 + 0.1 * rng.standard_normal((n_states, NBINS))
    return systems, np.stack(qs), np.stack(vs), kts, targets, n


def main():
    print(f"devices: {jax.devices()}")
    for n_states, size in [(4, 4), (8, 4)]:
        systems, q0, v0, kts, targets, n = build(n_states, size)
        lj = potentials.LennardJones(0.9, 1.0)
        params = lj.init_params()
        masses = jnp.asarray(systems[0].get_masses())
        cell_lens = jnp.asarray([np.diag(s.get_cell()) for s in systems])
        Q = jnp.asarray([50.0, 50.0 / n, 50.0 / n])
        cfg = MultiStateConfig(cutoff=CUTOFF, dt=0.005, n_steps=N_STEPS,
                               Q=Q, n_dof=3 * n, nbins=NBINS,
                               rdf_range=RDF_RANGE)
        mesh = make_mesh({"dp": 1, "sp": 1})  # single chip
        loss_fn = make_multistate_fit(lj, cfg, mesh)
        states = NVTState(v=jnp.asarray(v0), q=jnp.asarray(q0),
                          pv=jnp.zeros((n_states, 3)))
        kts_j = jnp.asarray(kts)
        tgt_j = jnp.asarray(targets)

        stacked = jax.jit(jax.value_and_grad(
            lambda p: loss_fn(p, states, cell_lens, kts_j, tgt_j,
                              masses)[0]))

        # serial oracle: S separate single-system programs
        serial_fns = []
        for j, sys_ in enumerate(systems):
            pair = PairPotentials(sys_, lj, cutoff=CUTOFF, mode="dense")
            integ = NoseHooverChain(pair, sys_, T=kts[j] / units.kB,
                                    num_chains=3, Q=50.0, adjoint=False)
            sim = Simulation(sys_, integ)
            ode = sim.epoch_fn(dt=0.005, frequency=N_STEPS + 1)
            obs = rdf_obs(sys_, nbins=NBINS, r_range=RDF_RANGE)
            s0 = NVTState(v=jnp.asarray(v0[j]), q=jnp.asarray(q0[j]),
                          pv=jnp.zeros(3))
            tgt = jnp.asarray(targets[j])

            def loss_one(p, ode=ode, obs=obs, s0=s0, tgt=tgt, j=j):
                traj, _ = ode(p, s0, (), {"kT": jnp.asarray(kts[j])})
                last = jax.tree_util.tree_map(lambda x: x[-1], traj)
                _, _, g = obs(last.q)
                return ((g - tgt) ** 2).mean()

            serial_fns.append(jax.jit(jax.value_and_grad(loss_one)))

        def run_serial(p):
            tot, gacc = 0.0, None
            for f in serial_fns:
                l, g = f(p)
                tot += float(l)
                gacc = g if gacc is None else jax.tree_util.tree_map(
                    jnp.add, gacc, g)
            return tot, gacc

        # warm both
        l_st, _ = stacked(params)
        jax.block_until_ready(l_st)
        run_serial(params)

        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            l_st, g_st = stacked(params)
        jax.block_until_ready(l_st)
        t_stacked = (time.perf_counter() - t0) / reps * 1e3

        t0 = time.perf_counter()
        for _ in range(reps):
            l_se, g_se = run_serial(params)
        t_serial = (time.perf_counter() - t0) / reps * 1e3

        print(f"S={n_states} N={n}: serial {t_serial:8.1f} ms/epoch | "
              f"stacked {t_stacked:8.1f} ms/epoch | "
              f"{t_serial / t_stacked:.2f}x  "
              f"(loss {float(l_st):.4f} vs {l_se:.4f})")


if __name__ == "__main__":
    main()
