#!/usr/bin/env python
"""Ablate the one-chip stacked-GNN multistate overhead.

bench_multistate_gnn measured stacked/serial = 0.72-0.79x at N=512/state
(chip already saturated by one state).  This isolates WHERE the extra
~25% goes: the RDF loss form, the dynamic-cell wrapper, or the vmap of
the stepper itself.  Rows:

  serial_1        one state, library epoch + observables.rdf loss
  stacked_1       S=1 through make_stack_multistate_fit (full path)
  stacked_1_nordf S=1, loss = q.sum() (no _soft_rdf_frames)
  serial_1_nordf  one state, loss = q.sum()
  stacked_4 / serial_4 and the same _nordf variants
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mdgrad_tpu import potentials, units
from mdgrad_tpu.system import System
from mdgrad_tpu.nn import SchNet
from mdgrad_tpu.interface import (GNNPotentials, PairPotentials, Stack,
                                  WithDynamicCell)
from mdgrad_tpu.md import NoseHooverChain, Simulation
from mdgrad_tpu.observables import rdf as rdf_obs
from mdgrad_tpu.data.registry import get_unit_len
from mdgrad_tpu.parallel import make_mesh, make_stack_multistate_fit

TAU = 52
NBINS = 109
RDF_RANGE = (1.8, 7.5)
DT = 0.5 * 0.09822694788464063
CUT = 6.0
SIZE = 4


def build_systems(S):
    rhos = np.linspace(0.997, 0.945, S)
    temps = np.linspace(298.0, 368.0, S)
    systems = []
    for rho, T in zip(rhos, temps):
        L = get_unit_len(rho, 18.01528, 8)
        s = System.from_lattice("diamond", SIZE, L, symbol="O")
        s.masses = np.full(s.get_number_of_atoms(), 18.01528)
        s.set_temperature(T, rng=np.random.default_rng(0))
        systems.append(s)
    return systems, temps


def gnn_stack(proto, dynamic):
    gnn = SchNet({"n_atom_basis": 128, "n_filters": 128,
                  "n_gaussians": 40, "n_convolutions": 2, "cutoff": CUT,
                  "compute_dtype": "bf16"})
    prior = potentials.ExcludedVolume(sigma=2.6, epsilon=0.01, power=12)
    stack = Stack({
        "nn": GNNPotentials(proto, gnn, cutoff=CUT, capacity_slack=1.6),
        "pair": PairPotentials(proto, prior, cutoff=CUT, mode="dense")})
    if dynamic:
        return WithDynamicCell(stack, np.diag(proto.get_cell()))
    return stack


def timeit(vg, args, reps=5):
    l = vg(*args)
    l = l[0] if isinstance(l, tuple) else l
    jax.block_until_ready(l)
    t0 = time.perf_counter()
    for _ in range(reps):
        l = vg(*args)
        l = l[0] if isinstance(l, tuple) else l
    jax.block_until_ready(l)
    return (time.perf_counter() - t0) / reps


def serial(systems, temps, use_rdf):
    total = 0.0
    for s, T in zip(systems, temps):
        model = gnn_stack(s, dynamic=False)
        integ = NoseHooverChain(model, s, T=T, Q=50.0, num_chains=5,
                                adjoint=True)
        sim = Simulation(s, integ)
        ode = sim.epoch_fn(DT, TAU)
        obs = rdf_obs(s, nbins=NBINS, r_range=RDF_RANGE)
        tgt = jnp.ones(NBINS)

        def loss(p, st, aux, ctrl, ode=ode, obs=obs, tgt=tgt):
            traj, _ = ode(p, st, aux, ctrl)
            if use_rdf:
                _, _, g = obs(traj.q[::20])
                return ((g - tgt) ** 2).mean()
            return (traj.q[-1] ** 2).sum()

        vg = jax.jit(jax.value_and_grad(loss))
        st, aux = sim.initial_state()
        total += timeit(vg, (sim.params, st, aux, integ.default_ctrl()))
    return total


def stacked(systems, temps, use_rdf):
    rhos_ = [s.get_number_of_atoms() / s.get_volume() for s in systems]
    proto = systems[int(np.argmax(rhos_))]
    dyn = gnn_stack(proto, dynamic=True)
    integ = NoseHooverChain(dyn, proto, T=temps[0], Q=50.0, num_chains=5,
                            adjoint=True)
    mesh = make_mesh({"dp": 1}, devices=jax.devices()[:1])
    loss_fn = make_stack_multistate_fit(
        integ, dt=DT, n_steps=TAU - 1, nbins=NBINS, rdf_range=RDF_RANGE,
        mesh=mesh, frame_skip=20, loss_type="mse")
    params = integ.init_params()
    proto_state = integ.initial_state()
    states = jax.vmap(lambda q, v: proto_state._replace(q=q, v=v))(
        jnp.asarray(np.stack([s.get_positions() for s in systems])),
        jnp.asarray(np.stack([s.get_velocities() for s in systems])))
    cells = jnp.asarray([np.diag(s.get_cell()) for s in systems])
    kTs = jnp.asarray([T * units.kB for T in temps])
    targets = jnp.ones((len(systems), NBINS))
    ones = jnp.ones(len(systems))

    if use_rdf:
        f = lambda p: loss_fn(p, states, cells, kTs, targets, ones)[0]
    else:
        # cheap-loss variant: bypass loss_fn's rdf entirely by rebuilding
        # a minimal vmapped epoch through the same integrator machinery
        from mdgrad_tpu.md.adjoint import make_odeint
        can_prime = True

        def step_fn(p, state, aux, ctrl, i):
            return integ.step(p, state, aux, ctrl, i * DT, DT, primed=True)

        def aux_up(state, aux):
            return integ.aux_update(state.q, aux)

        ode = make_odeint(step_fn, aux_up, TAU - 1, update_freq=1,
                          adjoint=True, skip_first_refresh=True)

        def one_state(p, state, cell_len, kT):
            aux = dyn.aux_init(state.q, cell=cell_len)
            state, aux = integ.prime_state(p, state, aux, fresh_aux=True)
            traj, _ = ode(p, state, aux, {"kT": kT})
            return (traj.q[-1] ** 2).sum()

        f = lambda p: jax.vmap(one_state, in_axes=(None, 0, 0, 0))(
            p, states, cells, kTs).sum()

    vg = jax.jit(jax.value_and_grad(f))
    return timeit(vg, (params,))


def main():
    print(f"devices: {jax.devices()}  (N = {8 * SIZE ** 3}/state)",
          flush=True)
    for S in (1, 4):
        systems, temps = build_systems(S)
        rows = {
            f"serial_{S}": lambda: serial(systems, temps, True),
            f"stacked_{S}": lambda: stacked(systems, temps, True),
            f"serial_{S}_nordf": lambda: serial(systems, temps, False),
            f"stacked_{S}_nordf": lambda: stacked(systems, temps, False),
        }
        for name, fn in rows.items():
            try:
                t = fn()
                print(f"{name:18s} {t * 1e3:8.1f} ms/epoch-set",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name:18s} FAILED: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
