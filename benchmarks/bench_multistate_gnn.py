#!/usr/bin/env python
"""Wall-clock: serial per-state GNN fit epochs vs ONE stacked multistate
program (parallel/multistate.make_stack_multistate_fit) on the same
device(s).

The reference loops state points serially (fit_rdf_gnn.py:388) -- so did
our own fit_rdf driver until round 3.  This measures what the stacked
program buys on ONE chip (state points fill the idle device) for the
flagship SchNet water config at several state counts.
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


def build_systems(S, size):
    # S water-like states at slightly different densities/temperatures
    rhos = np.linspace(0.997, 0.945, S)
    temps = np.linspace(298.0, 368.0, S)
    systems = []
    for rho, T in zip(rhos, temps):
        L = get_unit_len(rho, 18.01528, 8)
        s = System.from_lattice("diamond", size, L, symbol="O")
        s.masses = np.full(s.get_number_of_atoms(), 18.01528)
        s.set_temperature(T, rng=np.random.default_rng(0))
        systems.append(s)
    return systems, temps


def gnn_factory(dtype="bf16"):
    return SchNet({"n_atom_basis": 128, "n_filters": 128,
                   "n_gaussians": 40, "n_convolutions": 2, "cutoff": CUT,
                   "compute_dtype": dtype})


def bench_serial(systems, temps, reps=3):
    gnn = gnn_factory()
    prior = potentials.ExcludedVolume(sigma=2.6, epsilon=0.01, power=12)
    vgs, states, params = [], [], None
    for s, T in zip(systems, temps):
        stack = Stack({
            "nn": GNNPotentials(s, gnn, cutoff=CUT),
            "pair": PairPotentials(s, prior, cutoff=CUT, mode="dense")})
        integ = NoseHooverChain(stack, s, T=T, Q=50.0, num_chains=5,
                                adjoint=True)
        sim = Simulation(s, integ)
        params = sim.params if params is None else params
        ode = sim.epoch_fn(DT, TAU)
        obs = rdf_obs(s, nbins=NBINS, r_range=RDF_RANGE)
        tgt = jnp.ones(NBINS)

        def loss(p, st, aux, ctrl, ode=ode, obs=obs, tgt=tgt):
            traj, _ = ode(p, st, aux, ctrl)
            _, _, g = obs(traj.q[::20])
            return ((g - tgt) ** 2).mean()

        vgs.append((jax.jit(jax.value_and_grad(loss)), sim, integ))
        states.append(sim.initial_state())

    # warmup
    for (vg, sim, integ), (st, aux) in zip(vgs, states):
        l, g = vg(params, st, aux, integ.default_ctrl())
    jax.block_until_ready(l)
    t0 = time.perf_counter()
    for _ in range(reps):
        for (vg, sim, integ), (st, aux) in zip(vgs, states):
            l, g = vg(params, st, aux, integ.default_ctrl())
        jax.block_until_ready(l)
    return (time.perf_counter() - t0) / reps


def bench_stacked(systems, temps, reps=3):
    gnn = gnn_factory()
    prior = potentials.ExcludedVolume(sigma=2.6, epsilon=0.01, power=12)
    rhos = [s.get_number_of_atoms() / s.get_volume() for s in systems]
    proto = systems[int(np.argmax(rhos))]
    # same capacity_slack as the serial side's default: K must match or
    # the comparison measures padding, not orchestration
    stack = Stack({
        "nn": GNNPotentials(proto, gnn, cutoff=CUT, nbr_mode="table",
                            capacity_slack=1.6),
        "pair": PairPotentials(proto, prior, cutoff=CUT, mode="dense")})
    dyn = WithDynamicCell(stack, np.diag(proto.get_cell()))
    integ = NoseHooverChain(dyn, proto, T=temps[0], Q=50.0, num_chains=5,
                            adjoint=True)
    mesh = make_mesh({"dp": 1}, devices=jax.devices()[:1]) \
        if len(jax.devices()) == 1 else make_mesh({"dp": -1})
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
    rhos = jnp.ones(len(systems))

    vg = jax.jit(jax.value_and_grad(
        lambda p: loss_fn(p, states, cells, kTs, targets, rhos)[0]))
    l, g = vg(params)
    jax.block_until_ready(l)
    t0 = time.perf_counter()
    for _ in range(reps):
        l, g = vg(params)
    jax.block_until_ready(l)
    return (time.perf_counter() - t0) / reps


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print(f"devices: {jax.devices()}  (N = {8 * size ** 3} atoms/state)",
          flush=True)
    for S in (2, 4):
        systems, temps = build_systems(S, size)
        t_ser = bench_serial(systems, temps)
        t_stk = bench_stacked(systems, temps)
        print(f"S={S}: serial {t_ser * 1e3:8.1f} ms/epoch-set   "
              f"stacked {t_stk * 1e3:8.1f} ms   "
              f"speedup {t_ser / t_stk:.2f}x", flush=True)


if __name__ == "__main__":
    main()
