"""Multi-state-point sharded fitting (dp=state x sp=atom): gradients of
the sharded program must equal the serial per-state-point loop built from
the framework's own single-system machinery (the reference's structure,
fit_rdf_gnn.py:388) -- VERDICT r1 item 6.

Each state point gets its own box, temperature and target g(r)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mdgrad_tpu import units, potentials
from mdgrad_tpu.system import System
from mdgrad_tpu.interface import PairPotentials
from mdgrad_tpu.md import NoseHooverChain, Simulation
from mdgrad_tpu.md.integrators import NVTState
from mdgrad_tpu.observables import rdf as rdf_obs
from mdgrad_tpu.parallel import (make_mesh, MultiStateConfig,
                                 make_multistate_fit,
                                 make_multistate_train_step)

N_STEPS = 3
NBINS = 32
RDF_RANGE = (0.75, 1.9)
CUTOFF = 2.4
LATTICE_A = [1.679, 1.72, 1.76, 1.80]   # one box per state point
KTS = [1.0, 1.1, 1.2, 0.9]


def _state_points():
    systems, states_q, states_v = [], [], []
    rng = np.random.default_rng(11)
    for a in LATTICE_A:
        sys_ = System.from_lattice("fcc", 3, a)   # 108 atoms
        systems.append(sys_)
        states_q.append(sys_.get_positions())
        states_v.append(rng.standard_normal((108, 3)) * 0.4)
    targets = 1.0 + 0.1 * rng.standard_normal((4, NBINS))
    return systems, np.stack(states_q), np.stack(states_v), targets


def _cfg(n):
    Q = jnp.asarray([50.0, 50.0 / n, 50.0 / n])
    return MultiStateConfig(cutoff=CUTOFF, dt=0.005, n_steps=N_STEPS,
                            Q=Q, n_dof=3 * n, nbins=NBINS,
                            rdf_range=RDF_RANGE)


def test_multistate_grads_match_serial_loop():
    systems, q0, v0, targets = _state_points()
    n = 108
    mesh = make_mesh({"dp": 4, "sp": 2})
    cfg = _cfg(n)
    lj = potentials.LennardJones(0.9, 1.0)
    params = lj.init_params()
    masses = jnp.asarray(systems[0].get_masses())

    states = NVTState(v=jnp.asarray(v0), q=jnp.asarray(q0),
                      pv=jnp.zeros((4, 3)))
    cell_lens = jnp.asarray([np.diag(s.get_cell()) for s in systems])
    kTs = jnp.asarray(KTS)

    loss_fn = make_multistate_fit(lj, cfg, mesh)
    loss_sharded, _ = loss_fn(params, states, cell_lens, kTs,
                              jnp.asarray(targets), masses)
    g_sharded = jax.grad(
        lambda p: loss_fn(p, states, cell_lens, kTs,
                          jnp.asarray(targets), masses)[0])(params)

    # serial oracle: the reference's per-state-point loop, built from the
    # framework's standard single-system path
    total = 0.0
    g_total = jax.tree_util.tree_map(jnp.zeros_like, params)
    for j, sys_ in enumerate(systems):
        pair = PairPotentials(sys_, lj, cutoff=CUTOFF, mode="dense")
        integ = NoseHooverChain(pair, sys_, T=KTS[j] / units.kB,
                                num_chains=3, Q=50.0, adjoint=False)
        sim = Simulation(sys_, integ)
        ode = sim.epoch_fn(dt=0.005, frequency=N_STEPS + 1)
        obs = rdf_obs(sys_, nbins=NBINS, r_range=RDF_RANGE)
        s0 = NVTState(v=jnp.asarray(v0[j]), q=jnp.asarray(q0[j]),
                      pv=jnp.zeros(3))
        tgt = jnp.asarray(targets[j])

        def loss_one(p):
            traj, _ = ode(p, s0, (), {"kT": jnp.asarray(KTS[j])})
            last = jax.tree_util.tree_map(lambda x: x[-1], traj)
            _, _, g = obs(last.q)
            return ((g - tgt) ** 2).mean()

        l, g = jax.value_and_grad(loss_one)(params)
        total += float(l)
        g_total = jax.tree_util.tree_map(jnp.add, g_total, g)

    np.testing.assert_allclose(float(loss_sharded), total, rtol=1e-4)
    for k in g_total:
        np.testing.assert_allclose(np.asarray(g_sharded[k]),
                                   np.asarray(g_total[k]), rtol=2e-3,
                                   atol=1e-7)


def test_multistate_train_step_moves_params():
    systems, q0, v0, targets = _state_points()
    mesh = make_mesh({"dp": 2, "sp": 4})
    cfg = _cfg(108)
    lj = potentials.LennardJones(0.9, 1.0)
    params = lj.init_params()
    step = make_multistate_train_step(lj, cfg, mesh, lr=1e-4)
    states = NVTState(v=jnp.asarray(v0), q=jnp.asarray(q0),
                      pv=jnp.zeros((4, 3)))
    cell_lens = jnp.asarray([np.diag(s.get_cell()) for s in systems])
    loss, new_params, finals = step(
        params, states, cell_lens, jnp.asarray(KTS),
        jnp.asarray(targets), jnp.asarray(systems[0].get_masses()))
    assert np.isfinite(float(loss))
    assert finals.q.shape == states.q.shape
    assert abs(float(new_params["sigma"]) - float(params["sigma"])) > 1e-9
