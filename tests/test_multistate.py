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


# ---------------------------------------------------------------------------
# Generalized engine: the flagship SchNet Stack through the LIBRARY stepper
# (VERDICT r2 item 1) -- sharded program == serial fit_rdf-style loop.
# ---------------------------------------------------------------------------

def _gnn_state_points():
    from mdgrad_tpu.nn import SchNet
    lattice_a = [1.679, 1.76]
    kts = [1.0, 1.2]
    gnn = SchNet({"n_atom_basis": 16, "n_filters": 16, "n_gaussians": 8,
                  "n_convolutions": 2, "cutoff": 1.6})
    rng = np.random.default_rng(3)
    systems, vs = [], []
    for a in lattice_a:
        sys_ = System.from_lattice("fcc", 2, a)   # 32 atoms
        systems.append(sys_)
        vs.append(rng.standard_normal((32, 3)) * 0.3)
    targets = 1.0 + 0.1 * rng.standard_normal((2, NBINS))
    return gnn, systems, np.stack(vs), np.asarray(kts), targets


def test_gnn_stack_multistate_matches_serial():
    from mdgrad_tpu import potentials as pots
    from mdgrad_tpu.interface import (GNNPotentials, PairPotentials, Stack,
                                      WithDynamicCell)
    from mdgrad_tpu.parallel import (make_mesh, make_stack_multistate_fit)

    gnn, systems, v0, kts, targets = _gnn_state_points()
    n_steps = 2
    cutoff = 1.6
    prior = pots.ExcludedVolume(epsilon=0.01, sigma=0.8, power=12)

    # ---- serial oracle: the standard single-state library pipeline ----
    total = 0.0
    g_total = None
    params = None
    for j, sys_ in enumerate(systems):
        stack = Stack({
            "nn": GNNPotentials(sys_, gnn, cutoff=cutoff, nbr_mode="table",
                                k_max=24),
            "pair": PairPotentials(sys_, prior, cutoff=cutoff,
                                   mode="dense")})
        integ = NoseHooverChain(stack, sys_, T=kts[j] / units.kB,
                                num_chains=3, Q=50.0, adjoint=True)
        sim = Simulation(sys_, integ)
        if params is None:
            params = sim.params
        ode = sim.epoch_fn(dt=0.005, frequency=n_steps + 1)
        obs = rdf_obs(sys_, nbins=NBINS, r_range=RDF_RANGE)
        s0 = integ.initial_state()._replace(
            v=jnp.asarray(v0[j]), q=jnp.asarray(sys_.get_positions()))
        aux0 = integ.aux_init(s0.q)
        tgt = jnp.asarray(targets[j])

        def loss_one(p, s0=s0, aux0=aux0, ode=ode, obs=obs, tgt=tgt,
                     kT=kts[j]):
            traj, _ = ode(p, s0, aux0, {"kT": jnp.asarray(kT)})
            _, _, g = obs(traj.q)
            return ((g - tgt) ** 2).mean()

        l, g = jax.value_and_grad(loss_one)(params)
        total += float(l)
        g_total = g if g_total is None else jax.tree_util.tree_map(
            jnp.add, g_total, g)

    # ---- sharded program: ONE compiled multi-state epoch over dp ----
    proto = systems[0]
    stack_proto = Stack({
        "nn": GNNPotentials(proto, gnn, cutoff=cutoff, nbr_mode="table",
                            k_max=24),
        "pair": PairPotentials(proto, prior, cutoff=cutoff, mode="dense")})
    dyn = WithDynamicCell(stack_proto, np.diag(proto.get_cell()))
    integ = NoseHooverChain(dyn, proto, T=kts[0] / units.kB, num_chains=3,
                            Q=50.0, adjoint=True)
    mesh = make_mesh({"dp": 2}, devices=jax.devices()[:2])
    loss_fn = make_stack_multistate_fit(
        integ, dt=0.005, n_steps=n_steps, nbins=NBINS,
        rdf_range=RDF_RANGE, mesh=mesh, frame_skip=1, loss_type="mse")

    states = jax.vmap(lambda q, v: integ.initial_state()._replace(q=q, v=v)
                      )(jnp.asarray(np.stack([s.get_positions()
                                              for s in systems])),
                        jnp.asarray(v0))
    cell_lens = jnp.asarray([np.diag(s.get_cell()) for s in systems])
    rhos = jnp.ones(2)

    vg = jax.jit(jax.value_and_grad(
        lambda p: loss_fn(p, states, cell_lens, jnp.asarray(kts),
                          jnp.asarray(targets), rhos)[0]))
    loss_sharded, g_sharded = vg(params)

    np.testing.assert_allclose(float(loss_sharded), total, rtol=1e-4)
    flat_a = jax.tree_util.tree_leaves(g_sharded)
    flat_b = jax.tree_util.tree_leaves(g_total)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-6)


def test_tpair_multistate_matches_serial():
    """TPairPotentials through the multistate engine (VERDICT r3 weak
    #5): per-state kT is grafted into the replicated params inside the
    vmapped body (kT_to_params); gradients must equal the serial loop
    that applies fit_rdf's kT_override per state."""
    from mdgrad_tpu.nn import TPairMLP
    from mdgrad_tpu import potentials as pots
    from mdgrad_tpu.interface import (TPairPotentials, PairPotentials,
                                      Stack, WithDynamicCell)
    from mdgrad_tpu.parallel import make_mesh, make_stack_multistate_fit

    lattice_a = [1.679, 1.76]
    kts = np.asarray([1.0, 1.2])
    cutoff = 1.6
    net = TPairMLP(n_gauss=8, r_start=0.0, r_end=cutoff, n_width=16,
                   n_layers=1, nonlinear="SELU")
    prior = pots.ExcludedVolume(epsilon=0.01, sigma=0.8, power=12)
    rng = np.random.default_rng(7)
    systems, vs = [], []
    for a in lattice_a:
        sys_ = System.from_lattice("fcc", 2, a)   # 32 atoms
        systems.append(sys_)
        vs.append(rng.standard_normal((32, 3)) * 0.3)
    v0 = np.stack(vs)
    targets = 1.0 + 0.1 * rng.standard_normal((2, NBINS))
    n_steps = 2

    # ---- serial oracle: single-system pipeline + kT_override graft ----
    total = 0.0
    g_total = None
    params = None
    for j, sys_ in enumerate(systems):
        stack = Stack({
            "nn": TPairPotentials(sys_, net, kts[j] / units.kB,
                                  cutoff=cutoff, mode="table"),
            "pair": PairPotentials(sys_, prior, cutoff=cutoff,
                                   mode="dense")})
        integ = NoseHooverChain(stack, sys_, T=kts[j] / units.kB,
                                num_chains=3, Q=50.0, adjoint=True)
        sim = Simulation(sys_, integ)
        if params is None:
            params = sim.params
        ode = sim.epoch_fn(dt=0.005, frequency=n_steps + 1)
        obs = rdf_obs(sys_, nbins=NBINS, r_range=RDF_RANGE)
        s0 = integ.initial_state()._replace(
            v=jnp.asarray(v0[j]), q=jnp.asarray(sys_.get_positions()))
        aux0 = integ.aux_init(s0.q)
        tgt = jnp.asarray(targets[j])

        def loss_one(p, s0=s0, aux0=aux0, ode=ode, obs=obs, tgt=tgt,
                     kT=kts[j]):
            p = {**p, "nn": {**p["nn"], "kT": jnp.asarray(kT)}}
            traj, _ = ode(p, s0, aux0, {"kT": jnp.asarray(kT)})
            _, _, g = obs(traj.q)
            return ((g - tgt) ** 2).mean()

        l, g = jax.value_and_grad(loss_one)(params)
        total += float(l)
        g_total = g if g_total is None else jax.tree_util.tree_map(
            jnp.add, g_total, g)

    # ---- sharded program with the kT_to_params graft ----
    proto = systems[0]
    stack_proto = Stack({
        "nn": TPairPotentials(proto, net, kts[0] / units.kB,
                              cutoff=cutoff, mode="table"),
        "pair": PairPotentials(proto, prior, cutoff=cutoff, mode="dense")})
    dyn = WithDynamicCell(stack_proto, np.diag(proto.get_cell()))
    integ = NoseHooverChain(dyn, proto, T=kts[0] / units.kB, num_chains=3,
                            Q=50.0, adjoint=True)
    mesh = make_mesh({"dp": 2}, devices=jax.devices()[:2])
    loss_fn = make_stack_multistate_fit(
        integ, dt=0.005, n_steps=n_steps, nbins=NBINS,
        rdf_range=RDF_RANGE, mesh=mesh, frame_skip=1, loss_type="mse",
        kT_to_params=lambda p, kT: {**p, "nn": {**p["nn"], "kT": kT}})

    states = jax.vmap(lambda q, v: integ.initial_state()._replace(q=q, v=v)
                      )(jnp.asarray(np.stack([s.get_positions()
                                              for s in systems])),
                        jnp.asarray(v0))
    cell_lens = jnp.asarray([np.diag(s.get_cell()) for s in systems])
    rhos = jnp.ones(2)

    vg = jax.jit(jax.value_and_grad(
        lambda p: loss_fn(p, states, cell_lens, jnp.asarray(kts),
                          jnp.asarray(targets), rhos)[0]))
    loss_sharded, g_sharded = vg(params)

    np.testing.assert_allclose(float(loss_sharded), total, rtol=1e-4)
    flat_a = jax.tree_util.tree_leaves(g_sharded)
    flat_b = jax.tree_util.tree_leaves(g_total)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-6)
