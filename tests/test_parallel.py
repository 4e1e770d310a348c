"""Multi-chip sharding on the virtual 8-device CPU mesh: sharded pair
energy == single-device energy; full dp x sp training step runs and
matches unsharded gradients.

The 32-atom test box has L/2 = 1.679, so the cutoff is kept at 1.6 --
past L/2 the single-image minimum-image convention makes boundary-pair
image choices rounding-sensitive and cross-implementation force
comparisons meaningless (PairPotentials warns in that regime)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from mdgrad_tpu import units, potentials, topology
from mdgrad_tpu.system import System
from mdgrad_tpu.interface import PairPotentials
from mdgrad_tpu.parallel import (make_mesh, spatial_pair_energy,
                                 make_sharded_fit_step)
from mdgrad_tpu.parallel.replica import ShardedMDConfig, make_sharded_epoch
from mdgrad_tpu.md.integrators import NVTState


@pytest.fixture(scope="module")
def sys32():
    sys = System.from_lattice("fcc", 2, 1.679)
    sys.set_temperature(1.0 / units.kB, rng=np.random.default_rng(5))
    return sys


def test_mesh_construction():
    mesh = make_mesh({"dp": 2, "sp": -1})
    assert mesh.shape == {"dp": 2, "sp": 4}


def test_spatial_energy_matches_dense(sys32):
    mesh = make_mesh({"sp": 8})
    lj = potentials.LennardJones(1.0, 1.0)
    params = lj.init_params()
    xyz = jnp.asarray(sys32.get_positions())
    cell = jnp.asarray(sys32.get_cell())

    f = shard_map(
        lambda p, x: spatial_pair_energy(lj, p, x, cell, 1.6),
        mesh=mesh, in_specs=(P(), P("sp")), out_specs=P())
    u_sharded = f(params, xyz)

    dense = PairPotentials(sys32, lj, cutoff=1.6, mode="dense")
    u_dense = dense.energy(params, xyz, ())
    np.testing.assert_allclose(float(u_sharded), float(u_dense), rtol=1e-5)


def test_spatial_forces_match_dense(sys32):
    mesh = make_mesh({"sp": 8})
    lj = potentials.LennardJones(1.0, 1.0)
    params = lj.init_params()
    xyz = jnp.asarray(sys32.get_positions())
    cell = jnp.asarray(sys32.get_cell())

    f = shard_map(
        lambda p, x: spatial_pair_energy(lj, p, x, cell, 1.6),
        mesh=mesh, in_specs=(P(), P("sp")), out_specs=P())
    g_sharded = jax.grad(f, argnums=1)(params, xyz)

    dense = PairPotentials(sys32, lj, cutoff=1.6, mode="dense")
    g_dense = jax.grad(dense.energy, argnums=1)(params, xyz, ())
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_dense),
                               rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def sys108():
    # large enough that cutoff 2.4 AND the RDF boundary (1.9 + 0.5) stay
    # below L/2 = 2.52, keeping minimum image unambiguous
    sys = System.from_lattice("fcc", 3, 1.679)
    sys.set_temperature(1.0 / units.kB, rng=np.random.default_rng(5))
    return sys


def _make_cfg(sys_, n_steps=4):
    n = sys_.get_number_of_atoms()
    Q = jnp.asarray([50.0, 50.0 / n, 50.0 / n])
    return ShardedMDConfig(
        cell=sys_.get_cell(), cutoff=2.4,
        masses=jnp.asarray(sys_.get_masses()), dt=0.005,
        n_steps=n_steps, kT=1.0, Q=Q, n_dof=3 * n)


def _batched_states(sys32, R, rng):
    n = sys32.get_number_of_atoms()
    q = jnp.asarray(np.stack([sys32.get_positions()] * R))
    v = jnp.asarray(rng.standard_normal((R, n, 3)) * 0.5)
    pv = jnp.zeros((R, 3))
    return NVTState(v=v, q=q, pv=pv)


def test_full_sharded_training_step(sys108):
    """dp=2 x sp=4: one value_and_grad + update over 8 replicas-atoms."""
    mesh = make_mesh({"dp": 2, "sp": 4})
    cfg = _make_cfg(sys108)
    lj = potentials.LennardJones(0.9, 1.0)
    g_target = np.ones(32)
    step = make_sharded_fit_step(lj, cfg, mesh, g_target,
                                 rdf_range=(0.75, 1.9), nbins=32, lr=1e-4)
    states = _batched_states(sys108, 4, np.random.default_rng(0))
    params = lj.init_params()
    loss, new_params, finals = step(params, states,
                                    jnp.asarray(sys108.get_masses()))
    assert np.isfinite(float(loss))
    assert finals.q.shape == states.q.shape
    assert abs(float(new_params["sigma"]) - float(params["sigma"])) > 1e-9


def test_sharded_loss_matches_unsharded_gradients(sys108):
    """dp x sp epoch-loss gradients == plain vmap single-device version."""
    mesh = make_mesh({"dp": 2, "sp": 4})
    cfg = _make_cfg(sys108, n_steps=3)
    lj = potentials.LennardJones(0.9, 1.0)
    g_target = jnp.ones(32)
    _, loss_fn = make_sharded_epoch(lj, cfg, mesh,
                                    rdf_range=(0.75, 1.9), nbins=32)
    states = _batched_states(sys108, 4, np.random.default_rng(0))
    masses = jnp.asarray(sys108.get_masses())
    params = lj.init_params()

    g_sharded = jax.grad(
        lambda p: loss_fn(p, states, masses, g_target)[0])(params)

    # unsharded oracle: same physics with the framework's own NHC stepper
    from mdgrad_tpu.md import NoseHooverChain, Simulation
    from mdgrad_tpu.observables import rdf as rdf_obs
    pair = PairPotentials(sys108, lj, cutoff=2.4, mode="dense")
    integ = NoseHooverChain(pair, sys108, T=1.0 / units.kB, num_chains=3,
                            Q=50.0, adjoint=False)
    sim = Simulation(sys108, integ)
    ode = sim.epoch_fn(dt=0.005, frequency=cfg.n_steps + 1)
    obs = rdf_obs(sys108, nbins=32, r_range=(0.75, 1.9))
    ctrl = {"kT": jnp.asarray(1.0)}

    def loss_one(p, s):
        traj, _ = ode(p, s, (), ctrl)
        last = jax.tree_util.tree_map(lambda x: x[-1], traj)
        _, _, g = obs(last.q)
        return ((g - g_target) ** 2).mean()

    def loss_ref(p):
        per = jax.vmap(lambda v, q, pv: loss_one(
            p, NVTState(v=v, q=q, pv=pv)))(states.v, states.q, states.pv)
        return per.sum()

    g_ref = jax.grad(loss_ref)(params)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_sharded[k]),
                                   np.asarray(g_ref[k]), rtol=2e-3,
                                   atol=1e-7)


def test_sp_sharded_gnn_epoch_matches_unsharded():
    """Atom-sharded (GSPMD) SchNet epoch == the unsharded program:
    commit state/aux rows to the 'sp' axis and run the SAME compiled
    library epoch (parallel/spatial_gnn.shard_gnn_state)."""
    from mdgrad_tpu.nn import SchNet
    from mdgrad_tpu.interface import GNNPotentials
    from mdgrad_tpu.md import NoseHooverChain, Simulation
    from mdgrad_tpu.parallel import make_mesh
    from mdgrad_tpu.parallel.spatial_gnn import shard_gnn_state

    sys_ = System.from_lattice("fcc", 2, 1.76)  # 32 atoms
    sys_.set_temperature(1.0 / units.kB, rng=np.random.default_rng(0))
    gnn = SchNet({"n_atom_basis": 16, "n_filters": 16, "n_gaussians": 8,
                  "n_convolutions": 2, "cutoff": 1.6})
    inter = GNNPotentials(sys_, gnn, cutoff=1.6, nbr_mode="table",
                          k_max=16)
    integ = NoseHooverChain(inter, sys_, T=1.0 / units.kB, num_chains=3,
                            Q=50.0, adjoint=True)
    sim = Simulation(sys_, integ)
    ode = sim.epoch_fn(dt=0.005, frequency=5)
    state, aux = sim.initial_state()
    ctrl = integ.default_ctrl()

    def loss(p, st, ax):
        traj, _ = ode(p, st, ax, ctrl)
        return (traj.q[-1] ** 2).sum()

    l_ref, g_ref = jax.value_and_grad(loss)(sim.params, state, aux)

    mesh = make_mesh({"sp": 4}, devices=jax.devices()[:4])
    st_s, ax_s = shard_gnn_state(state, aux, mesh)
    l_s, g_s = jax.value_and_grad(loss)(sim.params, st_s, ax_s)

    np.testing.assert_allclose(float(l_s), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_s),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
