"""Electrostatics, temperature-dependent pair fitting, 2-D stripe systems,
Boltzmann-inversion spline, angle data loaders."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mdgrad_tpu import units, potentials
from mdgrad_tpu.system import System
from mdgrad_tpu.interface import Electrostatics, TPairPotentials
from mdgrad_tpu.md import NVE, NoseHooverChain, Simulation
from mdgrad_tpu.observables import rdf as rdf_obs


def test_electrostatics_two_charges():
    """Coulomb energy of a +/- pair matches k_e q1 q2 / r."""
    sys_ = System(np.array([[5.0, 5, 5], [7.0, 5, 5]]),
                  np.diag([20.0] * 3))
    inter = Electrostatics(sys_, charges=np.array([1.0, -1.0]), cutoff=5.0)
    u = float(inter.energy({}, jnp.asarray(sys_.get_positions()), ()))
    # k_e e^2 / (2 A) in eV ~ 14.3996 / 2
    np.testing.assert_allclose(u, -14.3996 / 2, rtol=1e-3)


def test_electrostatics_uses_distinct_charges():
    """q_i * q_j, not q_j^2 (the reference's q1*q1 bug is not replicated,
    interface.py:357-359)."""
    sys_ = System(np.array([[5.0, 5, 5], [7.0, 5, 5]]),
                  np.diag([20.0] * 3))
    xyz = jnp.asarray(sys_.get_positions())
    u_pm = float(Electrostatics(sys_, np.array([2.0, -1.0]),
                                cutoff=5.0).energy({}, xyz, ()))
    u_mm = float(Electrostatics(sys_, np.array([-1.0, -1.0]),
                                cutoff=5.0).energy({}, xyz, ()))
    assert u_pm < 0 < u_mm
    np.testing.assert_allclose(u_pm, -2 * u_mm, rtol=1e-5)


def test_tpair_potential_md_and_kT_leaf():
    """TPairPotentials: u(r, kT) with kT as a non-trainable params leaf;
    changing kT changes forces without recompile."""
    from mdgrad_tpu.nn import TPairMLP
    sys_ = System.from_lattice("fcc", 2, 1.679)
    sys_.set_temperature(1.0 / units.kB, rng=np.random.default_rng(0))
    net = TPairMLP(n_gauss=8, r_start=0.0, r_end=2.5, n_layers=1,
                   n_width=16)
    inter = TPairPotentials(sys_, net, T_kelvin=300.0, cutoff=1.6)
    params = inter.init_params()
    assert "kT" in params
    xyz = jnp.asarray(sys_.get_positions())
    aux = inter.aux_init(xyz)
    u1 = float(inter.energy(params, xyz, aux))
    params2 = {**params, "kT": params["kT"] * 2}
    u2 = float(inter.energy(params2, xyz, aux))
    assert u1 != u2


def test_2d_stripe_system_runs():
    """2-D workload: square lattice + spline-overlap potential, NVE in the
    plane, 2-D RDF normalization (reference stripe-phase config,
    data.py:454-483)."""
    from mdgrad_tpu.lattice import square_lattice_2d
    xyz, cell = square_lattice_2d(rho=0.9766, size=8)
    sys_ = System(xyz, cell, dim=2)
    sys_.set_temperature(0.07 / units.kB, rng=np.random.default_rng(0))
    pot = potentials.spline_overlap(K=4.7896, V0=1000.0, rmax=8.0)
    from mdgrad_tpu.interface import PairPotentials
    pair = PairPotentials(sys_, pot, cutoff=3.5, mode="dense")
    integ = NVE(pair, sys_, adjoint=False)
    sim = Simulation(sys_, integ, wrap=True)
    traj = sim.simulate(steps=20, dt=0.005, frequency=20)
    q = np.asarray(traj.q)
    assert np.isfinite(q).all()
    assert np.abs(q[..., 2] - q[0, 0, 2]).max() < 1e-6  # stays planar
    obs = rdf_obs(sys_, nbins=32, r_range=(0.5, 3.0))
    count, bins, g = obs(traj.q[-1])
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.skipif(not os.path.isdir("/root/reference/data"),
                    reason="reference data not mounted")
def test_angle_data_loader():
    from mdgrad_tpu.data import exp_angle_data, angle_data_dict
    d = exp_angle_data(64, (1.0, 3.0))
    assert d.shape == (64,)
    np.testing.assert_allclose(d.sum(), 1.0, rtol=1e-6)
    assert os.path.exists(angle_data_dict["water"][2.7])


def test_pair_table_mode_matches_dense():
    """PairPotentials mode='table' ((N, K) gather path for MLP pair models,
    where dense (N, N, hidden) activations are the HBM bottleneck) agrees
    with mode='dense' on energy, forces, and fit-shaped parameter grads."""
    from mdgrad_tpu.nn import PairMLP
    from mdgrad_tpu.interface import PairPotentials
    sys_ = System.from_lattice("fcc", 3, 1.679)
    sys_.set_temperature(1.2 / units.kB, rng=np.random.default_rng(1))
    net = PairMLP(n_gauss=16, r_start=0.0, r_end=3.0, n_layers=2,
                  n_width=32)
    rng = np.random.default_rng(2)
    sys_.set_positions(np.asarray(sys_.get_positions())
                       + 0.05 * rng.standard_normal(
                           (sys_.get_number_of_atoms(), 3)))
    dense = PairPotentials(sys_, net, cutoff=2.5, mode="dense")
    table = PairPotentials(sys_, net, cutoff=2.5, mode="table")
    params = dense.init_params()
    xyz = jnp.asarray(sys_.get_positions())
    aux = table.aux_init(xyz)
    assert not bool(aux.mask[:, -1].any()), "k_max slack exhausted"

    u_d = dense.energy(params, xyz, ())
    u_t = table.energy(params, xyz, aux)
    np.testing.assert_allclose(float(u_d), float(u_t), rtol=1e-5)

    f_d = jax.grad(lambda x: dense.energy(params, x, ()))(xyz)
    f_t = jax.grad(lambda x: table.energy(params, x, aux))(xyz)
    np.testing.assert_allclose(np.asarray(f_d), np.asarray(f_t),
                               rtol=1e-4, atol=1e-6)

    # fit-shaped: d(sum of forces^2)/d(params) through each path
    def floss(inter, aux_):
        def inner(p):
            f = jax.grad(lambda x: inter.energy(p, x, aux_))(xyz)
            return (f ** 2).sum()
        return jax.grad(inner)(params)
    g_d = floss(dense, ())
    g_t = floss(table, aux)
    for a, b in zip(jax.tree_util.tree_leaves(g_d),
                    jax.tree_util.tree_leaves(g_t)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)


def test_tpair_table_mode_dynamic_cell():
    """TPairPotentials inherits mode='table'; the traced ``cell=`` override
    (multistate per-state boxes) agrees with a rebuilt dense interaction."""
    from mdgrad_tpu.nn import TPairMLP
    sys_ = System.from_lattice("fcc", 2, 1.679)
    net = TPairMLP(n_gauss=8, r_start=0.0, r_end=2.5, n_layers=1,
                   n_width=16)
    table = TPairPotentials(sys_, net, T_kelvin=300.0, cutoff=1.6,
                            mode="table")
    params = table.init_params()
    xyz = jnp.asarray(sys_.get_positions())
    cell2 = jnp.asarray(np.diag(sys_.get_cell())) * 1.05
    aux2 = table.aux_init(xyz, cell=cell2)
    u_t = float(table.energy(params, xyz, aux2, cell=cell2))

    sys2 = System(np.asarray(sys_.get_positions()),
                  np.diag(np.asarray(cell2)))
    dense = TPairPotentials(sys2, net, T_kelvin=300.0, cutoff=1.6,
                            mode="dense")
    u_d = float(dense.energy(params, xyz, ()))
    np.testing.assert_allclose(u_t, u_d, rtol=1e-5)
