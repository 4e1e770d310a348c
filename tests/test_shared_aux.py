"""Stack aux sharing: one neighbor table feeds multiple interactions.

The 4k-atom water stack motivates this: GNN (cells-built (N, K) table)
+ ExcludedVolume prior at the SAME cutoff -- without sharing the prior
re-derives neighbors through its own O(N^2) sparse rebuild every
refresh (VERDICT r4 item 3, the official scaling metric's hot path).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mdgrad_tpu import potentials, units
from mdgrad_tpu.system import System
from mdgrad_tpu.interface import (GNNPotentials, PairPotentials, Stack)
from mdgrad_tpu.nn import SchNet


def _system(n_cell=3, a=1.679):
    sys_ = System.from_lattice("fcc", n_cell, a)
    sys_.set_temperature(1.0 / units.kB, rng=np.random.default_rng(0))
    return sys_


def _gnn(cutoff, nbr_mode="table", skin=0.0):
    return SchNet({"n_atom_basis": 32, "n_filters": 32, "n_gaussians": 16,
                   "n_convolutions": 1, "cutoff": cutoff})


def test_shared_table_energy_matches_unshared():
    sys_ = _system()
    cutoff = 2.2
    gnn = _gnn(cutoff)
    ev = potentials.ExcludedVolume(sigma=0.9, epsilon=1.0, power=12)

    nn = GNNPotentials(sys_, gnn, cutoff=cutoff, nbr_mode="table")
    prior_shared = PairPotentials(sys_, ev, cutoff=cutoff, mode="table")
    prior_own = PairPotentials(sys_, ev, cutoff=cutoff, mode="table")
    prior_dense = PairPotentials(sys_, ev, cutoff=cutoff, mode="dense")

    stack_shared = Stack({"nn": nn, "prior": prior_shared},
                         share_aux={"prior": "nn"})
    stack_plain = Stack({"nn": nn, "prior": prior_own})

    xyz = jnp.asarray(sys_.get_positions())
    params = stack_plain.init_params()
    aux_s = stack_shared.aux_init(xyz)
    aux_p = stack_plain.aux_init(xyz)

    assert aux_s["prior"] == ()
    e_s = float(stack_shared.energy(params, xyz, aux_s))
    e_p = float(stack_plain.energy(params, xyz, aux_p))
    np.testing.assert_allclose(e_s, e_p, rtol=1e-6)

    # prior term alone vs the dense ground truth
    ps = {"prior": params["prior"]}
    e_prior_shared = float(prior_shared.energy(params["prior"], xyz,
                                               aux_s["nn"]))
    e_prior_dense = float(prior_dense.energy(params["prior"], xyz, ()))
    np.testing.assert_allclose(e_prior_shared, e_prior_dense, rtol=1e-6)


def test_shared_table_larger_donor_cutoff_remasked():
    """Donor built at cutoff + skin: the sharer's runtime re-mask must
    reduce it to the sharer's own cutoff exactly."""
    sys_ = _system()
    gnn = _gnn(2.4)
    ev = potentials.ExcludedVolume(sigma=0.9, epsilon=1.0, power=12)
    nn = GNNPotentials(sys_, gnn, cutoff=2.4, nbr_mode="table", skin=0.4)
    prior = PairPotentials(sys_, ev, cutoff=1.9, mode="table")
    stack = Stack({"nn": nn, "prior": prior}, share_aux={"prior": "nn"})
    dense = PairPotentials(sys_, ev, cutoff=1.9, mode="dense")

    xyz = jnp.asarray(sys_.get_positions())
    params = stack.init_params()
    aux = stack.aux_init(xyz)
    e_shared = float(prior.energy(params["prior"], xyz, aux["nn"]))
    e_dense = float(dense.energy(params["prior"], xyz, ()))
    # dense and table compute distances in different op orders (f32)
    np.testing.assert_allclose(e_shared, e_dense, rtol=1e-5)


def test_shared_aux_gradients_match():
    sys_ = _system()
    cutoff = 2.2
    gnn = _gnn(cutoff)
    ev = potentials.ExcludedVolume(sigma=0.9, epsilon=1.0, power=12)
    nn = GNNPotentials(sys_, gnn, cutoff=cutoff, nbr_mode="table")
    prior_s = PairPotentials(sys_, ev, cutoff=cutoff, mode="table")
    prior_o = PairPotentials(sys_, ev, cutoff=cutoff, mode="table")
    stack_s = Stack({"nn": nn, "prior": prior_s},
                    share_aux={"prior": "nn"})
    stack_o = Stack({"nn": nn, "prior": prior_o})
    xyz = jnp.asarray(sys_.get_positions())
    params = stack_o.init_params()
    aux_s = stack_s.aux_init(xyz)
    aux_o = stack_o.aux_init(xyz)

    f_s = jax.grad(lambda x: stack_s.energy(params, x, aux_s))(xyz)
    f_o = jax.grad(lambda x: stack_o.energy(params, x, aux_o))(xyz)
    np.testing.assert_allclose(np.asarray(f_s), np.asarray(f_o),
                               rtol=1e-5, atol=1e-7)


def test_share_aux_validation():
    sys_ = _system()
    ev = potentials.ExcludedVolume(sigma=0.9, epsilon=1.0, power=12)
    p1 = PairPotentials(sys_, ev, cutoff=2.0, mode="table")
    p2 = PairPotentials(sys_, ev, cutoff=2.0, mode="table")
    with pytest.raises(ValueError):
        Stack({"a": p1}, share_aux={"a": "missing"})
    with pytest.raises(ValueError):
        Stack({"a": p1, "b": p2}, share_aux={"a": "b", "b": "a"})


def test_shared_aux_through_simulation():
    """End-to-end: a short NVE run with the shared stack stays finite
    and matches the unshared stack's trajectory."""
    from mdgrad_tpu.md import NVE, Simulation
    sys_a = _system()
    sys_b = _system()
    cutoff = 2.2
    ev = potentials.ExcludedVolume(sigma=0.9, epsilon=1.0, power=12)

    def run(sys_, share):
        gnn = _gnn(cutoff)
        nn = GNNPotentials(sys_, gnn, cutoff=cutoff, nbr_mode="table")
        prior = PairPotentials(sys_, ev, cutoff=cutoff, mode="table")
        stack = Stack({"nn": nn, "prior": prior},
                      share_aux={"prior": "nn"} if share else None)
        integ = NVE(stack, sys_, adjoint=True)
        sim = Simulation(sys_, integ)
        traj = sim.simulate(steps=30, dt=0.002, frequency=30)
        return np.asarray(traj.q[-1])

    qa = run(sys_a, True)
    qb = run(sys_b, False)
    assert np.isfinite(qa).all()
    np.testing.assert_allclose(qa, qb, atol=1e-6)
