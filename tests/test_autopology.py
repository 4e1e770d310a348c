"""Bonded-topology generation and the AuTopology classical-FF learner."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mdgrad_tpu.data.topology import (generate_angles, generate_dihedrals,
                                      generate_impropers, generate_pairs,
                                      generate_topologies,
                                      bonds_from_distances,
                                      molecular_subgraphs,
                                      reconstruct_atoms)
from mdgrad_tpu.nn.autopology import AuTopology
from mdgrad_tpu.lattice import straight_chain


def chain_bonds(n):
    return np.stack([np.arange(n - 1), np.arange(1, n)], -1)


def test_chain_topology_counts():
    n = 8
    bonds = chain_bonds(n)
    assert len(generate_angles(bonds, n)) == n - 2
    assert len(generate_dihedrals(bonds, n)) == n - 3
    assert len(generate_impropers(bonds, n)) == 0  # no 3-coordinate atoms
    # pairs: all (i<j) minus 1-2, 1-3, 1-4
    pairs = generate_pairs(bonds, n, exclude_14=True)
    expected = n * (n - 1) // 2 - (n - 1) - (n - 2) - (n - 3)
    assert len(pairs) == expected


def test_branched_impropers():
    # star: atom 0 bonded to 1,2,3 -> one improper at center 0
    bonds = np.array([[0, 1], [0, 2], [0, 3]])
    imp = generate_impropers(bonds, 4)
    assert len(imp) == 1 and imp[0, 0] == 0
    ang = generate_angles(bonds, 4)
    assert len(ang) == 3  # C(3,2) at the center


def test_bonds_from_distances_and_subgraphs():
    xyz1, _ = straight_chain(4, 1.0, origin=(0, 0, 0))
    xyz2, _ = straight_chain(3, 1.0, origin=(10, 10, 10))
    xyz = np.concatenate([xyz1, xyz2])
    bonds = bonds_from_distances(xyz, cutoff=1.2)
    assert len(bonds) == 5
    comps = molecular_subgraphs(bonds, 7)
    assert sorted(map(len, comps)) == [3, 4]


def test_reconstruct_atoms_unwraps():
    # molecule split across the boundary of a 10-box
    xyz = np.array([[9.8, 0, 0], [0.2, 0, 0]])  # bonded, wrapped apart
    out = reconstruct_atoms(xyz, [[0, 1]], np.array([10.0, 10, 10]))
    assert abs(np.linalg.norm(out[0] - out[1]) - 0.4) < 1e-9


@pytest.fixture(scope="module")
def auto_setup():
    n = 8
    rng = np.random.default_rng(0)
    xyz, _ = straight_chain(n, 1.2, origin=(0, 0, 0))
    xyz = xyz + rng.normal(0, 0.08, xyz.shape)
    tops_np = generate_topologies(chain_bonds(n), n)
    model = AuTopology({
        "Fr": 16, "Lh": [16], "bond_terms": ["harmonic"],
        "angle_terms": ["harmonic"], "dihedral_terms": ["OPLS"],
        "pair_terms": ["LJ"], "n_convolutions": 2,
        "trainable_prior": True})
    tops, masks = model.prepare_topologies(tops_np)
    z = jnp.ones(n, dtype=jnp.int32)
    params = model.init_params(z, tops, masks)
    return model, params, z, jnp.asarray(xyz), tops, masks


def test_autopology_energy_and_forces(auto_setup):
    model, params, z, xyz, tops, masks = auto_setup
    u, f = model.energy_and_forces(params, z, xyz, tops, masks)
    assert np.isfinite(float(u))
    assert f.shape == xyz.shape and np.isfinite(np.asarray(f)).all()


def test_autopology_forces_match_fd(auto_setup):
    model, params, z, xyz, tops, masks = auto_setup
    g = jax.grad(model.energy, argnums=2)(params, z, xyz, tops, masks)
    eps = 1e-3
    dx = jnp.zeros_like(xyz).at[3, 1].set(eps)
    fd = (float(model.energy(params, z, xyz + dx, tops, masks))
          - float(model.energy(params, z, xyz - dx, tops, masks))) / (2 * eps)
    np.testing.assert_allclose(float(g[3, 1]), fd, rtol=5e-2, atol=1e-3)


def test_autopology_trains(auto_setup):
    """One gradient step on an energy-matching loss reduces it."""
    model, params, z, xyz, tops, masks = auto_setup
    target = 1.0

    def loss(p):
        return (model.energy(p, z, xyz, tops, masks) - target) ** 2

    l0, g = jax.value_and_grad(loss)(params)
    for lr in (1e-6, 1e-7, 1e-8, 1e-9):
        p1 = jax.tree_util.tree_map(lambda a, b: a - lr * b, params, g)
        if float(loss(p1)) < float(l0):
            return
    raise AssertionError(f"no descent from l0={float(l0)}")


def test_nontrainable_prior_returns_constant_params(auto_setup):
    model = AuTopology({"Fr": 8, "Lh": [8], "bond_terms": ["harmonic"],
                        "trainable_prior": False, "n_convolutions": 1})
    n = 6
    xyz, _ = straight_chain(n, 1.2)
    tops, masks = model.prepare_topologies(
        generate_topologies(chain_bonds(n), n))
    z = jnp.ones(n, dtype=jnp.int32)
    params = model.init_params(z, tops, masks)
    # ZeroNet parameter heads: energy = pure priors (r0=1.5, k=100)
    u = float(model.energy(params, z, jnp.asarray(xyz), tops, masks))
    d = 1.2
    expected_bond = (n - 1) * 50.0 * (d - 1.5) ** 2
    # offset head is trainable -> subtract by evaluating at r0 distance
    xyz0, _ = straight_chain(n, 1.5)
    u0 = float(model.energy(params, z, jnp.asarray(xyz0), tops, masks))
    np.testing.assert_allclose(u - u0, expected_bond, rtol=1e-4)


def test_schnet_autopology_staged(auto_setup):
    """Combined model: autopology-only -> transfer to schnet; multi-state
    sorting keeps energies ordered (reference schnet.py:303-479)."""
    from mdgrad_tpu.nn.schnet_autopology import SchNetAuTopology
    from mdgrad_tpu import topology
    _, _, z, xyz, tops, masks = auto_setup
    n = int(z.shape[0])
    model = SchNetAuTopology({
        "schnet_params": {"n_atom_basis": 16, "n_filters": 16,
                          "n_gaussians": 8, "n_convolutions": 1,
                          "cutoff": 3.0},
        "autopology_params": {"Fr": 16, "Lh": [16],
                              "bond_terms": ["harmonic"],
                              "n_convolutions": 1,
                              "trainable_prior": True},
        "sorted_result_keys": ["energy_0", "energy_1"],
        "sort_results": True})
    params = model.init_params(z, tops, masks)
    cell = np.diag([100.0] * 3)
    nbrs = topology.generate_nbr_list(xyz, 3.0, cell, 256)
    off = nbrs.offsets @ jnp.asarray(cell)

    assert model.trainable_labels()["autopology"] == "train"
    e1 = model.energies(params, z, xyz, nbrs.idx, off, nbrs.mask, tops,
                        masks)
    assert e1.shape == (2,)
    assert float(e1[0]) <= float(e1[1])  # sorted

    labels = model.transfer_to_schnet()
    assert labels == {"schnet": "train", "autopology": "frozen"}
    e2, f2 = model.energies_and_forces(params, z, xyz, nbrs.idx, off,
                                       nbrs.mask, tops, masks)
    assert not np.allclose(np.asarray(e1), np.asarray(e2))  # schnet added
    assert f2.shape == (2, n, 3)
    assert np.isfinite(np.asarray(f2)).all()


def test_covalent_pair_cutoffs():
    """Per-species bond tables (reference nff/data/graphs.py:8-102):
    an O-H pair at 1.1 A bonds (thr 1.3) but an H-H pair at the same
    distance does not (thr 1.0); Li-C never bonds."""
    from mdgrad_tpu.data.topology import bonds_from_distances
    xyz = np.array([[0.0, 0, 0], [1.1, 0, 0]])
    assert len(bonds_from_distances(xyz, species=[8, 1])) == 1
    assert len(bonds_from_distances(xyz, species=[1, 1])) == 0
    xyz2 = np.array([[0.0, 0, 0], [0.5, 0, 0]])
    assert len(bonds_from_distances(xyz2, species=[3, 6])) == 0
    # unknown pair falls back to the scalar default
    assert len(bonds_from_distances(xyz, cutoff=1.8, species=[26, 26])) == 1


def test_glue_stack_combines_models():
    """nn.glue.Stack parity (reference nff/nn/glue.py:4-37)."""
    import jax.numpy as jnp
    from mdgrad_tpu.nn import SchNet
    from mdgrad_tpu.nn.glue import Stack

    mp = {"n_atom_basis": 16, "n_filters": 16, "n_gaussians": 8,
          "n_convolutions": 1, "cutoff": 3.0}
    stack = Stack({"a": SchNet(mp), "b": SchNet(mp)})
    z = jnp.array([6, 6, 8])
    params = stack.init_params(z)
    batch = {
        "z": z[None], "xyz": jnp.asarray(
            np.random.default_rng(0).uniform(0, 2, (1, 3, 3))),
        "nbr_idx": jnp.array([[[0, 1], [0, 2], [1, 2]]]),
        "offsets": jnp.zeros((1, 3, 3)),
        "nbr_mask": jnp.ones((1, 3), dtype=bool),
        "atom_mask": jnp.ones((1, 3), dtype=bool)}
    out = stack.batched_predict(params, batch)
    ea = stack.models["a"].batched_predict(params["a"], batch)["energy"]
    eb = stack.models["b"].batched_predict(params["b"], batch)["energy"]
    np.testing.assert_allclose(np.asarray(out["energy"]),
                               np.asarray(ea + eb), rtol=1e-6)
    mean = Stack({"a": stack.models["a"], "b": stack.models["b"]},
                 mode="mean").batched_predict(params, batch)
    np.testing.assert_allclose(np.asarray(mean["energy"]),
                               np.asarray(ea + eb) / 2, rtol=1e-6)
