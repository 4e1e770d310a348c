"""Neighbor-list and minimum-image correctness.

Mirrors the reference's self-check against ASE
(/root/reference/torchmd/topology.py:126-146) using a brute-force numpy
periodic pair count as the oracle (ASE is not installed here).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mdgrad_tpu import lattice, topology


def brute_force_pairs(xyz, cell, cutoff):
    """O(N^2 * 27) oracle: count i<j pairs within cutoff over all images."""
    n = len(xyz)
    inv = np.linalg.inv(cell)
    count = 0
    dists = []
    for i in range(n):
        d = xyz[None, i] - xyz[i + 1:]
        frac = d @ inv
        frac -= np.round(frac)
        dmin = np.linalg.norm(frac @ cell, axis=-1)
        sel = dmin < cutoff
        count += sel.sum()
        dists.extend(dmin[sel])
    return count, np.sort(np.array(dists))


@pytest.fixture(scope="module")
def fcc_system():
    xyz, cell = lattice.face_centered_cubic(3, 1.679)
    return np.asarray(xyz), np.asarray(cell)


def test_pair_count_matches_brute_force(fcc_system):
    xyz, cell = fcc_system
    cutoff = 2.5
    expected, expected_d = brute_force_pairs(xyz, cell, cutoff)

    cap = topology.estimate_capacity(jnp.asarray(xyz), cutoff, cell)
    nbrs = topology.generate_nbr_list(jnp.asarray(xyz), cutoff, cell, cap)
    assert int(nbrs.count) == expected
    assert not bool(nbrs.overflow)
    assert int(nbrs.mask.sum()) == expected

    d = topology.compute_dis(jnp.asarray(xyz), nbrs.idx, nbrs.offsets, cell)
    d = np.sort(np.asarray(d[np.asarray(nbrs.mask)]).ravel())
    np.testing.assert_allclose(d, expected_d, rtol=1e-5)


def test_distance_matrix_symmetry_and_selfterm(fcc_system):
    xyz, cell = fcc_system
    dist, valid = topology.distance_matrix(jnp.asarray(xyz), cell)
    dist = np.asarray(dist)
    np.testing.assert_allclose(dist, dist.T, rtol=1e-6)
    assert np.all(np.diag(np.asarray(valid)) == False)  # noqa: E712
    # minimum image: no distance exceeds half the box diagonal
    assert dist.max() <= np.linalg.norm(np.diag(cell)) / 2 + 1e-6


def test_overflow_detection(fcc_system):
    xyz, cell = fcc_system
    nbrs = topology.generate_nbr_list(jnp.asarray(xyz), 2.5, cell, 8)
    assert bool(nbrs.overflow)


def test_nbr_list_jits(fcc_system):
    xyz, cell = fcc_system
    cap = topology.estimate_capacity(jnp.asarray(xyz), 2.5, cell)
    f = jax.jit(lambda x: topology.generate_nbr_list(x, 2.5, cell, cap))
    nbrs = f(jnp.asarray(xyz))
    nbrs2 = f(jnp.asarray(xyz) + 0.01)
    assert nbrs.idx.shape == nbrs2.idx.shape


def test_triclinic_min_image():
    cell = np.array([[4.0, 0.0, 0.0], [1.0, 4.0, 0.0], [0.5, 0.3, 4.0]])
    rng = np.random.default_rng(1)
    frac = rng.uniform(size=(32, 3))
    xyz = frac @ cell
    expected, expected_d = brute_force_pairs(xyz, cell, 1.8)
    assert expected > 0
    cap = 1024
    nbrs = topology.generate_nbr_list(jnp.asarray(xyz), 1.8, cell, cap)
    assert int(nbrs.count) == expected
    d = topology.compute_dis(jnp.asarray(xyz), nbrs.idx, nbrs.offsets, cell)
    d = np.sort(np.asarray(d[np.asarray(nbrs.mask)]).ravel())
    np.testing.assert_allclose(d, expected_d, rtol=1e-5)


def test_index_tuple_partial_selection(fcc_system):
    xyz, cell = fcc_system
    n = len(xyz)
    idx_a = np.arange(0, n // 2)
    idx_b = np.arange(n // 2, n)
    mask = topology.pair_index_mask(n, (idx_a, idx_b), None)
    nbrs_ab = topology.generate_nbr_list(jnp.asarray(xyz), 2.5, cell, 4096,
                                         select_mask=mask)
    mask_aa = topology.pair_index_mask(n, (idx_a, idx_a), None)
    nbrs_aa = topology.generate_nbr_list(jnp.asarray(xyz), 2.5, cell, 4096,
                                         select_mask=mask_aa)
    mask_bb = topology.pair_index_mask(n, (idx_b, idx_b), None)
    nbrs_bb = topology.generate_nbr_list(jnp.asarray(xyz), 2.5, cell, 4096,
                                         select_mask=mask_bb)
    total = topology.generate_nbr_list(jnp.asarray(xyz), 2.5, cell, 4096)
    assert (int(nbrs_ab.count) + int(nbrs_aa.count) + int(nbrs_bb.count)
            == int(total.count))


def test_ex_pairs_excluded(fcc_system):
    xyz, cell = fcc_system
    total = topology.count_pairs(jnp.asarray(xyz), 2.5, cell)
    nbrs = topology.generate_nbr_list(jnp.asarray(xyz), 2.5, cell, 4096)
    # exclude the first 5 real pairs
    ex = np.asarray(nbrs.idx[:5])
    mask = topology.pair_index_mask(len(xyz), None, ex)
    n2 = topology.count_pairs(jnp.asarray(xyz), 2.5, cell, mask)
    assert n2 == total - 5


def test_angle_triples_count():
    # 3 atoms in a line, spacing 1.0, cutoff 1.5: only the middle atom has
    # two neighbors -> exactly one angle
    xyz = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]])
    cell = np.diag([10.0, 10, 10])
    table, valid, _ = topology.neighbors_per_atom(xyz, 1.5, cell, 4)
    triples, mask = topology.angle_triples(table, valid)
    assert int(mask.sum()) == 1
    t = np.asarray(triples)[np.asarray(mask)]
    assert t[0, 1] == 1  # apex is the middle atom


def test_aux_overflow_traversal():
    import jax.numpy as jnp
    ok = topology.NeighborTable(table=jnp.zeros((2, 2), jnp.int32),
                                offsets=(), mask=jnp.ones((2, 2), bool),
                                overflow=jnp.asarray(False))
    bad = ok._replace(overflow=jnp.asarray(True))
    assert not topology.aux_overflow(ok)
    assert topology.aux_overflow(bad)
    # Stack-style dict aux, arbitrary nesting, empty aux
    assert not topology.aux_overflow(())
    assert not topology.aux_overflow({"nn": ok, "prior": ()})
    assert topology.aux_overflow({"nn": ok, "prior": {"inner": bad}})


def test_simulation_warns_on_overflow(fcc_system):
    # k_max=1 guarantees dropped neighbors in an fcc lattice (12 within
    # first shell): Simulation.simulate must surface the overflow
    import warnings
    from mdgrad_tpu.system import System
    from mdgrad_tpu.interface import GNNPotentials
    from mdgrad_tpu.md import NVE, Simulation
    from mdgrad_tpu.nn import SchNet

    xyz, cell = fcc_system
    system = System(np.asarray(xyz), cell)
    system.set_temperature(50.0, rng=np.random.default_rng(0))
    gnn = SchNet({"n_atom_basis": 8, "n_filters": 8, "n_gaussians": 8,
                  "n_convolutions": 1, "cutoff": 2.0})
    inter = GNNPotentials(system, gnn, cutoff=2.0, k_max=1)
    sim = Simulation(system, NVE(inter, system))
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        sim.simulate(steps=2, dt=0.001, frequency=2)
    assert any("overflow" in str(w.message) for w in rec)
