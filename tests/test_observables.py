"""Differentiable observables: RDF normalization/physics, VACF, angle
distribution, dihedrals."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mdgrad_tpu import units, potentials
from mdgrad_tpu.system import System
from mdgrad_tpu.observables import (rdf, vacf, angle_distribution,
                                    compute_angle, compute_dihe,
                                    generate_vol_bins)


def test_vol_bins_3d_and_2d():
    V3, vb3, bins3 = generate_vol_bins(0.5, 2.5, 20, dim=3)
    assert abs(float(vb3.sum()) - (4 / 3) * np.pi * (2.5 ** 3 - 0.5 ** 3)) \
        < 1e-3
    V2, vb2, _ = generate_vol_bins(0.5, 2.5, 20, dim=2)
    assert abs(float(vb2.sum()) - np.pi * (2.5 ** 2 - 0.5 ** 2)) < 1e-4


def test_ideal_gas_rdf_is_flat():
    """g(r) of an ideal gas ~ 1 (reference test strategy, SURVEY.md s4)."""
    rng = np.random.default_rng(0)
    L = 12.0
    sys_ = System(rng.uniform(0, L, (512, 3)), np.diag([L] * 3))
    obs = rdf(sys_, nbins=32, r_range=(1.0, 4.0))
    frames = jnp.asarray(rng.uniform(0, L, (8, 512, 3)))
    count, bins, g = obs(frames)
    assert abs(float(count.sum()) - 1.0) < 1e-5  # normalized counts
    g = np.asarray(g)
    assert abs(g.mean() - 1.0) < 0.15
    assert g.std() < 0.2


def test_rdf_gradients_wrt_positions():
    rng = np.random.default_rng(0)
    L = 6.0
    sys_ = System(rng.uniform(0, L, (32, 3)), np.diag([L] * 3))
    obs = rdf(sys_, nbins=16, r_range=(0.8, 2.5))
    xyz = jnp.asarray(sys_.get_positions())
    g = jax.grad(lambda x: (obs(x)[2] ** 2).sum())(xyz)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_vacf_of_constant_velocity():
    """Constant velocities: VACF is flat at <v^2>."""
    sys_ = System(np.zeros((4, 3)), np.diag([10.0] * 3))
    obs = vacf(sys_, t_range=5)
    v = jnp.ones((10, 4, 3)) * 0.5
    out = np.asarray(obs(v))
    np.testing.assert_allclose(out, 0.25, rtol=1e-6)
    assert out.shape == (5,)


def test_vacf_decorrelates_random_velocities():
    sys_ = System(np.zeros((64, 3)), np.diag([10.0] * 3))
    obs = vacf(sys_, t_range=4)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((200, 64, 3)))
    out = np.asarray(obs(v))
    assert out[0] > 0.9               # <v.v> ~ 1
    assert np.abs(out[1:]).max() < 0.05  # uncorrelated lags


def test_angle_distribution_tetrahedral():
    """A perfect tetrahedron around a center atom: all angles at 109.47
    degrees."""
    # methane-like geometry
    c = np.array([[0.0, 0, 0]])
    t = 1.0 / np.sqrt(3)
    verts = np.array([[t, t, t], [t, -t, -t], [-t, t, -t], [-t, -t, t]])
    xyz = np.concatenate([c, verts]) + 5.0
    sys_ = System(xyz, np.diag([10.0] * 3))
    obs = angle_distribution(sys_, nbins=64, angle_range=(0.5, np.pi),
                             cutoff=1.5, k_max=4)
    bins, count, (angles, mask, overflow) = obs(jnp.asarray(xyz))
    assert not bool(overflow)
    got = np.asarray(angles)[np.asarray(mask)]
    # center atom contributes C(4,2)=6 tetrahedral angles of 109.47 deg
    tet = np.full(6, np.arccos(-1 / 3))
    assert (np.abs(np.sort(got)[-6:] - tet) < 1e-2).all()
    # soft histogram peaks at the tetrahedral angle
    peak = float(bins[np.argmax(np.asarray(count))])
    assert abs(peak - np.arccos(-1 / 3)) < 0.15


def test_compute_angle_linear():
    xyz = jnp.asarray([[[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]]])
    # (frame, j, i, k): apex i=1
    angle_list = jnp.asarray([[0, 0, 1, 2]])
    cos = compute_angle(xyz, angle_list, np.diag([20.0] * 3), N=3)
    np.testing.assert_allclose(float(cos[0]), -1.0, atol=1e-6)


def test_compute_dihe_planar():
    # cis (0 deg) dihedral: all in a plane, same side
    xyz = jnp.asarray([[[0.0, 1, 0], [0, 0, 0], [1, 0, 0], [1, 1, 0]]])
    dihes = jnp.asarray([[0, 1, 2, 3]])
    cos_phi = compute_dihe(xyz, dihes)
    assert abs(abs(float(cos_phi[0, 0])) - 1.0) < 1e-5


def test_vacf_matches_loop_reference():
    """Vectorized lag-matrix VACF == the naive per-lag loop."""
    sys_ = System(np.zeros((8, 3)), np.diag([10.0] * 3))
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal((37, 8, 3)))
    t_range = 9
    out = np.asarray(vacf(sys_, t_range)(v))
    ref = [float((v * v).mean())]
    for t in range(1, t_range):
        ref.append(float((v[t:] * v[:-t]).mean()))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_vacf_long_lag_compiles_fast():
    """t_range=256 must not unroll into 256 jaxpr copies (VERDICT r1 #7)."""
    import time
    sys_ = System(np.zeros((16, 3)), np.diag([10.0] * 3))
    obs = vacf(sys_, t_range=256)
    v = jnp.zeros((300, 16, 3))
    t0 = time.time()
    jax.jit(obs.__call__).lower(v).compile()
    assert time.time() - t0 < 20.0


def test_signed_dihedrals_match_fold_internal():
    """observables.signed_dihedrals == train/fold.py's chain dihedrals
    (VERDICT r4 missing #1: the standalone dihedral observable)."""
    from mdgrad_tpu.observables import (signed_dihedrals, chain_quads,
                                        dihedral_distribution)
    from mdgrad_tpu.train.fold import compute_intcoord
    rng = np.random.default_rng(5)
    xyz = jnp.asarray(rng.standard_normal((3, 12, 3)))
    quads = jnp.asarray(chain_quads(12))
    phi = signed_dihedrals(xyz, quads)
    _, _, d_i = compute_intcoord(xyz)
    # fold clips cos(phi) to +-0.99 (clamping |phi| < arccos(0.99) ~= 0.14
    # and |phi| > pi - 0.14); compare away from its clip region, where the
    # atan2 form is exact and fold's arccos is not saturated
    m = np.abs(np.cos(np.asarray(phi))) < 0.98
    np.testing.assert_allclose(np.asarray(phi)[m], np.asarray(d_i)[m],
                               atol=1e-4)
    # cos parity with the reference-shaped compute_dihe export
    cos = compute_dihe(xyz, quads)
    np.testing.assert_allclose(np.cos(np.asarray(phi)), np.asarray(cos),
                               atol=1e-5)

    dist = dihedral_distribution(12, nbins=32)
    bins, counts, phis = dist(xyz)
    assert bins.shape == (33,)
    np.testing.assert_allclose(float(counts.sum()), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(phis), np.asarray(phi),
                               atol=1e-6)
    # differentiable in xyz (usable as a fitting observable)
    g = jax.grad(lambda x: (dist(x)[1] ** 2).sum())(xyz)
    assert np.isfinite(np.asarray(g)).all()
