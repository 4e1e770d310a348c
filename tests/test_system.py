"""System container, units and Maxwell-Boltzmann initialization."""

import numpy as np
import pytest

from mdgrad_tpu import units
from mdgrad_tpu.system import System, wrap_positions
from mdgrad_tpu import lattice


def test_units_match_ase_values():
    # ASE (CODATA2014) reference values
    assert abs(units.kB - 8.6173303e-5) < 1e-10
    assert abs(units.fs - 0.098226948) < 1e-6


def test_maxwell_boltzmann_temperature(rng):
    sys = System.from_lattice("fcc", 5, 1.679)  # 500 atoms
    sys.set_temperature(120.0, rng=rng)
    # kinetic temperature should match the target within sampling noise
    assert abs(sys.temperature() - 120.0) / 120.0 < 0.15


def test_2d_system_zeroes_z_velocity(rng):
    xyz, cell = lattice.square_lattice_2d(rho=0.4, size=10)
    sys = System(xyz, cell, dim=2)
    sys.set_temperature(1.0 / units.kB, rng=rng)  # T = 1 energy unit
    assert np.all(sys.velocities[:, 2] == 0.0)


def test_wrap_positions():
    cell = np.diag([4.0, 4.0, 4.0])
    pos = np.array([[5.0, -1.0, 2.0]])
    wrapped = wrap_positions(pos, cell)
    np.testing.assert_allclose(wrapped, [[1.0, 3.0, 2.0]], atol=1e-12)


def test_get_batch_and_nxyz():
    sys = System.from_lattice("fcc", 2, 1.5, symbol="Ar")
    nxyz = sys.get_nxyz()
    assert nxyz.shape == (32, 4)
    assert np.all(nxyz[:, 0] == 18)
    batch = sys.get_batch()
    assert batch["num_atoms"][0] == 32


def test_diamond_lattice_atom_count():
    xyz, cell = lattice.diamond(4, 2.0)
    assert len(xyz) == 8 * 64
    assert np.allclose(np.diag(cell), 8.0)


def test_fcc_nearest_neighbor_distance():
    xyz, cell = lattice.face_centered_cubic(3, 1.679)
    d = xyz[None, :, :] - xyz[:, None, :]
    frac = d @ np.linalg.inv(cell)
    frac -= np.round(frac)
    dist = np.linalg.norm(frac @ cell, axis=-1)
    dist[dist == 0] = np.inf
    assert abs(dist.min() - 1.679 / np.sqrt(2)) < 1e-10
