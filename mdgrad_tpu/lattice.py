"""Crystal-lattice and chain builders (replaces the reference's ASE usage).

The reference initializes systems with ``ase.lattice.cubic.FaceCenteredCubic``
and ``Diamond`` (/root/reference/scripts/fit_rdf_gnn.py:75-78,
scripts/data.py), a hand-rolled 2-D square lattice
(/root/reference/scripts/fit_rdf_pair.py:139-155), a helix generator and a
straight chain (/root/reference/demo/fold.py:8-19,119-121).  ASE is not a
dependency here, so these builders are implemented directly; each returns
``(positions (N,3) float64 ndarray, cell (3,3) float64 ndarray)``.
"""

import numpy as np

# fractional basis of the conventional cubic cells
_BASES = {
    "sc": np.array([[0.0, 0.0, 0.0]]),
    "bcc": np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]),
    "fcc": np.array([
        [0.0, 0.0, 0.0], [0.0, 0.5, 0.5], [0.5, 0.0, 0.5], [0.5, 0.5, 0.0],
    ]),
}
_BASES["diamond"] = np.concatenate(
    [_BASES["fcc"], _BASES["fcc"] + 0.25], axis=0
)

ATOMS_PER_UNITCELL = {k: len(v) for k, v in _BASES.items()}


def cubic_lattice(kind, size, latticeconstant):
    """Replicate a conventional cubic unit cell ``size`` times per axis.

    kind: 'sc' | 'bcc' | 'fcc' (4 atoms/cell) | 'diamond' (8 atoms/cell).
    Matches ASE's FaceCenteredCubic / Diamond atom placement used by the
    reference drivers.
    """
    if isinstance(size, int):
        size = (size, size, size)
    basis = _BASES[kind]
    cells = np.stack(np.meshgrid(
        np.arange(size[0]), np.arange(size[1]), np.arange(size[2]),
        indexing="ij"), axis=-1).reshape(-1, 3)
    frac = (cells[:, None, :] + basis[None, :, :]).reshape(-1, 3)
    positions = frac * latticeconstant
    cell = np.diag(np.asarray(size, dtype=np.float64) * latticeconstant)
    return positions, cell


def face_centered_cubic(size, latticeconstant):
    return cubic_lattice("fcc", size, latticeconstant)


def diamond(size, latticeconstant):
    return cubic_lattice("diamond", size, latticeconstant)


def square_lattice_2d(rho, size):
    """2-D square lattice at number density ``rho`` (size x size sites).

    Mirrors /root/reference/scripts/fit_rdf_pair.py:139-155 (``lattice_2d``):
    atoms live in the z=0 plane of a 3-D box whose xy side is ``size * L``
    with ``L = sqrt(size^2 / rho) / size``.
    """
    L = np.sqrt(size ** 2 / rho) / size
    i, j = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    positions = np.stack(
        [j.ravel() * L, i.ravel() * L, np.zeros(size * size)], axis=-1)
    cell = np.diag([L * size] * 3)
    return positions, cell


def helix(n_spirals, n_atoms, a, dz):
    """Helix target geometry (parity: /root/reference/demo/fold.py:8-19)."""
    t = np.linspace(0, np.pi * n_spirals, n_atoms)
    z = np.arange(n_atoms) * dz
    return np.stack([np.cos(t) * a, np.sin(t) * a, z], axis=-1)


def straight_chain(n_atoms, bond_len, origin=(50.0, 50.0, 50.0),
                   box=100.0):
    """Straight polymer chain in a large box (demo/fold.py:119-121)."""
    origin = np.asarray(origin, dtype=np.float64)
    positions = origin[None, :] + np.outer(
        np.arange(n_atoms), np.array([bond_len, 0.0, 0.0]))
    cell = np.diag([box] * 3)
    return positions, cell
