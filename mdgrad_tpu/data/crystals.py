"""Crystal-structure interop (parity: /root/reference/nff/data/crystals.py).

The reference converts pymatgen ``Structure`` objects to (nxyz, pbc
reindex) arrays (:6-32); pymatgen is optional here (it is not installed in
the build environment, and the reference itself comments this module out
of data/__init__, nff/data/__init__.py:4).  A plain-dict path covers the
same data without the dependency.
"""

import numpy as np


def structure_to_nxyz(structure):
    """pymatgen Structure -> [Z | x y z] (gated import)."""
    try:
        from pymatgen.core import Structure  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "pymatgen is not installed; use dict_to_nxyz for plain "
            "lattice dicts") from e
    z = np.asarray([site.specie.Z for site in structure], dtype=np.float64)
    xyz = np.asarray([site.coords for site in structure])
    return np.concatenate([z[:, None], xyz], axis=1)


def dict_to_nxyz(d):
    """{'numbers': (N,), 'positions': (N, 3)} -> [Z | x y z]."""
    z = np.asarray(d["numbers"], dtype=np.float64)
    xyz = np.asarray(d["positions"], dtype=np.float64)
    return np.concatenate([z[:, None], xyz], axis=1)


def get_crystal_graph(nxyz, cell, cutoff):
    """Periodic neighbor graph of a crystal: (nbr_list, offsets)."""
    import jax.numpy as jnp
    from .. import topology
    xyz = jnp.asarray(np.asarray(nxyz)[:, 1:4])
    cap = topology.estimate_capacity(xyz, cutoff, np.asarray(cell))
    nbrs = topology.generate_nbr_list(xyz, cutoff, np.asarray(cell), cap)
    return nbrs
