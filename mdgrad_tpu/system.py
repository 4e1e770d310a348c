"""System container: host-side mutable state + device-side pytrees.

Parity target: ``torchmd.system.System`` (/root/reference/torchmd/system.py:16-70),
an ``ase.Atoms`` subclass carrying device/dim/props and providing
Maxwell-Boltzmann initialization.  The TPU-native design splits this into

  * :class:`System` -- a small host-side object (numpy arrays) mirroring the
    ASE surface the reference actually uses: positions, velocities, masses,
    atomic numbers, a 3x3 cell, ``dim`` (2-D sims zero the third velocity
    column, reference system.py:67-69), ``set_temperature`` (MB distribution,
    reference system.py:64-66), ``get_nxyz``/``get_batch`` (system.py:39-62);

  * pure JAX pytrees produced by :meth:`System.state` that flow through
    jitted integrators.

No ASE dependency: Maxwell-Boltzmann sampling and position wrapping
(``ase.geometry.wrap_positions`` used at reference md.py:66) are implemented
here.  ``System.from_ase`` is provided for interop when ASE is installed.
"""

import numpy as np

from . import units

# minimal symbol->Z / Z->mass tables for elements used by the reference
# workloads (H for LJ/coarse-grained, O for water O-O, Si/Ge, Ar)
SYMBOL_TO_Z = {"H": 1, "He": 2, "C": 6, "N": 7, "O": 8, "Ar": 18,
               "Si": 14, "Ge": 32, "Cu": 29}
Z_TO_MASS = {1: 1.008, 2: 4.002602, 6: 12.011, 7: 14.007, 8: 15.999,
             11: 22.98977, 14: 28.085, 17: 35.453, 18: 39.948,
             29: 63.546, 32: 72.63, 55: 132.90545}


def wrap_positions(positions, cell):
    """Wrap positions into the periodic cell (general triclinic).

    Equivalent of ``ase.geometry.wrap_positions`` as used at reference
    md.py:66 when restarting an epoch from the simulation log.
    """
    positions = np.asarray(positions, dtype=np.float64)
    cell = np.asarray(cell, dtype=np.float64)
    frac = positions @ np.linalg.inv(cell)
    return (frac % 1.0) @ cell


def maxwell_boltzmann_velocities(masses, temperature_ev, rng=None):
    """Sample velocities from the MB distribution at ``T`` (in energy units).

    Matches ``ase.md.velocitydistribution.MaxwellBoltzmannDistribution``:
    v_i ~ Normal(0, sqrt(T/m_i)) per component, in (Ang, eV, amu) units.
    """
    rng = np.random.default_rng() if rng is None else rng
    masses = np.asarray(masses, dtype=np.float64)
    sigma = np.sqrt(temperature_ev / masses)[:, None]
    return rng.standard_normal((len(masses), 3)) * sigma


class System:
    """Host-side simulation state (parity: torchmd/system.py:16-70).

    Positions/velocities are float64 numpy on the host; :meth:`state` yields
    the device pytree for integrators.  Temperature is entered in Kelvin via
    :meth:`set_temperature` exactly like the reference (which passes
    ``T * units.kB`` internally).
    """

    def __init__(self, positions, cell, numbers=None, masses=None,
                 velocities=None, dim=3, props=None, pbc=True):
        self.positions = np.array(positions, dtype=np.float64).reshape(-1, 3)
        n = len(self.positions)
        cell = np.asarray(cell, dtype=np.float64)
        self.cell = np.diag(cell) if cell.ndim == 1 else cell
        if numbers is None:
            numbers = np.ones(n, dtype=np.int32)
        self.numbers = np.asarray(numbers, dtype=np.int32)
        if masses is None:
            masses = np.array([Z_TO_MASS.get(int(z), 1.0)
                               for z in self.numbers])
        self.masses = np.asarray(masses, dtype=np.float64)
        self.velocities = (np.zeros((n, 3)) if velocities is None
                           else np.array(velocities, dtype=np.float64))
        self.dim = dim
        self.props = {} if props is None else props
        self.pbc = pbc

    # --- constructors -----------------------------------------------------
    @classmethod
    def from_lattice(cls, kind, size, latticeconstant, symbol="H", **kw):
        from . import lattice
        positions, cell = lattice.cubic_lattice(kind, size, latticeconstant)
        z = SYMBOL_TO_Z.get(symbol, 1)
        return cls(positions, cell,
                   numbers=np.full(len(positions), z, dtype=np.int32), **kw)

    @classmethod
    def from_ase(cls, atoms, dim=3, props=None):
        return cls(atoms.get_positions(), np.array(atoms.get_cell()),
                   numbers=atoms.get_atomic_numbers(),
                   masses=atoms.get_masses(),
                   velocities=atoms.get_velocities(), dim=dim, props=props)

    # --- reference-API surface ---------------------------------------------
    def get_number_of_atoms(self):
        return len(self.positions)

    def get_cell(self):
        return self.cell

    def get_cell_len(self):
        """Diagonal of the cell (reference system.py:53-54)."""
        return np.diag(self.cell)

    def get_volume(self):
        return float(abs(np.linalg.det(self.cell)))

    def get_masses(self):
        return self.masses

    def get_atomic_numbers(self):
        return self.numbers

    def get_positions(self, wrap=False):
        if wrap and self.pbc:
            return wrap_positions(self.positions, self.cell)
        return self.positions

    def set_positions(self, positions):
        self.positions = np.asarray(positions, dtype=np.float64).reshape(-1, 3)

    def get_velocities(self):
        return self.velocities

    def set_velocities(self, velocities):
        self.velocities = np.asarray(velocities, dtype=np.float64)

    def get_nxyz(self):
        """[Z | x y z] array (reference system.py:39-51)."""
        return np.concatenate(
            [self.numbers.reshape(-1, 1).astype(np.float64),
             self.positions], axis=1)

    def get_batch(self):
        """GNN input dict (reference system.py:56-62)."""
        return {"nxyz": self.get_nxyz(),
                "num_atoms": np.array([self.get_number_of_atoms()]),
                "energy": 0.0}

    def set_temperature(self, T_kelvin, rng=None):
        """Maxwell-Boltzmann init at T in Kelvin (reference system.py:64-70).

        2-D systems get their third velocity column zeroed, matching
        reference system.py:67-69.
        """
        self.velocities = maxwell_boltzmann_velocities(
            self.masses, T_kelvin * units.kB, rng=rng)
        if self.dim < 3:
            self.velocities[:, self.dim:] = 0.0

    def temperature(self):
        """Instantaneous kinetic temperature in Kelvin."""
        ke = 0.5 * (self.masses[:, None] * self.velocities ** 2).sum()
        n_dof = self.get_number_of_atoms() * self.dim
        return 2.0 * ke / (n_dof * units.kB)


def check_system(obj):
    """Type guard (parity: reference torchmd/system.py:11-14)."""
    if not isinstance(obj, System):
        raise TypeError("input should be a mdgrad_tpu.system.System")
