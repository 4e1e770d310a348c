"""Physical units and constants (ASE-compatible, self-contained).

The reference (torchmd/mdgrad) uses `ase.units` throughout: energies in eV,
distances in Angstrom, masses in amu, temperature entered as ``T * units.kB``
(e.g. /root/reference/scripts/fit_rdf_gnn.py:80 ``system.set_temperature(T *
ase.units.kB)``).  ASE is not a dependency of this rebuild, so we define the
identical unit system here: the base units are

    length  = 1 Angstrom
    energy  = 1 eV
    mass    = 1 amu

which induces the time unit ``t0 = Angstrom * sqrt(amu / eV)`` ~ 10.18 fs.
Constants follow CODATA 2014, matching ASE's default ``ase.units`` values so
that numeric configs written against the reference (dt in fs, Q in these
units, T in Kelvin) carry over unchanged.
"""

import math

# CODATA 2014 (ASE default) fundamental constants, SI
_c = 299792458.0             # speed of light, m/s
_e = 1.6021766208e-19        # elementary charge, C
_amu = 1.66053904e-27        # atomic mass unit, kg
_k = 1.38064852e-23          # Boltzmann constant, J/K
_Nav = 6.022140857e23        # Avogadro number, 1/mol

# Derived, in the (Angstrom, eV, amu) unit system
Ang = Angstrom = 1.0
eV = 1.0
amu = 1.0

# 1 second in internal time units: t[internal] = t[s] / (A * sqrt(amu/eV))
second = 1e10 * math.sqrt(_e / _amu)
fs = 1e-15 * second          # ~0.09822694788464063
ps = 1e-12 * second

kB = _k / _e                 # Boltzmann constant in eV/K (~8.6173303e-5)

nm = 10.0
m = 1e10
C = 1.0 / _e                 # Coulomb in units of elementary charge
J = 1.0 / _e                 # Joule in eV
kJ = 1e3 * J
mol = _Nav
kcal = 4.184 * kJ

# energy conversions used by nff (see /root/reference/nff/utils/constants.py)
HARTREE_TO_EV = 27.211386024367243
EV_TO_KCAL_MOL = 23.060548012069496
AU_TO_KCAL = {"energy": 627.509, "_grad": 1.0 / 0.529177}
KCAL_TO_AU = {"energy": 1.0 / 627.509, "_grad": 0.529177}
BOHR_RADIUS = 0.529177

# g/cm^3 -> amu/Angstrom^3 (used for density -> lattice constant)
GCM3_TO_AMU_ANG3 = 1e-24 / (_amu * 1e3)  # = 0.6022140857...

# pressure: 1 atm in eV / Angstrom^3 (101325 Pa * 6.241509e-12
# eV A^-3 / Pa) -- converts the registry's `pressure` metadata (atm,
# reference scripts/data.py:774+) into the internal energy/length units
# for NPT targets
atm = 101325.0 * 6.241509074460763e-12
