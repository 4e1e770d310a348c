"""MD logging and trajectory export utilities.

Parity target: /root/reference/nff/md/utils.py (``NeuralMDLogger``:13-43,
``write_traj``:73-93) and the xyz dumps of the fitting drivers
(fit_rdf_gnn.py:30-35 ``save_traj``).  Self-contained .xyz I/O (no ASE).
"""

import os

import numpy as np

from .. import units
from ..thermo import kinetic_energy, temperature_kelvin

_Z_TO_SYMBOL = {1: "H", 2: "He", 6: "C", 7: "N", 8: "O", 14: "Si",
                18: "Ar", 29: "Cu", 32: "Ge"}


def write_xyz(filename, frames, numbers=None, comment="", append=False):
    """Write (F, N, 3) frames as a multi-frame .xyz file."""
    frames = np.asarray(frames)
    if frames.ndim == 2:
        frames = frames[None]
    n = frames.shape[1]
    if numbers is None:
        numbers = np.ones(n, dtype=int)
    symbols = [_Z_TO_SYMBOL.get(int(z), "X") for z in numbers]
    mode = "a" if append else "w"
    with open(filename, mode) as f:
        for frame in frames:
            f.write(f"{n}\n{comment}\n")
            for s, (x, y, z) in zip(symbols, frame):
                f.write(f"{s} {x:.8f} {y:.8f} {z:.8f}\n")


def read_xyz(filename):
    """Read a (multi-frame) .xyz file -> (frames (F,N,3), symbols)."""
    frames, symbols = [], None
    with open(filename) as f:
        lines = f.read().splitlines()
    i = 0
    while i < len(lines):
        n = int(lines[i].strip())
        block = lines[i + 2:i + 2 + n]
        symbols = [l.split()[0] for l in block]
        frames.append([[float(v) for v in l.split()[1:4]]
                       for l in block])
        i += 2 + n
    return np.asarray(frames), symbols


def save_traj(system, traj, fname, skip=10):
    """Dump every ``skip``-th frame (parity: fit_rdf_gnn.py:30-35)."""
    frames = np.asarray(traj)[::skip]
    write_xyz(fname, frames, numbers=system.get_atomic_numbers())


class NeuralMDLogger:
    """Per-step thermodynamic log (parity: nff/md/utils.py:13-43).

    Call with (state, potential_energy) each time you want a row; rows are
    kept in memory and optionally streamed to a file.
    """

    HEADER = ("Time[fs]", "Etot[eV]", "Epot[eV]", "Ekin[eV]", "T[K]")

    def __init__(self, system, logfile=None, header=True, verbose=False):
        self.system = system
        self.masses = np.asarray(system.get_masses())
        self.dim = system.dim
        self.rows = []
        self.logfile = logfile
        self.verbose = verbose
        if logfile and header:
            with open(logfile, "w") as f:
                f.write(" ".join(f"{h:>12s}" for h in self.HEADER) + "\n")

    def __call__(self, time_fs, velocities, potential_energy):
        ekin = float(kinetic_energy(np.asarray(velocities), self.masses))
        T = float(temperature_kelvin(np.asarray(velocities), self.masses,
                                     self.dim))
        epot = float(potential_energy)
        row = (time_fs, epot + ekin, epot, ekin, T)
        self.rows.append(row)
        if self.logfile:
            with open(self.logfile, "a") as f:
                f.write(" ".join(f"{v:12.4f}" for v in row) + "\n")
        if self.verbose:
            print(row)
        return row
