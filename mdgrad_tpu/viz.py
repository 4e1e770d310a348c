"""Trajectory visualization helpers (parity: /root/reference/utils.py).

The reference wraps nglview + mdtraj (:20-35); both are optional here --
functions degrade to xyz-file export (view any .xyz in standard tools).
"""

import numpy as np

from .md.utils import write_xyz


def xyz_to_nglview(frames, numbers=None):
    """Return an nglview widget for (F, N, 3) frames (requires nglview +
    mdtraj, parity with reference utils.py:20-35); raises ImportError with
    a pointer to the xyz fallback otherwise."""
    try:
        import tempfile
        import mdtraj
        import nglview
    except ImportError as e:
        raise ImportError(
            "nglview/mdtraj not installed; use export_xyz() and open the "
            "file in a viewer instead") from e
    with tempfile.NamedTemporaryFile(suffix=".xyz", delete=False) as f:
        write_xyz(f.name, frames, numbers=numbers)
        traj = mdtraj.load_xyz(f.name, top=None)
    return nglview.show_mdtraj(traj)


def export_xyz(filename, frames, numbers=None):
    """Always-available fallback: dump frames to a multi-frame .xyz."""
    write_xyz(filename, np.asarray(frames), numbers=numbers)
    return filename
