"""Device-mesh construction for multi-chip MD.

The reference has **no** distributed path at all (SURVEY.md section 2.4: no
torch.distributed / NCCL / MPI anywhere); multi-replica batching exists only
as comments (reference torchmd/interface.py:13-31).  This package adds the
TPU-native capability: a `jax.sharding.Mesh` over which replicas (data
parallel, 'dp') and atoms (spatial parallel, 'sp') are sharded, with XLA
collectives (all_gather / psum) riding ICI.
"""

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(axes, devices=None):
    """Mesh from an {axis_name: size} dict, e.g. {'dp': 2, 'sp': 4}.

    Sizes must multiply to the device count; pass -1 for one axis to infer.
    """
    devices = jax.devices() if devices is None else devices
    names = list(axes.keys())
    sizes = list(axes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total != len(devices):
        raise ValueError(f"mesh {dict(zip(names, sizes))} needs {total} "
                         f"devices, have {len(devices)}")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(names))
