"""Sparse-tensor converters (parity: /root/reference/nff/data/sparse.py).

The reference converts dense torch tensors to ``torch.sparse`` COO
(:6-32); the JAX analog is ``jax.experimental.sparse.BCOO``.
"""

import numpy as np
import jax.numpy as jnp
from jax.experimental import sparse as jsparse


def sparsify_array(arr, threshold=0.0):
    """Dense array -> BCOO, dropping |x| <= threshold entries."""
    arr = jnp.asarray(arr)
    if threshold > 0:
        arr = jnp.where(jnp.abs(arr) > threshold, arr, 0.0)
    return jsparse.BCOO.fromdense(arr)


def densify(sp):
    return sp.todense()


def sparsify_tensor(tensor, threshold=0.0):
    """Alias with the reference's name (sparse.py:6)."""
    return sparsify_array(tensor, threshold)
