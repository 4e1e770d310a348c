"""Gradient/Jacobian/Hessian utilities for force-field analysis.

Parity target: /root/reference/nff/nn/tensorgrad.py -- ``compute_jacobian``
(:10-38), ``compute_grad`` (:41-58), ``compute_hess`` (:61-76) and
``get_schnet_hessians`` (:79-96).  In JAX these are thin wrappers over
``jax.jacrev``/``jax.hessian``; provided so downstream analysis code has
the same vocabulary.
"""

import jax
import jax.numpy as jnp


def compute_grad(fn, inputs):
    """dL/dinputs for a scalar-valued fn (reference tensorgrad.py:41-58)."""
    return jax.grad(fn)(inputs)


def compute_jacobian(fn, inputs):
    """Jacobian of fn at inputs (reference tensorgrad.py:10-38)."""
    return jax.jacrev(fn)(inputs)


def compute_hess(fn, inputs):
    """Hessian of a scalar fn (reference tensorgrad.py:61-76)."""
    return jax.hessian(fn)(inputs)


def get_schnet_hessians(gnn, params, z, xyz, idx, offsets_real, mask,
                        **kw):
    """Hessian of the SchNet energy wrt positions, (N, 3, N, 3)
    (parity: reference tensorgrad.py:79-96)."""
    def e(x):
        return gnn.energy(params, z, x, idx, offsets_real, mask, **kw)
    h = jax.hessian(e)(xyz)
    return h


def vibrational_frequencies(hessian, masses):
    """Harmonic frequencies from a mass-weighted Hessian (new utility:
    the natural consumer of get_schnet_hessians)."""
    n = hessian.shape[0]
    h = hessian.reshape(3 * n, 3 * n)
    m = jnp.repeat(jnp.asarray(masses), 3)
    mw = h / jnp.sqrt(m[:, None] * m[None, :])
    evals = jnp.linalg.eigvalsh(mw)
    return jnp.sign(evals) * jnp.sqrt(jnp.abs(evals))
