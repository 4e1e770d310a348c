"""Shared NN layers: Gaussian smearing and activations.

Parity target: /root/reference/nff/nn/layers.py (GaussianSmearing, Dense) and
nff/nn/activations.py (shifted_softplus).  GaussianSmearing triple-duties in
the reference as (a) the SchNet edge featurizer, (b) the pairMLP distance
featurizer, and (c) the *soft histogram* behind the differentiable RDF /
angle observables (observable.py:50-56) -- same here.
"""

import jax
import jax.numpy as jnp
import numpy as np


def shifted_softplus(x):
    """softplus(x) - log(2) (reference nff/nn/activations.py:5-11)."""
    return jax.nn.softplus(x) - jnp.log(2.0)


ACTIVATIONS = {
    "ReLU": jax.nn.relu,
    "ELU": jax.nn.elu,
    "Tanh": jnp.tanh,
    "LeakyReLU": jax.nn.leaky_relu,
    "ReLU6": jax.nn.relu6,
    "SELU": jax.nn.selu,
    "CELU": jax.nn.celu,
    "Tanhshrink": lambda x: x - jnp.tanh(x),
    "shifted_softplus": shifted_softplus,
    "relu": jax.nn.relu,
}


def gaussian_smearing(distances, offsets, widths, centered=False):
    """Expand distances on a Gaussian basis (reference layers.py:14-31).

    distances: (..., 1); offsets/widths: (G,).  Returns (..., G).
    """
    if not centered:
        coeff = -0.5 / widths ** 2
        diff = distances - offsets
    else:
        coeff = -0.5 / offsets ** 2
        diff = distances
    return jnp.exp(coeff * diff ** 2)


class GaussianSmearing:
    """Non-trainable Gaussian basis (reference layers.py:34-83).

    For the trainable variant (pairMLP featurizer, SchNet with
    trainable_gauss) the offsets/widths live in the model's params pytree;
    this class covers the frozen uses (observables, default SchNet).
    """

    def __init__(self, start, stop, n_gaussians, width=None, centered=False):
        offsets = np.linspace(start, stop, n_gaussians)
        if width is None:
            widths = np.full(n_gaussians, offsets[1] - offsets[0])
        else:
            widths = np.full(n_gaussians, width)
        self.offsets = jnp.asarray(offsets, dtype=jnp.float32)
        self.widths = jnp.asarray(widths, dtype=jnp.float32)
        self.centered = centered

    def __call__(self, distances):
        return gaussian_smearing(distances, self.offsets, self.widths,
                                 centered=self.centered)
