"""Fitting losses for observable matching.

Parity target: ``JS_rdf`` (/root/reference/scripts/fit_rdf_gnn.py:37-44),
the density-weighted shell MSE ``compute_D`` (fit_rdf_gnn.py:412-414), and
the plain weighted MSEs of fit_rdf_pair.py:507-510.
"""

import jax.numpy as jnp
import numpy as np


def JS_rdf(g_obs, g, eps=1e-4):
    """epsilon-regularized Jensen-Shannon divergence between RDFs
    (reference fit_rdf_gnn.py:37-44)."""
    g_m = 0.5 * (g_obs + g)
    loss = (-(g_obs + eps) * (jnp.log(g_m + eps)
                              - jnp.log(g_obs + eps))).mean()
    loss += (-(g + eps) * (jnp.log(g_m + eps) - jnp.log(g + eps))).mean()
    return loss


def compute_D(dev, rho, rrange):
    """Density-weighted shell-integrated squared deviation
    (reference fit_rdf_gnn.py:412-414): integral of
    4 pi rho r^2 (g - g_obs)^2 dr."""
    dr = rrange[2] - rrange[1]
    return (4 * np.pi * rho * rrange ** 2 * dev ** 2 * dr).sum()


def mse_loss(a, b):
    return ((a - b) ** 2).mean()
