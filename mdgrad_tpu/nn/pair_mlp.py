"""Learnable pair potentials: pairMLP / TpairMLP / MLP / MLP2d (flax).

Parity target: /root/reference/torchmd/potentials.py:163-217 (pairMLP with a
*trainable* GaussianSmearing featurizer and optional residual connections;
TpairMLP as u = E(r) - T * S(r)) and :368-391 / :297-314 (MLP with an
excluded-volume core, MLP2d toy PES).  Implemented as flax.linen modules but
exposed through the same (init_params, __call__(params, x)) protocol as the
analytic zoo in :mod:`mdgrad_tpu.potentials`, so ``Stack``/fitting code treats
them uniformly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as fnn

from .layers import ACTIVATIONS, gaussian_smearing


class _TrainableSmearing(fnn.Module):
    """Gaussian smearing with learnable offsets/widths
    (reference layers.py:61-63 `trainable=True`)."""
    start: float
    stop: float
    n_gaussians: int

    @fnn.compact
    def __call__(self, r):
        init_off = np.linspace(self.start, self.stop, self.n_gaussians)
        width0 = init_off[1] - init_off[0]
        offsets = self.param(
            "offsets", lambda k: jnp.asarray(init_off, dtype=jnp.float32))
        widths = self.param(
            "widths",
            lambda k: jnp.full(self.n_gaussians, width0, dtype=jnp.float32))
        return gaussian_smearing(r, offsets, widths)


class _PairMLPModule(fnn.Module):
    n_gauss: int
    r_start: float
    r_end: float
    n_layers: int
    n_width: int
    nonlinear: str
    res: bool = False

    @fnn.compact
    def __call__(self, r):
        act = ACTIVATIONS[self.nonlinear]
        x = _TrainableSmearing(self.r_start, self.r_end, self.n_gauss)(r)
        widths = ([self.n_gauss, self.n_width]
                  + [self.n_width] * self.n_layers
                  + [self.n_gauss])
        for w in widths:
            y = act(fnn.Dense(w)(x))
            # residual connections when shapes match (reference
            # potentials.py:199-205)
            x = x + y if (self.res and y.shape[-1] == x.shape[-1]) else y
        return fnn.Dense(1)(x)


class _FlaxPotential:
    """Adapter: flax module -> (init_params, __call__) protocol."""

    def __init__(self, module, example):
        self._module = module
        self._example = example

    def init_params(self, key=None):
        key = jax.random.PRNGKey(0) if key is None else key
        return self._module.init(key, *self._example)["params"]

    def apply(self, params, *args):
        return self._module.apply({"params": params}, *args)


class PairMLP(_FlaxPotential):
    """u(r) MLP over a trainable Gaussian featurization
    (reference potentials.py:163-206)."""

    def __init__(self, n_gauss, r_start, r_end, n_layers, n_width,
                 nonlinear="SELU", res=False):
        module = _PairMLPModule(n_gauss, r_start, r_end, n_layers, n_width,
                                nonlinear, res)
        super().__init__(module, (jnp.ones((1, 1)),))

    def __call__(self, params, r):
        return self.apply(params, r)


class _TPairModule(fnn.Module):
    n_gauss: int
    r_start: float
    r_end: float
    n_layers: int
    n_width: int
    nonlinear: str
    res: bool = False

    @fnn.compact
    def __call__(self, r, T):
        mk = lambda: _PairMLPModule(self.n_gauss, self.r_start, self.r_end,
                                    self.n_layers, self.n_width,
                                    self.nonlinear, self.res)
        u = mk()(r)
        s = mk()(r)
        return u - T * s


class TPairMLP(_FlaxPotential):
    """Temperature-dependent u = E(r) - T S(r)
    (reference potentials.py:208-217)."""

    def __init__(self, n_gauss, r_start, r_end, n_layers, n_width,
                 nonlinear="SELU", res=False):
        module = _TPairModule(n_gauss, r_start, r_end, n_layers, n_width,
                              nonlinear, res)
        super().__init__(module, (jnp.ones((1, 1)), jnp.ones(())))

    def __call__(self, params, r, T):
        return self.apply(params, r, T)


class _MLPModule(fnn.Module):
    D_in: int = 1
    H: int = 128
    num_layers: int = 3
    act: str = "relu"
    excluded_vol: bool = True

    @fnn.compact
    def __call__(self, x):
        a = ACTIVATIONS[self.act]
        u_ex = (0.6 / x) ** 12 if self.excluded_vol else 0.0
        y = a(fnn.Dense(self.H)(x))
        for _ in range(self.num_layers):
            y = a(fnn.Dense(self.H)(y))
        return fnn.Dense(1)(y) + u_ex


class MLP(_FlaxPotential):
    """Pair MLP with a fixed (0.6/r)^12 excluded-volume core
    (reference potentials.py:368-391)."""

    def __init__(self, D_in=1, H=128, num_layers=3, act="relu",
                 excluded_vol=True):
        module = _MLPModule(D_in, H, num_layers, act, excluded_vol)
        super().__init__(module, (jnp.ones((1, D_in)),))

    def __call__(self, params, r):
        return self.apply(params, r)


class MLP2d(_FlaxPotential):
    """2-D toy PES MLP (reference potentials.py:297-314)."""

    def __init__(self, D_in=2, H=128, num_layers=3, act="relu"):
        module = _MLPModule(D_in, H, num_layers, act, excluded_vol=False)
        super().__init__(module, (jnp.ones((1, D_in)),))

    def __call__(self, params, xy):
        return self.apply(params, jnp.atleast_2d(xy)).squeeze(-1)
