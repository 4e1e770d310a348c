"""Analytic potential zoo + learnable pair models: values and forces."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mdgrad_tpu import potentials as pot
from mdgrad_tpu.nn import PairMLP, TPairMLP, MLP


def finite_diff(f, x, eps=1e-4):
    return (f(x + eps) - f(x - eps)) / (2 * eps)


def test_lennard_jones_minimum():
    lj = pot.LennardJones(sigma=1.0, epsilon=1.0)
    p = lj.init_params()
    rmin = 2 ** (1 / 6)
    assert abs(float(lj(p, jnp.asarray(rmin))) + 1.0) < 1e-6
    # derivative vanishes at the minimum
    g = jax.grad(lambda r: lj(p, r))(jnp.asarray(rmin))
    assert abs(float(g)) < 1e-4


@pytest.mark.parametrize("cls,kw", [
    (pot.LennardJones, {}),
    (pot.LennardJones69, {}),
    (pot.LJFamily, dict(attr_pow=6, rep_pow=12)),
    (pot.ExcludedVolume, dict(power=10)),
    (pot.Buck, dict(A=2.0, B=1.5, C=0.5)),
    (pot.Yukawa, dict(epsilon=2.0, kappa=1.2)),
    (pot.Morse, dict(D=1.0, a=1.3, r0=1.1)),
])
def test_force_matches_finite_difference(cls, kw):
    m = cls(**kw)
    p = m.init_params()
    r0 = 1.3
    g = jax.grad(lambda r: m(p, r).sum())(jnp.asarray(r0))
    fd = finite_diff(lambda r: float(m(p, jnp.asarray(r)).sum()), r0)
    np.testing.assert_allclose(float(g), fd, rtol=2e-3, atol=5e-3)


def test_param_gradients_flow():
    lj = pot.LennardJones()
    p = lj.init_params()
    g = jax.grad(lambda pp: lj(pp, jnp.asarray(1.2)).sum())(p)
    assert abs(float(g["sigma"])) > 0
    assert abs(float(g["epsilon"])) > 0


def test_pair_tab_interpolation():
    tab = pot.PairTab(nbins=100, rc=2.0)
    p = {"tab": jnp.linspace(0.0, 1.0, 100)}  # u(r) = r/2 on [0,2]
    r = jnp.asarray([[0.5], [1.0]])
    np.testing.assert_allclose(np.asarray(tab(p, r)), [[0.25], [0.5]],
                               atol=1e-6)


def test_cubic_spline_matches_data():
    x = np.linspace(0.5, 3.0, 50)
    y = np.sin(x)
    sp = pot.CubicSpline(x, y)
    xq = jnp.asarray([0.7, 1.5, 2.9])
    np.testing.assert_allclose(np.asarray(sp({}, xq)), np.sin(np.asarray(xq)),
                               atol=1e-4)


def test_boltzmann_inversion():
    r = np.linspace(0.8, 3.0, 60)
    g = np.exp(-((r - 1.5) ** 2))  # fake rdf
    sp = pot.boltzmann_inversion_spline(r, g, kT=2.0)
    # u = kT log g -> at peak r=1.5, u ~ 0
    assert abs(float(sp({}, jnp.asarray(1.5)))) < 1e-2


def test_pair_mlp_shapes_and_grad():
    m = PairMLP(n_gauss=8, r_start=0.0, r_end=2.5, n_layers=1, n_width=16,
                nonlinear="SELU")
    p = m.init_params(jax.random.PRNGKey(0))
    r = jnp.linspace(0.5, 2.0, 7)[:, None]
    u = m(p, r)
    assert u.shape == (7, 1)
    g = jax.grad(lambda pp: m(pp, r).sum())(p)
    assert jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()), g, 0.0) > 0


def test_tpair_mlp_temperature_dependence():
    m = TPairMLP(n_gauss=8, r_start=0.0, r_end=2.5, n_layers=1, n_width=16)
    p = m.init_params(jax.random.PRNGKey(0))
    r = jnp.ones((3, 1))
    u1 = m(p, r, jnp.asarray(0.1))
    u2 = m(p, r, jnp.asarray(0.5))
    assert not np.allclose(np.asarray(u1), np.asarray(u2))


def test_mlp_excluded_volume_core():
    m = MLP(H=8, num_layers=1)
    p = m.init_params(jax.random.PRNGKey(0))
    small = float(m(p, jnp.asarray([[0.1]]))[0, 0])
    large = float(m(p, jnp.asarray([[2.0]]))[0, 0])
    assert small > 1e6  # (0.6/0.1)^12 dominates
    assert abs(large) < 1e3


def test_toy2d_and_leps_shapes():
    for m in (pot.Toy2d(), pot.LEPS()):
        u = m({}, jnp.asarray([[0.5, 0.5], [1.0, 1.0]]))
        assert u.shape == (2,)


def test_pairtab_cubic_interpolates_smooth_function():
    """Cubic PairTab nails a smooth function far better than linear and
    has continuous dU/dr across knots (reference used xitorch cubic
    Interp1D, potentials.py:152-160)."""
    from mdgrad_tpu.potentials import PairTab
    rc = 2.5
    tab_c = PairTab(nbins=64, rc=rc, kind="cubic")
    tab_l = PairTab(nbins=64, rc=rc, kind="linear")
    f = lambda r: np.sin(3 * r) * np.exp(-r)
    y = jnp.asarray(f(np.asarray(tab_c.x)))
    r = jnp.asarray(np.linspace(0.05, rc - 0.05, 400))
    err_c = np.abs(np.asarray(tab_c({"tab": y}, r)) - f(np.asarray(r))).max()
    err_l = np.abs(np.asarray(tab_l({"tab": y}, r)) - f(np.asarray(r))).max()
    assert err_c < err_l / 10
    assert err_c < 2e-4
    # force continuity at a knot: dU/dr from both sides agrees
    du = jax.vmap(jax.grad(lambda rr: tab_c({"tab": y}, rr[None])[0]))
    x_knot = float(tab_c.x[20])
    eps = 1e-4
    left, right = np.asarray(du(jnp.asarray([x_knot - eps, x_knot + eps])))
    assert abs(left - right) < 5e-3
    # gradients flow into the table
    g = jax.grad(lambda t: (tab_c({"tab": t}, r) ** 2).sum())(y)
    assert np.abs(np.asarray(g)).max() > 0
