"""Quantum isomerization: norm conservation, yield computation, field
gradients (downscaled retinal problem)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mdgrad_tpu.md.isomerization import Isomerization, quantum_yield
from mdgrad_tpu.md.adjoint import make_odeint
from mdgrad_tpu.train.isom import calc_yields, objective, DT


def make_toy(dim=8, seed=0):
    rng = np.random.default_rng(seed)
    h = rng.standard_normal((dim, dim))
    ham = (h + h.T) / 2
    m = rng.standard_normal((dim, dim))
    dipole = (m + m.T) / 2
    t_field = np.linspace(0.0, 5.0, 50)
    e_t = 0.3 * np.sin(t_field)
    return Isomerization(ham, dipole, t_field, e_t, max_e_t=5.0)


def run(ode_obj, params, n_steps, dt=0.01):
    def step_fn(p, s, aux, ctrl, i):
        return ode_obj.step(p, s, aux, ctrl, i * dt, dt)
    ode = make_odeint(step_fn, lambda s, a: a, n_steps, adjoint=True)
    return ode(params, ode_obj.initial_state(), (), {})[0]


def test_norm_conservation():
    ode_obj = make_toy()
    traj = run(ode_obj, ode_obj.init_params(), 400)
    norms = (traj.psi ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-3)


def test_matches_exact_propagator_field_free():
    """With E=0, psi(t) = exp(-i H t) psi(0); RK4 must track it."""
    dim = 6
    rng = np.random.default_rng(1)
    h = rng.standard_normal((dim, dim))
    ham = (h + h.T) / 2
    ode_obj = Isomerization(ham, np.zeros((dim, dim)),
                            np.linspace(0, 1, 10), np.zeros(10),
                            max_e_t=-1.0)  # field always off
    n, dt = 200, 0.01
    traj = run(ode_obj, ode_obj.init_params(), n, dt)
    # exact
    w, v = np.linalg.eigh(ham)
    psi0 = np.zeros(dim); psi0[0] = 1.0
    phase = np.exp(-1j * w * n * dt)
    psi_exact = v @ (phase * (v.T @ psi0))
    got = np.asarray(traj.psi[-1][:dim]) + 1j * np.asarray(traj.psi[-1][dim:])
    np.testing.assert_allclose(got, psi_exact, atol=1e-4)


def test_yield_gradients_flow_to_field():
    ode_obj = make_toy()
    params = ode_obj.init_params()
    prod = np.zeros((8, 8)); prod[3, 3] = 1.0
    reac = np.zeros((8, 8)); reac[0, 0] = 1.0

    def loss(p):
        traj = run(ode_obj, p, 200)
        ys = calc_yields(traj.psi, jnp.asarray(prod), jnp.asarray(reac))
        return objective(ys[3], look_back=100)

    g = jax.grad(loss)(params)["e_field"]
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


@pytest.mark.skipif(not os.path.isdir("/root/reference/data/isom"),
                    reason="retinal data not mounted")
def test_retinal_short_run():
    """Downscaled retinal problem (500 of 30479 steps): yields in [0, 1],
    norm conserved, field gradient finite."""
    from mdgrad_tpu.train.isom import fit_isomerization
    out = fit_isomerization(n_epochs=2, lr=1e-2, n_steps=500,
                            look_back=200, log=lambda *a: None)
    assert len(out["q_yields"]) == 2
    assert all(np.isfinite(v) for v in out["q_yields"])
    y4 = out["yields_t"][3]
    assert np.nanmax(y4) <= 1.0 + 1e-5 and np.nanmin(y4) >= -1e-5
