"""Adjoint-gradient correctness: the core promise of the framework.

Validates the custom-vjp trajectory-replay odeint
(mdgrad_tpu/md/adjoint.py) against (1) direct scan backprop and (2) finite
differences -- the JAX analog of checking the reference's
OdeintAdjointMethod (sovlers.py:196-293) against autograd, which the
reference never did (SURVEY.md section 4).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mdgrad_tpu import units, potentials
from mdgrad_tpu.system import System
from mdgrad_tpu.interface import PairPotentials
from mdgrad_tpu.md import NVE, NoseHooverChain, Simulation
from mdgrad_tpu.md.adjoint import make_odeint
from mdgrad_tpu.md.integrators import NVEState
from mdgrad_tpu.observables import rdf


def test_harmonic_adjoint_matches_direct_and_fd():
    """1-D harmonic oscillator (reference Harmonic1D, potentials.py:34):
    d loss / d k through 10 verlet steps."""
    dt = 0.1
    n_steps = 10

    def step_fn(params, state, aux, ctrl, i):
        k = params["k"]
        a0 = -k * state.q
        v_half = state.v + 0.5 * dt * a0
        q_new = state.q + v_half * dt
        a1 = -k * q_new
        v_new = v_half + 0.5 * dt * a1
        return NVEState(v=v_new, q=q_new)

    aux_update = lambda s, a: a
    y0 = NVEState(v=jnp.zeros(1), q=jnp.ones(1))

    def loss(params, ode):
        traj, _ = ode(params, y0, (), {})
        return (traj.q ** 2).sum()

    ode_adj = make_odeint(step_fn, aux_update, n_steps, adjoint=True)
    ode_dir = make_odeint(step_fn, aux_update, n_steps, adjoint=False)

    p = {"k": jnp.asarray(1.3)}
    g_adj = jax.grad(loss)(p, ode_adj)["k"]
    g_dir = jax.grad(loss)(p, ode_dir)["k"]
    np.testing.assert_allclose(float(g_adj), float(g_dir), rtol=1e-5)

    eps = 1e-3
    fd = (loss({"k": jnp.asarray(1.3 + eps)}, ode_dir)
          - loss({"k": jnp.asarray(1.3 - eps)}, ode_dir)) / (2 * eps)
    np.testing.assert_allclose(float(g_adj), float(fd), rtol=1e-2)


@pytest.fixture(scope="module")
def small_lj():
    sys = System.from_lattice("fcc", 2, 1.679)  # 32 atoms
    sys.set_temperature(1.0 / units.kB, rng=np.random.default_rng(7))
    return sys


def _epoch_loss_fn(sys, adjoint, mode="dense", nhc=False, n_frames=12):
    pair = PairPotentials(sys, potentials.LennardJones(sigma=0.9,
                                                       epsilon=1.0),
                          cutoff=2.5, mode=mode)
    if nhc:
        integ = NoseHooverChain(pair, sys, T=1.0 / units.kB, num_chains=3,
                                Q=30.0, adjoint=adjoint)
    else:
        integ = NVE(pair, sys, adjoint=adjoint)
    sim = Simulation(sys, integ)
    ode = sim.epoch_fn(dt=0.005, frequency=n_frames)
    state, aux = sim.initial_state()
    obs = rdf(sys, nbins=32, r_range=(0.5, 2.4))
    ctrl = integ.default_ctrl()

    def loss(params):
        traj, _ = ode(params, state, aux, ctrl)
        _, _, g = obs(traj.q[::4])
        return (g ** 2).mean()

    return loss, sim.params


@pytest.mark.parametrize("mode", ["dense", "sparse"])
def test_lj_rdf_gradients_adjoint_vs_direct(small_lj, mode):
    """d (RDF loss) / d (sigma, epsilon) through an MD epoch: adjoint ==
    direct backprop.  This is the end-to-end differentiation path of
    fit_rdf (reference fit_rdf_gnn.py:382-457)."""
    loss_adj, params = _epoch_loss_fn(small_lj, adjoint=True, mode=mode)
    loss_dir, _ = _epoch_loss_fn(small_lj, adjoint=False, mode=mode)
    g_adj = jax.grad(loss_adj)(params)
    g_dir = jax.grad(loss_dir)(params)
    for k in g_adj:
        np.testing.assert_allclose(np.asarray(g_adj[k]),
                                   np.asarray(g_dir[k]),
                                   rtol=5e-3, atol=1e-8)
        assert np.abs(np.asarray(g_adj[k])).max() > 0


def test_nhc_bath_gradients(small_lj):
    """Gradients flow through Nose-Hoover bath variables (the reference's
    NHC-adjoint headline config, BASELINE.md row 4)."""
    loss_adj, params = _epoch_loss_fn(small_lj, adjoint=True, nhc=True)
    loss_dir, _ = _epoch_loss_fn(small_lj, adjoint=False, nhc=True)
    g_adj = jax.grad(loss_adj)(params)
    g_dir = jax.grad(loss_dir)(params)
    for k in g_adj:
        np.testing.assert_allclose(np.asarray(g_adj[k]),
                                   np.asarray(g_dir[k]),
                                   rtol=5e-3, atol=1e-8)


def test_grad_wrt_initial_state(small_lj):
    loss, params = _epoch_loss_fn(small_lj, adjoint=True)
    # also check state0 cotangent: wrap loss over state0
    pair = PairPotentials(small_lj, potentials.LennardJones(), cutoff=2.5,
                          mode="dense")
    integ = NVE(pair, small_lj, adjoint=True)
    sim = Simulation(small_lj, integ)
    ode = sim.epoch_fn(dt=0.005, frequency=8)
    state, aux = sim.initial_state()

    def loss_q0(q0):
        traj, _ = ode(sim.params, state._replace(q=q0), aux, {})
        return (traj.q[-1] ** 2).sum()

    g = jax.grad(loss_q0)(state.q)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_reverse_time_adjoint_matches_replay(small_lj):
    """True O(1)-memory adjoint: reverse-time reconstruction gradients
    match the stored-frame replay for a final-state loss (the reference's
    OdeintAdjointMethod strategy, sovlers.py:253-286)."""
    def build(adjoint):
        pair = PairPotentials(small_lj, potentials.LennardJones(0.95, 1.0),
                              cutoff=1.6, mode="dense")
        integ = NVE(pair, small_lj, adjoint=adjoint)
        sim = Simulation(small_lj, integ)
        return sim, integ

    sim_rev, integ_rev = build("reverse")
    sim_rep, integ_rep = build(True)
    state, aux = sim_rep.initial_state()
    ode_rev = sim_rev.epoch_fn(dt=0.002, frequency=30)
    ode_rep = sim_rep.epoch_fn(dt=0.002, frequency=30)

    def loss(ode):
        def f(p):
            traj, _ = ode(p, state, aux, {})
            last = jax.tree_util.tree_map(lambda x: x[-1], traj)
            return (last.q ** 2).sum() + (last.v ** 2).sum()
        return f

    # forward trajectories agree
    t_rev, _ = ode_rev(sim_rev.params, state, aux, {})
    t_rep, _ = ode_rep(sim_rep.params, state, aux, {})
    np.testing.assert_allclose(np.asarray(t_rev.q[-1]),
                               np.asarray(t_rep.q[-1]), atol=1e-6)

    g_rev = jax.grad(loss(ode_rev))(sim_rev.params)
    g_rep = jax.grad(loss(ode_rep))(sim_rep.params)
    for k in g_rep:
        np.testing.assert_allclose(np.asarray(g_rev[k]),
                                   np.asarray(g_rep[k]), rtol=2e-3,
                                   atol=1e-6)


def test_tinydiffeq_arbitrary_grid():
    """Generic odeint on a NON-uniform grid (reference tinydiffeq.py:56-86):
    analytic accuracy + gradients through the solve."""
    from mdgrad_tpu.md.tinydiffeq import odeint

    # dy/dt = -a y on a geometric grid
    t = jnp.asarray(np.geomspace(1e-3, 2.0, 24) - 1e-3)
    a = 1.3

    def func(tt, y):
        return -a * y

    y = odeint(func, jnp.asarray(1.0), t, method="rk4", substeps=4)
    np.testing.assert_allclose(np.asarray(y), np.exp(-a * np.asarray(t)),
                               rtol=1e-5)
    # euler converges too, just worse
    # euler converges at first order: error ~ halves when substeps double
    ye8 = odeint(func, jnp.asarray(1.0), t, method="euler", substeps=8)
    ye16 = odeint(func, jnp.asarray(1.0), t, method="euler", substeps=16)
    exact = np.exp(-a * 2.0)
    e8 = abs(float(ye8[-1]) - exact)
    e16 = abs(float(ye16[-1]) - exact)
    assert 0.35 < e16 / e8 < 0.65

    # gradient wrt a parameter of func, through the whole solve
    def loss(aa):
        yy = odeint(lambda tt, y: -aa * y, jnp.asarray(1.0), t,
                    substeps=4)
        return yy[-1]

    g = jax.grad(loss)(a)
    # d/da exp(-a T) = -T exp(-a T); g differentiates the DISCRETE
    # solve, so it carries the solver's own O(h^4) truncation
    np.testing.assert_allclose(float(g), -2.0 * np.exp(-a * 2.0),
                               rtol=2e-3)

    # pytree state: harmonic oscillator dict
    def ho(tt, s):
        return {"q": s["p"], "p": -s["q"]}

    t2 = jnp.asarray([0.0, 0.3, 0.9, 1.0, 2.2])
    s = odeint(ho, {"q": jnp.asarray(1.0), "p": jnp.asarray(0.0)}, t2,
               substeps=16)
    np.testing.assert_allclose(np.asarray(s["q"]),
                               np.cos(np.asarray(t2)), atol=1e-5)


def _epoch_loss_unroll(sys, adjoint, unroll, n_frames=12):
    pair = PairPotentials(sys, potentials.LennardJones(sigma=0.9,
                                                       epsilon=1.0),
                          cutoff=2.5)
    integ = NoseHooverChain(pair, sys, T=1.0 / units.kB, num_chains=3,
                            Q=30.0, adjoint=adjoint, unroll=unroll)
    sim = Simulation(sys, integ)
    ode = sim.epoch_fn(dt=0.005, frequency=n_frames)
    state, aux = sim.initial_state()
    obs = rdf(sys, nbins=32, r_range=(0.5, 2.4))
    ctrl = integ.default_ctrl()

    def loss(params):
        traj, _ = ode(params, state, aux, ctrl)
        _, _, g = obs(traj.q[::4])
        return (g ** 2).mean()

    return loss, sim.params


@pytest.mark.parametrize("adjoint", [True, False])
def test_scan_unroll_is_semantics_preserving(small_lj, adjoint):
    """lax.scan unroll (the N<~1k fusion-count-bound headline lever,
    bench_headline_r5.py 'unroll*') must not change the epoch: same ops
    in the same order, so loss AND gradients match unroll=1 bitwise-ish.
    Covers the non-divisible case too (11 steps, unroll 4)."""
    loss1, params = _epoch_loss_unroll(small_lj, adjoint, unroll=1)
    loss4, _ = _epoch_loss_unroll(small_lj, adjoint, unroll=4)
    l1, g1 = jax.value_and_grad(loss1)(params)
    l4, g4 = jax.value_and_grad(loss4)(params)
    np.testing.assert_allclose(float(l1), float(l4), rtol=1e-6)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g4[k]),
                                   rtol=1e-5, atol=1e-10)
        assert np.abs(np.asarray(g1[k])).max() > 0
