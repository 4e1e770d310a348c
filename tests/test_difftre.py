"""DiffTRe reweighting engine (train/difftre.py).

The reference has no reweighting path; these tests pin the estimator
math (weights/ESS/gradients), the theta-dependent pressure channel,
compatibility with the GNN interaction contract, and the outer/inner
driver recovering a perturbed LJ epsilon.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from mdgrad_tpu import potentials, units
from mdgrad_tpu.system import System
from mdgrad_tpu.interface import GNNPotentials, PairPotentials
from mdgrad_tpu.md import NoseHooverChain, Simulation
from mdgrad_tpu.observables import rdf as rdf_obs
from mdgrad_tpu.train.difftre import (ReweightEstimator, difftre_fit,
                                      make_bundle, make_rdf_loss,
                                      sample_frames)

KT = 1.2
DT = 0.005


@pytest.fixture(scope="module")
def lj_setup():
    sys_ = System.from_lattice("fcc", 2, 1.679)  # 32 atoms
    sys_.set_temperature(KT / units.kB, rng=np.random.default_rng(7))
    pair = PairPotentials(
        sys_, potentials.LennardJones(sigma=1.0, epsilon=1.0),
        cutoff=1.6, mode="dense")
    integ = NoseHooverChain(pair, sys_, T=KT / units.kB, Q=50.0,
                            num_chains=3, adjoint=False)
    sim = Simulation(sys_, integ)
    frames = sample_frames(sim, n_frames=12, steps_between=10, dt=DT,
                           equil_steps=100)
    return sys_, pair, sim, frames


def test_weights_uniform_at_ref(lj_setup):
    _, pair, sim, frames = lj_setup
    est = ReweightEstimator(pair, frames, sim.params, kT=KT)
    w, ess = est.weights(sim.params)
    # u_ref comes from a separately-jitted program; f32 fusion roundoff
    # leaves ~1e-4-relative weight jitter at theta_ref
    np.testing.assert_allclose(np.asarray(w), 1.0 / frames.shape[0],
                               rtol=1e-3)
    assert float(ess) == pytest.approx(1.0, rel=1e-4)


def test_ess_decreases_away_from_ref(lj_setup):
    _, pair, sim, frames = lj_setup
    est = ReweightEstimator(pair, frames, sim.params, kT=KT)
    far = {"epsilon": sim.params["epsilon"] + 0.5,
           "sigma": sim.params["sigma"]}
    _, ess_far = est.weights(far)
    assert float(ess_far) < 0.9


def test_reweighted_gradient_matches_finite_difference(lj_setup):
    sys_, pair, sim, frames = lj_setup
    est = ReweightEstimator(pair, frames, sim.params, kT=KT)
    obs = rdf_obs(sys_, nbins=24, r_range=(0.75, 1.55))
    g_frames = jax.lax.map(lambda q: obs(q)[2], frames)
    target = jnp.asarray(np.asarray(g_frames).mean(0)) * 1.1
    loss_fn = lambda p: make_rdf_loss(est, g_frames, target)(p)[0]

    p0 = {k: jnp.asarray(v) for k, v in sim.params.items()}
    g_auto = jax.grad(loss_fn)(p0)["epsilon"]
    h = 1e-3
    lp = loss_fn({**p0, "epsilon": p0["epsilon"] + h})
    lm = loss_fn({**p0, "epsilon": p0["epsilon"] - h})
    g_fd = (lp - lm) / (2 * h)
    np.testing.assert_allclose(float(g_auto), float(g_fd), rtol=2e-2,
                               atol=1e-6)


def test_pressure_reweighting_consistent_and_differentiable(lj_setup):
    sys_, pair, sim, frames = lj_setup
    cell = sys_.get_cell()
    est = ReweightEstimator(pair, frames, sim.params, kT=KT, cell=cell)
    p_i = est.frame_pressures(sim.params)
    assert np.isfinite(np.asarray(p_i)).all()
    # at theta_ref the reweighted pressure is the plain frame mean
    w, _ = est.weights(sim.params)
    p_hat = float(jnp.dot(w, p_i))
    assert p_hat == pytest.approx(float(jnp.mean(p_i)), rel=1e-4)
    g = jax.grad(lambda p: jnp.dot(est.weights(p)[0],
                                   est.frame_pressures(p)))(sim.params)
    assert np.isfinite(float(g["epsilon"]))
    assert abs(float(g["epsilon"])) > 0


def test_bundle_with_gnn_interaction(lj_setup):
    """The flagship contract: vmapped SchNet energies over stacked
    frame auxes (fixed-capacity tables) through make_bundle."""
    from mdgrad_tpu.nn import SchNet
    sys_, _, sim, frames = lj_setup
    gnn = SchNet({"n_atom_basis": 8, "n_filters": 8, "n_gaussians": 8,
                  "n_convolutions": 2, "cutoff": 1.6})
    inter = GNNPotentials(sys_, gnn, cutoff=1.6, nbr_mode="table")
    params = inter.init_params()
    bundle = make_bundle(inter, frames, params)
    assert np.isfinite(np.asarray(bundle["u_ref"])).all()
    est = ReweightEstimator(inter, frames, params, kT=KT)
    w, ess = est.weights(params)
    assert float(ess) == pytest.approx(1.0, rel=1e-5)
    obs = rdf_obs(sys_, nbins=16, r_range=(0.75, 1.55))
    g_frames = jax.lax.map(lambda q: obs(q)[2], frames)
    loss_fn = make_rdf_loss(est, g_frames, jnp.ones(16))
    grads = jax.grad(lambda p: loss_fn(p)[0])(params)
    flat = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: jnp.abs(x).sum(), grads))
    assert np.isfinite([float(x) for x in flat]).all()
    assert sum(float(x) for x in flat) > 0


def test_difftre_fit_recovers_epsilon():
    """Frames sampled with the TRUTH potential (eps=1.0); target = their
    own mean RDF.  A fit started at eps=1.35 must move the well depth
    back toward the truth -- deterministic inner gradients, ESS-guarded
    resampling."""
    sys_ = System.from_lattice("fcc", 2, 1.679)
    sys_.set_temperature(KT / units.kB, rng=np.random.default_rng(3))
    truth = PairPotentials(
        sys_, potentials.LennardJones(sigma=1.0, epsilon=1.0),
        cutoff=1.6, mode="dense")
    integ = NoseHooverChain(truth, sys_, T=KT / units.kB, Q=50.0,
                            num_chains=3, adjoint=False)
    sim_t = Simulation(sys_, integ)
    obs = rdf_obs(sys_, nbins=24, r_range=(0.75, 1.55))
    # decorrelated sampling: 120 steps (0.6 LJ time) between frames --
    # closely-spaced frames make the finite-F reweighted landscape
    # degenerate (one jittered configuration, not an ensemble)
    frames_t = sample_frames(sim_t, n_frames=32, steps_between=120,
                             dt=DT, equil_steps=400)
    g_target = np.asarray(
        jax.lax.map(lambda q: obs(q)[2], frames_t)).mean(0)

    model = PairPotentials(
        sys_, potentials.LennardJones(sigma=1.0, epsilon=1.35),
        cutoff=1.6, mode="dense")
    sys2 = System.from_lattice("fcc", 2, 1.679)
    sys2.set_temperature(KT / units.kB, rng=np.random.default_rng(4))
    integ2 = NoseHooverChain(model, sys2, T=KT / units.kB, Q=50.0,
                             num_chains=3, adjoint=False)
    sim = Simulation(sys2, integ2)

    # freeze sigma: a single adam step on the r^-12 wall's sigma
    # collapses the ensemble overlap (ESS 1.0 -> 0.4), so the classic
    # DiffTRe demo shape fits the well depth alone
    opt = optax.multi_transform(
        {"train": optax.adam(2e-2), "freeze": optax.set_to_zero()},
        {"epsilon": "train", "sigma": "freeze"})
    bests = []
    params, history = difftre_fit(
        [sim], [obs], [g_target], kTs=[KT], cells=[sys2.get_cell()],
        opt=opt, dt=DT, n_outer=6, inner_steps=25,
        n_frames=32, steps_between=120, equil_steps=400,
        ess_min=0.7, log=lambda *a: None,
        on_best=lambda o, l, p: bests.append((o, l, p)))

    eps = float(params["epsilon"])
    assert abs(eps - 1.0) < 0.35 * 0.5, (eps, history)
    # the driver really took deterministic inner steps
    assert sum(h["inner"] for h in history) > 0
    # best-model selection: fired at outer 0, loss0 strictly improves
    # across callbacks, and the recorded params are ENTRY iterates
    # (outer 0's best is the eps=1.35 starting point, pre-update)
    assert bests and bests[0][0] == 0
    ls = [b[1] for b in bests]
    assert all(b < a for a, b in zip(ls, ls[1:]))
    assert float(bests[0][2]["epsilon"]) == pytest.approx(1.35)


def test_difftre_fit_survives_nan_sampling(monkeypatch):
    """r4 regression: a sampling trajectory that goes non-finite (outer 4
    of the r4 warm run) must trigger revert-to-last-good + step shrink +
    state rebuild -- not poison the params through a NaN ESS."""
    from mdgrad_tpu.train import difftre as dtre

    sys_ = System.from_lattice("fcc", 2, 1.679)
    sys_.set_temperature(KT / units.kB, rng=np.random.default_rng(5))
    pair = PairPotentials(
        sys_, potentials.LennardJones(sigma=1.0, epsilon=1.2),
        cutoff=1.6, mode="dense")
    integ = NoseHooverChain(pair, sys_, T=KT / units.kB, Q=50.0,
                            num_chains=3, adjoint=False)
    sim = Simulation(sys_, integ)
    obs = rdf_obs(sys_, nbins=24, r_range=(0.75, 1.55))
    frames0 = sample_frames(sim, n_frames=8, steps_between=20, dt=DT,
                            equil_steps=100)
    g_target = np.asarray(
        jax.lax.map(lambda q: obs(q)[2], frames0)).mean(0)

    real_sample = dtre.sample_frames
    calls = {"n": 0}

    def poisoned(sim_, *a, **kw):
        calls["n"] += 1
        frames = real_sample(sim_, *a, **kw)
        if calls["n"] == 2:  # second outer's sampling goes non-finite
            frames = frames.at[0, 0, 0].set(jnp.nan)
        return frames

    monkeypatch.setattr(dtre, "sample_frames", poisoned)
    logs = []
    opt = optax.adam(1e-2)
    params, history = dtre.difftre_fit(
        [sim], [obs], [g_target], kTs=[KT], cells=[sys_.get_cell()],
        opt=opt, dt=DT, n_outer=4, inner_steps=3,
        n_frames=8, steps_between=20, equil_steps=60,
        ess_min=0.5, log=logs.append)

    # params stayed finite through the poisoned outer
    flat = jax.tree_util.tree_leaves(params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in flat)
    # the revert path actually fired and was logged
    assert any("reverted params" in str(m) for m in logs)
    # and training continued after the revert (later outers in history)
    assert any(h["outer"] > 1 for h in history)


def test_difftre_fit_outer0_sampling_blowup_rethermalizes(monkeypatch):
    """r4 regression (warm5): a non-finite FIRST sampling -- before any
    good state exists -- must retry from a rethermalized lattice
    rebuild, not replay the system's fixed initial velocities
    deterministically until the step budget exhausts."""
    from mdgrad_tpu.train import difftre as dtre

    sys_ = System.from_lattice("fcc", 2, 1.679)
    sys_.set_temperature(KT / units.kB, rng=np.random.default_rng(5))
    pair = PairPotentials(
        sys_, potentials.LennardJones(sigma=1.0, epsilon=1.2),
        cutoff=1.6, mode="dense")
    integ = NoseHooverChain(pair, sys_, T=KT / units.kB, Q=50.0,
                            num_chains=3, adjoint=False)
    sim = Simulation(sys_, integ)
    obs = rdf_obs(sys_, nbins=24, r_range=(0.75, 1.55))
    frames0 = sample_frames(sim, n_frames=8, steps_between=20, dt=DT,
                            equil_steps=100)
    g_target = np.asarray(
        jax.lax.map(lambda q: obs(q)[2], frames0)).mean(0)
    sim.state = None   # fresh: no sampled state exists yet

    real_sample = dtre.sample_frames
    calls = {"n": 0}
    v_seen = []

    def poisoned(sim_, *a, **kw):
        calls["n"] += 1
        v_seen.append(np.asarray(sim_.state.v)
                      if sim_.state is not None else None)
        frames = real_sample(sim_, *a, **kw)
        if calls["n"] == 1:   # the VERY FIRST sampling goes non-finite
            frames = frames.at[0, 0, 0].set(jnp.nan)
        return frames

    monkeypatch.setattr(dtre, "sample_frames", poisoned)
    logs = []
    opt = optax.adam(1e-2)
    params, history = dtre.difftre_fit(
        [sim], [obs], [g_target], kTs=[KT], cells=[sys_.get_cell()],
        opt=opt, dt=DT, n_outer=3, inner_steps=3,
        n_frames=8, steps_between=20, equil_steps=60,
        ess_min=0.5, log=logs.append)

    assert any("reverted params" in str(m) for m in logs)
    assert len(history) >= 1        # training proceeded after the retry
    flat = jax.tree_util.tree_leaves(params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in flat)
    # the retry entered sampling with a REthermalized state (fresh MB
    # momenta), not a deterministic replay from sim.state=None
    assert v_seen[0] is None and v_seen[1] is not None
