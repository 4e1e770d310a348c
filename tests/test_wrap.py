"""In-scan periodic wrapping: long single-epoch scans must stay inside
single-image minimum-image validity (VERDICT r4 items 1a/8).

The round-4 failure mode: ``Simulation.simulate(steps=k, frequency=k)``
integrated k steps with positions wrapped only at epoch boundaries; every
minimum-image path takes offsets from ``(d > 0.5 L)`` tests (offsets in
{-1,0,1}, topology.py), so once unwrapped diffusion crossed ~1.5 L the
distances -- and forces -- went silently wrong, then NaN.  The reference
has the identical hazard (it wraps only between epochs, md.py:63-67);
the fix wraps in-scan at the topology-refresh cadence with a
``stop_gradient`` lattice shift (identity Jacobian, gradient-exact for
periodic interactions).
"""

import warnings

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mdgrad_tpu import units, potentials, topology
from mdgrad_tpu.system import System
from mdgrad_tpu.interface import PairPotentials
from mdgrad_tpu.md import NVE, NoseHooverChain, Simulation
from mdgrad_tpu.md.simulation import wrap_state_grad_safe


def _hot_lj_system(seed=3, T=4.0):
    """Small hot LJ gas: atoms cross the box within a few hundred steps."""
    sys = System.from_lattice("fcc", 2, 1.9)   # 32 atoms, L ~ 3.8
    sys.set_temperature(T / units.kB, rng=np.random.default_rng(seed))
    return sys


def _make_sim(sys, wrap=True, update_freq=1):
    pair = PairPotentials(sys, potentials.LennardJones(sigma=0.9,
                                                       epsilon=1.0),
                          cutoff=1.8, mode="dense")
    integ = NVE(pair, sys, adjoint=True, topology_update_freq=update_freq)
    return Simulation(sys, integ, wrap=wrap), pair


def test_long_single_epoch_stays_in_box_and_conserves_energy():
    """The regression the round-4 DiffTRe runs needed: one 3000-step
    single-epoch scan of a stable truth potential stays finite, stays
    wrapped, and conserves NVE energy -- before the fix, unwrapped drift
    crossed 1.5 L and minimum-image forces went silently wrong."""
    sys = _hot_lj_system()
    sim, pair = _make_sim(sys, wrap=True)
    L = float(np.diag(np.asarray(sys.get_cell()))[0])

    def total_energy(state, aux):
        ke = 0.5 * (np.asarray(sys.get_masses())[:, None]
                    * np.asarray(state.v) ** 2).sum()
        pe = float(pair.energy(sim.params, state.q, aux))
        return ke + pe

    state0, aux0 = sim.initial_state()
    e0 = total_energy(state0, aux0)

    traj = sim.simulate(steps=3000, dt=0.002, frequency=3000)
    q = np.asarray(traj.q)
    assert np.isfinite(q).all()
    # in-scan wrap keeps every frame within one step of the primary cell
    assert q.min() > -0.5 * L and q.max() < 1.5 * L
    e1 = total_energy(jax.tree_util.tree_map(lambda x: x[-1], traj),
                      sim.aux)
    assert abs(e1 - e0) / (abs(e0) + 1.0) < 0.05


def test_single_epoch_matches_chunked_epochs():
    """simulate(steps=k, frequency=k) == simulate(steps=k, frequency=k/m)
    -- the epoch structure must not change the physics.  Short window so
    fp noise cannot amplify chaotically."""
    # epoch semantics: ``frequency`` frames = frequency - 1 steps
    # (reference md.py:80-81), so 6 epochs x 40 steps == one 241-frame
    # epoch == 240 integration steps
    sys = _hot_lj_system(seed=5)
    sim_a, _ = _make_sim(sys, wrap=True)
    traj_a = sim_a.simulate(steps=241, dt=0.002, frequency=241)

    sys_b = _hot_lj_system(seed=5)
    sim_b, _ = _make_sim(sys_b, wrap=True)
    traj_b = None
    for _ in range(6):
        traj_b = sim_b.simulate(steps=41, dt=0.002, frequency=41)

    np.testing.assert_allclose(np.asarray(traj_a.q[-1]),
                               np.asarray(traj_b.q[-1]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(traj_a.v[-1]),
                               np.asarray(traj_b.v[-1]), atol=1e-5)


def test_wrap_is_gradient_safe_and_normalizes_displaced_entry():
    """Entry states displaced by whole lattice vectors must produce the
    identical trajectory AND identical parameter gradients (the wrap
    shift rides stop_gradient; interactions are lattice-periodic)."""
    sys = _hot_lj_system(seed=11)
    L = np.diag(np.asarray(sys.get_cell()))

    def run(shift_boxes):
        sim, _ = _make_sim(sys, wrap=True)
        state, aux = sim.initial_state()
        rng = np.random.default_rng(2)
        shifts = rng.integers(-3, 4, size=np.asarray(state.q).shape) \
            * shift_boxes
        q = jnp.asarray(np.asarray(state.q) + shifts * L)
        state = state._replace(q=q)
        ode = sim.epoch_fn(0.002, 60)

        def loss(p):
            traj, _ = ode(p, state, aux, {})
            return (traj.q[-1] ** 2).sum()

        traj, _ = ode(sim.params, state, aux, {})
        g = jax.grad(loss)(sim.params)
        return np.asarray(traj.q[-1]), g

    q_ref, g_ref = run(0)
    q_disp, g_disp = run(1)
    np.testing.assert_allclose(q_disp, q_ref, atol=1e-5)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_disp[k]),
                                   np.asarray(g_ref[k]), rtol=1e-4,
                                   atol=1e-8)


def test_wrap_cadence_matches_update_freq():
    """update_freq > 1: wrap fires with the refresh (same predicate), so
    frozen offsets always correspond to the wrapped representative.  The
    run must still stay near the box and conserve energy."""
    sys = _hot_lj_system(seed=13)
    sim, pair = _make_sim(sys, wrap=True, update_freq=5)
    L = float(np.diag(np.asarray(sys.get_cell()))[0])
    traj = sim.simulate(steps=1500, dt=0.002, frequency=1500)
    q = np.asarray(traj.q)
    assert np.isfinite(q).all()
    # at most update_freq steps of motion outside the cell
    assert q.min() > -0.6 * L and q.max() < 1.6 * L


def test_wrap_state_grad_safe_npt_reads_state_cell():
    from mdgrad_tpu.md.integrators import NPTStateF
    q = jnp.asarray([[2.5, -0.5, 0.1]])
    st = NPTStateF(v=jnp.zeros((1, 3)), q=q, pv=jnp.zeros(3),
                   cell=jnp.asarray([2.0, 2.0, 2.0]),
                   f=jnp.zeros((1, 3)), fv=jnp.ones(()))
    w = wrap_state_grad_safe(st)
    np.testing.assert_allclose(np.asarray(w.q), [[0.5, 1.5, 0.1]],
                               atol=1e-6)


def test_image_drift_flag_and_aux_channel():
    """Drift guard (VERDICT r4 item 8): neighbor builds from positions
    outside single-image validity raise ``drift``; surfaced through the
    same aux channel as capacity overflow."""
    sys = _hot_lj_system()
    cell = np.asarray(sys.get_cell())
    L = np.diag(cell)
    q_ok = jnp.asarray(sys.get_positions())
    q_bad = q_ok.at[0].add(jnp.asarray(2.0 * L))

    assert not bool(topology.image_drift(q_ok, cell))
    assert bool(topology.image_drift(q_bad, cell))

    nbrs_ok = topology.generate_neighbor_table(q_ok, 1.8, cell, k_max=16)
    nbrs_bad = topology.generate_neighbor_table(q_bad, 1.8, cell, k_max=16)
    assert not bool(nbrs_ok.drift)
    assert bool(nbrs_bad.drift)
    assert not topology.aux_drift(nbrs_ok)
    assert topology.aux_drift(nbrs_bad)
    assert topology.aux_drift({"nn": nbrs_bad, "pair": ()})

    lst = topology.generate_nbr_list_topk(q_bad, 1.8, cell, k_max=16)
    assert bool(lst.drift)


def test_simulation_warns_on_drift_without_wrap():
    """wrap=False + a table-building interaction: the drift flag must
    surface as a warning at the epoch boundary (the one-line diagnosis
    the round-4 silent failure needed)."""
    sys = _hot_lj_system(seed=17, T=6.0)
    pair = PairPotentials(sys, potentials.LennardJones(sigma=0.9,
                                                       epsilon=1.0),
                          cutoff=1.8, mode="table", capacity_slack=3.0)
    integ = NVE(pair, sys, adjoint=True)
    sim = Simulation(sys, integ, wrap=False)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        # hot gas, long unwrapped epoch: atoms leave the box quickly
        sim.simulate(steps=2500, dt=0.002, frequency=2500)
    msgs = [str(w.message) for w in rec]
    assert any("minimum-image validity" in m for m in msgs), msgs
