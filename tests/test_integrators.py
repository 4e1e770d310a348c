"""Integrator physics: NVE energy conservation, NHC thermostat, parity of
dense vs sparse pair evaluation, epoch-chunked simulate() driver."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mdgrad_tpu import units, potentials
from mdgrad_tpu.system import System
from mdgrad_tpu.interface import PairPotentials, Stack
from mdgrad_tpu.md import NVE, NoseHooverChain, Simulation
from mdgrad_tpu import thermo


@pytest.fixture(scope="module")
def lj_system():
    sys = System.from_lattice("fcc", 3, 1.679)  # 108 atoms, README quickstart
    sys.set_temperature(1.0 / units.kB, rng=np.random.default_rng(42))
    return sys


def make_pair(sys, mode):
    return PairPotentials(
        sys, potentials.LennardJones(sigma=1.0, epsilon=1.0),
        cutoff=2.5, mode=mode)


def test_dense_sparse_energy_parity(lj_system):
    xyz = jnp.asarray(lj_system.get_positions())
    dense = make_pair(lj_system, "dense")
    sparse = make_pair(lj_system, "sparse")
    pd = dense.init_params()
    ud = dense.energy(pd, xyz, dense.aux_init(xyz))
    us = sparse.energy(pd, xyz, sparse.aux_init(xyz))
    np.testing.assert_allclose(float(ud), float(us), rtol=1e-5)


@pytest.mark.parametrize("mode", ["dense", "sparse"])
def test_nve_energy_conservation(lj_system, mode):
    pair = make_pair(lj_system, mode)
    integ = NVE(pair, lj_system, adjoint=False)
    sim = Simulation(lj_system, integ, wrap=True)
    dt = 0.005
    traj = sim.simulate(steps=200, dt=dt, frequency=200)

    params = sim.params
    aux_of = lambda q: pair.aux_update(q, pair.aux_init(q))
    masses = jnp.asarray(lj_system.get_masses())[:, None]

    def total_energy(v, q):
        ke = 0.5 * (masses * v ** 2).sum()
        return float(ke + pair.energy(params, q, aux_of(q)))

    e0 = total_energy(traj.v[0], traj.q[0])
    e1 = total_energy(traj.v[-1], traj.q[-1])
    assert abs(e1 - e0) / abs(e0) < 5e-3, (e0, e1)


def test_nhc_controls_temperature(lj_system):
    target_T_ev = 1.2  # in energy units
    pair = make_pair(lj_system, "dense")
    integ = NoseHooverChain(pair, lj_system, T=target_T_ev / units.kB,
                            num_chains=5, Q=50.0, adjoint=False)
    sim = Simulation(lj_system, integ)
    traj = None
    for _ in range(6):
        traj = sim.simulate(steps=100, dt=0.005, frequency=100)
    temps = [float(thermo.temperature(traj.v[i],
                                      lj_system.get_masses(), dim=3))
             for i in range(0, 100, 10)]
    mean_T = np.mean(temps[3:])
    assert abs(mean_T - target_T_ev) / target_T_ev < 0.2, temps


def test_nhc_mtk_masses_control_temperature(lj_system):
    # tau option: canonical MTK chain masses Q0=N_dof*kT*tau^2,
    # Qk=kT*tau^2 -- N-invariant link thermal scales (the reference's
    # Q/N links cascade-diverge in large-N transients; see
    # NoseHooverChain docstring)
    target_T_ev = 1.2
    pair = make_pair(lj_system, "dense")
    tau = 50 * 0.005
    integ = NoseHooverChain(pair, lj_system, T=target_T_ev / units.kB,
                            num_chains=5, tau=tau, adjoint=False)
    n_dof = lj_system.get_number_of_atoms() * 3
    q = np.asarray(integ.Q)
    assert q[0] == pytest.approx(n_dof * target_T_ev * tau ** 2, rel=1e-5)
    assert q[1] == pytest.approx(target_T_ev * tau ** 2, rel=1e-5)
    assert np.all(q[1:] == q[1])
    sim = Simulation(lj_system, integ)
    traj = None
    for _ in range(6):
        traj = sim.simulate(steps=100, dt=0.005, frequency=100)
    temps = [float(thermo.temperature(traj.v[i],
                                      lj_system.get_masses(), dim=3))
             for i in range(0, 100, 10)]
    mean_T = np.mean(temps[3:])
    assert abs(mean_T - target_T_ev) / target_T_ev < 0.2, temps


def test_simulate_epochs_and_log(lj_system):
    pair = make_pair(lj_system, "dense")
    integ = NVE(pair, lj_system, adjoint=True)
    sim = Simulation(lj_system, integ)
    traj = sim.simulate(steps=40, dt=0.005, frequency=10)
    # 4 epochs logged, each frame count = frequency (9 steps + initial)
    assert len(sim.log["positions"]) == 4
    assert traj.q.shape[0] == 10
    # positions stay wrapped inside the box after restart
    q = sim.get_check_point().q
    cell_diag = np.diag(lj_system.get_cell())
    assert np.all(np.asarray(q) >= -1e-5)
    assert np.all(np.asarray(q) <= cell_diag + 1e-5)


def test_stack_sums_energies(lj_system):
    xyz = jnp.asarray(lj_system.get_positions())
    a = make_pair(lj_system, "dense")
    b = PairPotentials(lj_system, potentials.ExcludedVolume(
        sigma=0.9, epsilon=0.05, power=12), cutoff=2.5, mode="dense")
    stack = Stack({"lj": a, "prior": b})
    p = stack.init_params()
    aux = stack.aux_init(xyz)
    u = stack.energy(p, xyz, aux)
    ua = a.energy(p["lj"], xyz, aux["lj"])
    ub = b.energy(p["prior"], xyz, aux["prior"])
    np.testing.assert_allclose(float(u), float(ua) + float(ub), rtol=1e-6)


def test_rk4_on_harmonic_oscillator():
    """RK4 integrates x'' = -x: period 2*pi, amplitude preserved."""
    from mdgrad_tpu.md.integrators import rk4_step
    from mdgrad_tpu.md.integrators import NVEState

    def derivs(s, t):
        return NVEState(v=-s.q, q=s.v)

    dt = 0.05
    state = NVEState(v=jnp.zeros(1), q=jnp.ones(1))
    n = int(round(2 * np.pi / dt))
    for i in range(n):
        state = rk4_step(derivs, state, i * dt, dt)
    assert abs(float(state.q[0]) - np.cos(n * dt)) < 1e-4


def test_gnn_topology_update_freq_near_exact(lj_system):
    """Stale neighbor tables at slack capacity act as a free Verlet skin.

    With capacity_slack the (N, K) table holds beyond-cutoff neighbors
    (distance-masked at evaluation), so rebuilding every 2-4 steps must
    reproduce the every-step trajectory to float tolerance over a short
    window (the amortization bench_step_budget.py measures the speed of).
    """
    from mdgrad_tpu.interface import GNNPotentials
    from mdgrad_tpu.nn import SchNet

    gnn = SchNet({"n_atom_basis": 16, "n_filters": 16, "n_gaussians": 8,
                  "n_convolutions": 2, "cutoff": 2.4})

    def run(freq):
        # fresh System per run: simulate() advances the system state
        sys_ = System.from_lattice("fcc", 3, 1.679)
        sys_.set_temperature(1.0 / units.kB, rng=np.random.default_rng(42))
        pot = GNNPotentials(sys_, gnn, cutoff=2.4, capacity_slack=1.5)
        integ = NoseHooverChain(pot, sys_, T=1.0 / units.kB,
                                Q=50.0, num_chains=3, adjoint=True,
                                topology_update_freq=freq)
        sim = Simulation(sys_, integ)
        traj = sim.simulate(steps=8, dt=0.005, frequency=8)
        return np.asarray(traj.q[-1])

    q1 = run(1)
    q2 = run(2)
    q4 = run(4)
    np.testing.assert_allclose(q2, q1, atol=5e-5)
    np.testing.assert_allclose(q4, q1, atol=5e-5)


class TestMTS:
    """Multiple-time-stepping (r-RESPA) Nose-Hoover chain."""

    def _build(self, n_inner, dt_scale=1.0):
        from mdgrad_tpu.md import MTSNoseHooverChain
        sys_ = System.from_lattice("fcc", 3, 1.679)
        sys_.set_temperature(1.0 / units.kB, rng=np.random.default_rng(3))
        stack = Stack({
            "lj": PairPotentials(sys_, potentials.LennardJones(1.0, 1.0),
                                 cutoff=2.5, mode="dense"),
            "pair": PairPotentials(sys_, potentials.ExcludedVolume(
                sigma=0.9, epsilon=0.05, power=12), cutoff=2.5,
                mode="dense"),
        })
        integ = MTSNoseHooverChain(stack, sys_, T=1.0 / units.kB,
                                   fast_keys=("pair",), n_inner=n_inner,
                                   Q=50.0, num_chains=3)
        return sys_, stack, integ

    def test_converges_to_single_rate(self):
        """At the same outer dt the k=2 RESPA trajectory tracks the
        single-rate NHC trajectory with an O(dt^2)-splitting deviation
        that shrinks as dt does."""
        from mdgrad_tpu.md import Simulation

        def final_q(n_inner, dt, steps, single_rate=False):
            sys_, stack, integ = self._build(n_inner)
            if single_rate:
                integ = NoseHooverChain(stack, sys_, T=1.0 / units.kB,
                                        Q=50.0, num_chains=3)
            sim = Simulation(sys_, integ)
            traj = sim.simulate(steps=steps, dt=dt, frequency=steps)
            return np.asarray(traj.q[-1])

        err_big = np.abs(final_q(2, 0.004, 16)
                         - final_q(1, 0.004, 16, single_rate=True)).max()
        err_small = np.abs(final_q(2, 0.001, 16)
                           - final_q(1, 0.001, 16, single_rate=True)).max()
        # both sit at the f32 noise floor for this stack (the splitting
        # error is below roundoff): assert closeness, not ordering
        assert err_big < 5e-4, err_big
        assert err_small < 5e-4, (err_big, err_small)

    def test_temperature_control(self):
        from mdgrad_tpu.md import Simulation
        sys_, stack, integ = self._build(4)
        sim = Simulation(sys_, integ)
        for _ in range(6):  # equilibrate (same protocol as the NHC test)
            traj = sim.simulate(steps=100, dt=0.005, frequency=10)
        temps = [float(thermo.temperature(traj.v[i],
                                          sys_.get_masses(), dim=3))
                 for i in range(traj.v.shape[0])]
        mean_T = np.mean(temps[3:])
        assert abs(mean_T - 1.0) < 0.25, temps

    def test_adjoint_gradients_flow(self):
        import jax
        from mdgrad_tpu.md import Simulation
        from mdgrad_tpu import observables

        sys_, stack, integ = self._build(2)
        sim = Simulation(sys_, integ)
        obs = observables.rdf(sys_, nbins=50, r_range=(0.75, 2.5))
        ode = sim.epoch_fn(dt=0.005, frequency=10)
        state, aux = sim.initial_state()

        def loss(p):
            traj, _ = ode(p, state, aux, integ.default_ctrl())
            return ((obs(traj.q[::2])[2] - 1.0) ** 2).mean()

        g = jax.grad(loss)(sim.params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # gradients reach BOTH the slow and the fast model's params
        assert float(np.abs(np.asarray(g["lj"]["epsilon"]))) > 0
        assert float(np.abs(np.asarray(g["pair"]["epsilon"]))) > 0
