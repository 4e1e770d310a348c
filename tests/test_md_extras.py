"""Langevin thermostat, TI driver, xyz IO, logger, extra GNN models,
pressure observable."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mdgrad_tpu import units, potentials, topology, thermo
from mdgrad_tpu.system import System
from mdgrad_tpu.interface import PairPotentials
from mdgrad_tpu.md import Langevin, NoseHooverChain, Simulation
from mdgrad_tpu.md.utils import write_xyz, read_xyz, NeuralMDLogger
from mdgrad_tpu.nn import SchNet
from mdgrad_tpu.nn.models import (GraphAttention, HybridGraphConv,
                                  GraphConvIntegration)


@pytest.fixture(scope="module")
def sys108():
    sys = System.from_lattice("fcc", 3, 1.679)
    sys.set_temperature(0.8 / units.kB, rng=np.random.default_rng(11))
    return sys


def test_langevin_controls_temperature(sys108):
    target = 1.1  # energy units
    pair = PairPotentials(sys108, potentials.LennardJones(), cutoff=2.4)
    integ = Langevin(pair, sys108, T=target / units.kB, friction=5.0,
                     adjoint=False, seed=3)
    sim = Simulation(sys108, integ)
    traj = None
    for _ in range(5):
        traj = sim.simulate(steps=120, dt=0.005, frequency=120)
    temps = [float(thermo.temperature(traj.v[i], sys108.get_masses()))
             for i in range(60, 119, 10)]
    assert abs(np.mean(temps) - target) / target < 0.15, temps


def test_langevin_noise_advances_between_epochs(sys108):
    pair = PairPotentials(sys108, potentials.LennardJones(), cutoff=2.4)
    integ = Langevin(pair, sys108, T=1.0 / units.kB, friction=0.1,
                     adjoint=False, seed=3)
    sim = Simulation(sys108, integ)
    t1 = sim.simulate(steps=10, dt=0.005, frequency=10)
    v_end1 = np.asarray(t1.v[-1])
    t2 = sim.simulate(steps=10, dt=0.005, frequency=10)
    # different noise sequence in epoch 2 (noise_step0 advanced)
    dv1 = np.asarray(t1.v[1] - t1.v[0])
    dv2 = np.asarray(t2.v[1] - t2.v[0])
    assert not np.allclose(dv1, dv2)


def test_langevin_gradients_flow(sys108):
    """Adjoint through the stochastic (noise-as-data) trajectory."""
    pair = PairPotentials(sys108, potentials.LennardJones(sigma=0.95),
                          cutoff=2.4)
    integ = Langevin(pair, sys108, T=1.0 / units.kB, friction=0.1,
                     adjoint=True, seed=5)
    sim = Simulation(sys108, integ)
    ode = sim.epoch_fn(0.005, 8)
    state, aux = sim.initial_state()
    ctrl = integ.default_ctrl()

    def loss(p):
        traj, _ = ode(p, state, aux, ctrl)
        return (traj.q[-1] ** 2).sum()

    g = jax.grad(loss)(sim.params)
    assert np.isfinite(float(g["sigma"])) and abs(float(g["sigma"])) > 0


def test_xyz_roundtrip(tmp_path):
    frames = np.random.default_rng(0).uniform(0, 5, (3, 7, 3))
    numbers = np.array([1, 1, 8, 8, 14, 18, 6])
    fn = os.path.join(str(tmp_path), "t.xyz")
    write_xyz(fn, frames, numbers=numbers, comment="test")
    back, symbols = read_xyz(fn)
    np.testing.assert_allclose(back, frames, atol=1e-7)
    assert symbols[2] == "O" and symbols[4] == "Si"


def test_md_logger(tmp_path, sys108):
    fn = os.path.join(str(tmp_path), "thermo.log")
    logger = NeuralMDLogger(sys108, logfile=fn)
    row = logger(0.5, sys108.get_velocities(), -100.0)
    assert len(logger.rows) == 1
    assert abs(row[1] - (row[2] + row[3])) < 1e-9  # Etot = Epot + Ekin
    assert os.path.exists(fn)


def test_graph_attention_shapes(sys108):
    n = 16
    xyz = jnp.asarray(sys108.get_positions()[:n])
    nbrs = topology.generate_nbr_list(xyz, 2.0, sys108.get_cell(), 256)
    mod = GraphAttention(n_atom_basis=8)
    r = jnp.ones((n, 8))
    params = mod.init(jax.random.PRNGKey(0), r, nbrs.idx, nbrs.mask, n)
    out = mod.apply(params, r, nbrs.idx, nbrs.mask, n)
    assert out.shape == (n, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_hybrid_graph_conv(sys108):
    n = 32
    xyz = jnp.asarray(sys108.get_positions()[:n])
    cell = sys108.get_cell()
    sys_nbrs = topology.generate_nbr_list(xyz, 2.4, cell, 512)
    # "molecular" graph: chain bonds
    mol_idx = jnp.asarray(np.stack([np.arange(n - 1),
                                    np.arange(1, n)], -1), dtype=jnp.int32)
    mol_mask = jnp.ones(n - 1, dtype=bool)
    model = HybridGraphConv({
        "n_atom_basis": 16, "n_filters": 16, "n_gaussians": 8,
        "mol_n_convolutions": 1, "mol_cutoff": 3.0,
        "sys_n_convolutions": 1, "sys_cutoff": 2.4, "use_v_ex": True})
    z = jnp.ones(n, dtype=jnp.int32)
    p = model.init_params(z)
    off = sys_nbrs.offsets @ jnp.asarray(cell)
    u = model.energy(p, z, xyz, sys_nbrs.idx, off, sys_nbrs.mask,
                     mol_idx, mol_mask)
    assert np.isfinite(float(u))
    f = -jax.grad(model.energy, argnums=2)(p, z, xyz, sys_nbrs.idx, off,
                                           sys_nbrs.mask, mol_idx,
                                           mol_mask)
    assert np.isfinite(np.asarray(f)).all()


def test_graphconv_integration_aggr_weights(sys108):
    """aggr_wgt scales messages: all-zero weights -> embedding-only
    energy differs from all-ones."""
    n = 16
    xyz = jnp.asarray(sys108.get_positions()[:n])
    nbrs = topology.generate_nbr_list(xyz, 2.4, sys108.get_cell(), 256)
    gnn = GraphConvIntegration({"n_atom_basis": 16, "n_filters": 16,
                                "n_gaussians": 8, "n_convolutions": 2,
                                "cutoff": 2.4})
    z = jnp.ones(n, dtype=jnp.int32)
    p = gnn.init_params(z)
    off = nbrs.offsets @ jnp.asarray(sys108.get_cell())
    u1 = gnn.energy(p, z, xyz, nbrs.idx, off, nbrs.mask,
                    aggr_wgt=jnp.ones(n))
    u0 = gnn.energy(p, z, xyz, nbrs.idx, off, nbrs.mask,
                    aggr_wgt=jnp.zeros(n))
    assert abs(float(u1) - float(u0)) > 1e-6


def test_ti_driver(sys108):
    from mdgrad_tpu.md.ti import TI
    n = sys108.get_number_of_atoms()
    gnn = GraphConvIntegration({"n_atom_basis": 16, "n_filters": 16,
                                "n_gaussians": 8, "n_convolutions": 1,
                                "cutoff": 2.4})
    init_aggr = np.ones(n)
    final_aggr = np.ones(n)
    final_aggr[-1] = 0.0  # switch the last atom off
    ti = TI(sys108, gnn, init_aggr, final_aggr, T_init=120.0,
            dt=0.005, cutoff=2.4, steps=20, nbr_list_update_freq=5)
    out = ti.run(log=lambda *a: None)
    assert out["du_dlambda"].shape == (4,)
    assert np.isfinite(out["delta_f"])
    assert len(out["thermo"]) == 4


def test_pressure_ideal_gas():
    """Virial-free system: P = N kT / V."""
    rng = np.random.default_rng(0)
    sys_ = System(rng.uniform(0, 10, (64, 3)), np.diag([10.0] * 3))
    sys_.set_temperature(1.0 / units.kB, rng=rng)

    class Zero(PairPotentials):
        def energy(self, params, xyz, aux, cell=None):
            return 0.0 * xyz.sum()

    inter = Zero(sys_, potentials.LennardJones(), cutoff=2.0)
    P = thermo.pressure(inter, {}, jnp.asarray(sys_.get_positions()), (),
                        jnp.asarray(sys_.get_velocities()),
                        sys_.get_masses(), sys_.get_cell())
    n_kT_over_V = (2 * float(thermo.kinetic_energy(
        jnp.asarray(sys_.get_velocities()), sys_.get_masses()))) / (3 * 1000.0)
    np.testing.assert_allclose(float(P), n_kT_over_V, rtol=1e-5)


def test_profiling_helpers(tmp_path):
    """SURVEY §5 tracing subsystem: trace context writes a profile dir;
    Throughput and time_fn behave."""
    import jax.numpy as jnp
    from mdgrad_tpu import profiling

    @jax.jit
    def f(x):
        return (x ** 2).sum()

    x = jnp.arange(128.0)
    with profiling.trace(str(tmp_path), host_only=True):
        jax.block_until_ready(f(x))
    assert any(tmp_path.rglob("*")), "trace wrote nothing"

    tp = profiling.Throughput(unit="steps")
    r = tp.update(10)
    assert r > 0 and tp.total == 10 and "steps/s" in str(tp)

    dt = profiling.time_fn(f, x, iters=3, warmup=1)
    assert dt > 0


def test_pressure_matches_pair_virial():
    """Strain-derivative virial == the analytic pair-sum virial
    W = sum_pairs (-du/dr) r for LJ."""
    rng = np.random.default_rng(2)
    sys_ = System.from_lattice("fcc", 2, 1.72)
    sys_.set_temperature(1.0 / units.kB, rng=rng)
    lj = potentials.LennardJones(1.0, 1.0)
    inter = PairPotentials(sys_, lj, cutoff=2.4, mode="dense")
    xyz = jnp.asarray(sys_.get_positions()
                      + 0.03 * rng.standard_normal((32, 3)))
    v = jnp.asarray(sys_.get_velocities())
    cell = sys_.get_cell()
    P = thermo.pressure(inter, lj.init_params(), xyz, (), v,
                        sys_.get_masses(), cell)

    from mdgrad_tpu import topology
    dist, valid = topology.distance_matrix(xyz, cell)
    n = dist.shape[0]
    mask = np.asarray(valid & jnp.triu(jnp.ones((n, n), bool), k=1)
                      & (dist < 2.4))
    r = np.asarray(dist)[mask]
    w = (4.0 * (12 * r ** -12 - 6 * r ** -6)).sum()
    V = float(np.abs(np.linalg.det(np.asarray(cell))))
    ke = float(thermo.kinetic_energy(v, sys_.get_masses()))
    np.testing.assert_allclose(float(P), (2 * ke + w) / (3 * V), rtol=1e-4)


def test_pressure_differentiable_through_trajectory():
    """The pressure head must backprop through the MD trajectory into
    potential parameters (the fit_rdf_pair pressure target)."""
    rng = np.random.default_rng(0)
    sys_ = System.from_lattice("fcc", 2, 1.72)
    sys_.set_temperature(1.0 / units.kB, rng=rng)
    lj = potentials.LennardJones(0.9, 1.0)
    inter = PairPotentials(sys_, lj, cutoff=2.4, mode="dense")
    integ = NoseHooverChain(inter, sys_, T=1.0 / units.kB, num_chains=3,
                            Q=50.0, adjoint=True)
    sim = Simulation(sys_, integ)
    ode = sim.epoch_fn(dt=0.005, frequency=5)
    state, aux = sim.initial_state()
    ctrl = integ.default_ctrl()
    masses = sys_.get_masses()
    cell = sys_.get_cell()

    def loss(params):
        traj, _ = ode(params, state, aux, ctrl)
        P = jax.vmap(lambda q, v: thermo.pressure(
            inter, params, q, (), v, masses, cell))(traj.q[2:], traj.v[2:])
        return (P.mean() - 1.5) ** 2

    g = jax.grad(loss)(sim.params)
    vals = [abs(float(g[k])) for k in g]
    assert all(np.isfinite(v) for v in vals)
    assert sum(vals) > 0


def test_pressure_table_mode_needs_fresh_aux():
    """mode='table' virial parity with dense REQUIRES a per-frame
    aux_update: the fit drivers evaluate the per-frame pressure on
    trajectory frames far from the epoch-entry topology build, and a
    stale (N, K) table drops migrated pairs from the strain derivative
    (regression for the round-3 fix in fit_rdf_pair.frame_pressure)."""
    rng = np.random.default_rng(7)
    sys_ = System.from_lattice("fcc", 2, 1.72)
    sys_.set_temperature(1.0 / units.kB, rng=rng)
    lj = potentials.LennardJones(1.0, 1.0)
    dense = PairPotentials(sys_, lj, cutoff=2.0, mode="dense")
    table = PairPotentials(sys_, lj, cutoff=2.0, mode="table")
    q0 = jnp.asarray(sys_.get_positions())
    aux0 = table.aux_init(q0)
    # a frame far from the build point: large coherent displacements
    q1 = jnp.asarray(np.asarray(q0)
                     + 0.25 * rng.standard_normal(q0.shape))
    v = jnp.asarray(sys_.get_velocities())
    cell = sys_.get_cell()
    m = sys_.get_masses()
    p = lj.init_params()

    P_dense = float(thermo.pressure(dense, p, q1, (), v, m, cell))
    P_fresh = float(thermo.pressure(table, p, q1,
                                    table.aux_update(q1, aux0), v, m,
                                    cell))
    P_stale = float(thermo.pressure(table, p, q1, aux0, v, m, cell))
    np.testing.assert_allclose(P_fresh, P_dense, rtol=1e-4)
    # the stale-table virial is measurably wrong on this frame --
    # the property that made the fix necessary
    assert abs(P_stale - P_dense) > 1e-3 * max(1.0, abs(P_dense))


def test_rethermalize_rescues_state():
    """md.rethermalize: fresh MB momenta at the target kT, zeroed bath
    momenta and force-validity flag, positions untouched -- the
    NaN-recovery rescue for STATE-driven blowups where a deterministic
    replay of the restored snapshot reproduces the same NaN
    (r4 tpair-multistate run, epoch 185)."""
    import numpy as np
    import jax.numpy as jnp
    import mdgrad_tpu as mt
    from mdgrad_tpu import units
    from mdgrad_tpu.md import rethermalize

    system = mt.System.from_lattice("fcc", 3, 1.679)  # 108 atoms
    system.set_temperature(1.0 / units.kB, rng=np.random.default_rng(0))
    pair = mt.PairPotentials(
        system, mt.potentials.ExcludedVolume(sigma=0.9, epsilon=1.0,
                                             power=12), cutoff=2.5)
    integ = mt.NoseHooverChain(pair, system, T=1.0 / units.kB, Q=50.0,
                               num_chains=5)
    state, _ = mt.Simulation(system, integ).initial_state()
    # poison the momenta the way a blowup does: huge KE + hot bath
    hot = state._replace(v=state.v * 1e6,
                         pv=jnp.full_like(state.pv, 1e6))

    kT = 1.2
    new = rethermalize(hot, kT, system.get_masses(),
                       rng=np.random.default_rng(3))
    assert bool(jnp.isfinite(new.v).all())
    assert np.allclose(np.asarray(new.q), np.asarray(hot.q))  # q kept
    assert float(jnp.abs(new.pv).max()) == 0.0                # bath reset
    if hasattr(new, "fv"):
        assert float(new.fv) == 0.0                           # force stale
    # kinetic temperature ~ kT (108 atoms -> ~14% 1/sqrt(N) noise)
    m = np.asarray(system.get_masses())[:, None]
    ke = 0.5 * float(jnp.sum(m * np.asarray(new.v) ** 2))
    kT_kin = 2 * ke / (3 * len(m))
    assert abs(kT_kin - kT) / kT < 0.3
    # draws differ call to call (no deterministic-replay trap)
    new2 = rethermalize(hot, kT, system.get_masses(),
                        rng=np.random.default_rng(4))
    assert not np.allclose(np.asarray(new.v), np.asarray(new2.v))
