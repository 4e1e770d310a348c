"""Float64 numpy oracle for the NHC/NVE steppers (SURVEY.md hard part 4:
'numerical parity of NHC bath dynamics -- cross-check trajectories at
float64').  The oracle implements the reference EOM (md.py:210-240) and the
NH-verlet update (sovlers.py:110-127) in plain numpy float64."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mdgrad_tpu import units, potentials
from mdgrad_tpu.system import System
from mdgrad_tpu.interface import PairPotentials
from mdgrad_tpu.md import NoseHooverChain, NVE
from mdgrad_tpu.md.integrators import NVTState, NVEState


def lj_force_np(q, cell, cutoff, sig, eps):
    d = q[None, :, :] - q[:, None, :]
    f = d @ np.linalg.inv(cell)
    f -= (f > 0.5)
    f += (f < -0.5)
    d = f @ cell
    r2 = (d ** 2).sum(-1)
    np.fill_diagonal(r2, np.inf)
    within = r2 < cutoff ** 2
    r = np.sqrt(r2)
    dudr = np.where(within,
                    4 * eps * (-12 * sig ** 12 / r ** 13
                               + 6 * sig ** 6 / r ** 7), 0.0)
    return (dudr[:, :, None] * d / r[:, :, None]).sum(1)


def nhc_oracle(q0, v0, m, cell, cutoff, sig, eps, Q, kT, ndof, dt,
               n_steps):
    def derivs(v, q, pv):
        p = v * m
        ke = 0.5 * (p ** 2 / m).sum()
        f = lj_force_np(q, cell, cutoff, sig, eps)
        dvdt = (f - pv[0] * p / Q[0]) / m
        dpv0 = 2 * (ke - kT * ndof * 0.5) - pv[0] * pv[1] / Q[1]
        dmid = (pv[:-2] ** 2 / Q[:-2] - kT) - pv[2:] * pv[1:-1] / Q[2:]
        dlast = pv[-2] ** 2 / Q[-2] - kT
        return dvdt, np.concatenate([[dpv0], dmid, [dlast]])

    v, q, pv = v0.copy(), q0.copy(), np.zeros(len(Q))
    for _ in range(n_steps):
        a0, dpv0 = derivs(v, q, pv)
        vh, pvh = v + 0.5 * dt * a0, pv + 0.5 * dt * dpv0
        qn = q + vh * dt
        a1, dpv1 = derivs(vh, qn, pvh)
        v, pv, q = vh + 0.5 * dt * a1, pvh + 0.5 * dt * dpv1, qn
    return v, q, pv


@pytest.fixture(scope="module")
def oracle_setup():
    sys_ = System.from_lattice("fcc", 2, 1.679)
    sys_.set_temperature(1.0 / units.kB, rng=np.random.default_rng(21))
    return sys_


@pytest.mark.parametrize("force_cache", [True, False])
def test_nhc_matches_f64_oracle(oracle_setup, force_cache):
    sys_ = oracle_setup
    n = 32
    cutoff, sig, eps, dt, n_steps = 1.6, 0.95, 1.0, 0.004, 25
    pair = PairPotentials(sys_, potentials.LennardJones(sig, eps),
                          cutoff=cutoff, mode="dense")
    integ = NoseHooverChain(pair, sys_, T=1.0 / units.kB, num_chains=3,
                            Q=40.0, adjoint=False,
                            force_cache=force_cache)
    state = integ.initial_state()
    aux = integ.aux_init(state.q)
    ctrl = integ.default_ctrl()
    s = state
    for i in range(n_steps):
        s = integ.step(sim_params := pair.init_params(), s, aux, ctrl,
                       i * dt, dt)

    m = sys_.get_masses()[:, None].astype(np.float64)
    Q = np.array([40.0, 40.0 / n, 40.0 / n])
    v_o, q_o, pv_o = nhc_oracle(
        sys_.get_positions().astype(np.float64),
        sys_.get_velocities().astype(np.float64), m,
        sys_.get_cell().astype(np.float64), cutoff, sig, eps, Q, 1.0,
        3 * n, dt, n_steps)

    np.testing.assert_allclose(np.asarray(s.q), q_o, atol=5e-5)
    np.testing.assert_allclose(np.asarray(s.v), v_o, atol=5e-4)
    np.testing.assert_allclose(np.asarray(s.pv), pv_o, atol=5e-4)


def test_nve_matches_f64_oracle(oracle_setup):
    sys_ = oracle_setup
    cutoff, sig, eps, dt, n_steps = 1.6, 0.95, 1.0, 0.004, 25
    pair = PairPotentials(sys_, potentials.LennardJones(sig, eps),
                          cutoff=cutoff, mode="dense")
    integ = NVE(pair, sys_, adjoint=False)
    s = integ.initial_state()
    aux = integ.aux_init(s.q)
    for i in range(n_steps):
        s = integ.step(pair.init_params(), s, aux, {}, i * dt, dt)

    # NVE oracle = NHC with zero coupling: use huge Q and pv = 0
    m = sys_.get_masses()[:, None].astype(np.float64)
    Q = np.array([1e30, 1e30, 1e30])
    v_o, q_o, _ = nhc_oracle(
        sys_.get_positions().astype(np.float64),
        sys_.get_velocities().astype(np.float64), m,
        sys_.get_cell().astype(np.float64), cutoff, sig, eps, Q, 1.0,
        96, dt, n_steps)
    np.testing.assert_allclose(np.asarray(s.q), q_o, atol=5e-5)
    np.testing.assert_allclose(np.asarray(s.v), v_o, atol=5e-4)
