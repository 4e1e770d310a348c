"""Ewald electrostatics: Madelung oracles, alpha invariance, forces.

Oracle values are literature Madelung constants -- independent of any
implementation.  The reference has no Ewald (its Electrostatics is a
truncated Coulomb sum, /root/reference/torchmd/interface.py:303-361);
this capability is beyond-parity.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mdgrad_tpu import System, EwaldElectrostatics
from mdgrad_tpu.ops import ewald

M_NACL = 1.747564594633  # per ion pair, r0 = a/2
M_CSCL = 1.762674773071  # per ion pair, r0 = a*sqrt(3)/2


def nacl_system(a=5.64):
    frac_na = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                        [0, 0.5, 0.5]])
    frac_cl = frac_na + np.array([0.5, 0.5, 0.5])
    frac = np.concatenate([frac_na, frac_cl]) % 1.0
    q = np.array([1.0] * 4 + [-1.0] * 4)
    sys_ = System(frac * a, cell=np.eye(3) * a,
                  numbers=[11] * 4 + [17] * 4)
    return sys_, q


def test_madelung_nacl():
    a = 5.64
    sys_, q = nacl_system(a)
    inter = EwaldElectrostatics(sys_, q)
    u = float(inter.energy({}, jnp.asarray(sys_.get_positions()), ()))
    # 4 ion pairs in the conventional cell
    expected = -4 * M_NACL * ewald.COULOMB / (a / 2)
    assert abs(u - expected) / abs(expected) < 2e-3


def test_madelung_cscl():
    a = 4.11
    frac = np.array([[0, 0, 0], [0.5, 0.5, 0.5]])
    q = np.array([1.0, -1.0])
    # 2x2x2 supercell so r_cut < L/2 still spans several shells
    reps = []
    qs = []
    for i in range(2):
        for j in range(2):
            for k in range(2):
                reps.append((frac + [i, j, k]) / 2)
                qs.append(q)
    frac8 = np.concatenate(reps)
    q8 = np.concatenate(qs)
    L = 2 * a
    sys_ = System(frac8 * L, cell=np.eye(3) * L, numbers=[55, 17] * 8)
    inter = EwaldElectrostatics(sys_, q8)
    u = float(inter.energy({}, jnp.asarray(sys_.get_positions()), ()))
    expected = -8 * M_CSCL * ewald.COULOMB / (a * np.sqrt(3) / 2)
    assert abs(u - expected) / abs(expected) < 2e-3


def test_alpha_invariance_neutral(rng):
    sys_, q = nacl_system()
    xyz = jnp.asarray(sys_.get_positions()
                      + 0.1 * rng.standard_normal((8, 3)))
    u = []
    for acc in (3.0, 3.8):
        inter = EwaldElectrostatics(sys_, q, accuracy=acc)
        u.append(float(inter.energy({}, xyz, ())))
    assert abs(u[0] - u[1]) / abs(u[0]) < 1e-3


def test_alpha_invariance_charged(rng):
    # net charge +2: the background term must keep U alpha-invariant
    sys_, q = nacl_system()
    q = q.copy()
    q[4:6] = 1.0
    xyz = jnp.asarray(sys_.get_positions()
                      + 0.05 * rng.standard_normal((8, 3)))
    u = []
    for acc in (3.0, 3.8):
        inter = EwaldElectrostatics(sys_, q, accuracy=acc)
        u.append(float(inter.energy({}, xyz, ())))
    assert abs(u[0] - u[1]) / max(abs(u[0]), 1.0) < 2e-3


def test_forces_match_finite_difference(rng):
    sys_, q = nacl_system()
    inter = EwaldElectrostatics(sys_, q)
    xyz = np.asarray(sys_.get_positions()
                     + 0.15 * rng.standard_normal((8, 3)),
                     dtype=np.float32)
    e = jax.jit(lambda x: inter.energy({}, x, ()))
    g = np.asarray(jax.grad(lambda x: inter.energy({}, x, ()))(
        jnp.asarray(xyz)))
    for (i, d) in [(0, 0), (3, 1), (6, 2)]:
        eps = 3e-3
        xp = xyz.copy(); xp[i, d] += eps
        xm = xyz.copy(); xm[i, d] -= eps
        fd = (float(e(jnp.asarray(xp))) - float(e(jnp.asarray(xm)))) / (2 * eps)
        assert abs(fd - g[i, d]) < 5e-2 * max(1.0, abs(fd))


def test_exclusion_removes_min_image_pair():
    # excluding pair (0, 4): U_ex == U_full - k_e q0 q4 / r04 (min image),
    # because erf + erfc recombine to the bare 1/r inside the cutoff
    sys_, q = nacl_system()
    xyz = jnp.asarray(sys_.get_positions())
    full = EwaldElectrostatics(sys_, q)
    excl = EwaldElectrostatics(sys_, q, ex_pairs=[(0, 4)])
    d = np.asarray(xyz[0] - xyz[4])
    L = 5.64
    d = d - L * np.round(d / L)
    r = np.linalg.norm(d)
    u_full = float(full.energy({}, xyz, ()))
    u_ex = float(excl.energy({}, xyz, ()))
    direct = ewald.COULOMB * q[0] * q[4] / r
    assert abs((u_full - u_ex) - direct) < 1e-3 * abs(direct) + 1e-4


def test_learnable_charges_grad_and_jit():
    sys_, q = nacl_system()
    inter = EwaldElectrostatics(sys_, q, learn_charges=True)
    params = inter.init_params()
    xyz = jnp.asarray(sys_.get_positions())
    g = jax.jit(jax.grad(lambda p: inter.energy(p, xyz, ())))(params)
    assert np.all(np.isfinite(np.asarray(g["charges"])))
    assert float(jnp.abs(g["charges"]).max()) > 1e-3


def test_dynamic_cell_kwarg_matches_baked():
    sys_, q = nacl_system()
    inter = EwaldElectrostatics(sys_, q)
    xyz = jnp.asarray(sys_.get_positions())
    u0 = float(inter.energy({}, xyz, ()))
    u1 = float(inter.energy({}, xyz, (), cell=jnp.asarray([5.64] * 3)))
    assert abs(u0 - u1) < 1e-5 * abs(u0)


def test_cell_gradient_finite_difference():
    # dU/dL drives the electrostatic contribution to the NPT virial
    sys_, q = nacl_system()
    inter = EwaldElectrostatics(sys_, q)
    frac = np.asarray(sys_.get_positions()) / 5.64

    def u_of_L(L):
        cl = jnp.asarray([L, L, L], dtype=jnp.float32)
        return inter.energy({}, jnp.asarray(frac * L, dtype=jnp.float32),
                            (), cell=cl)

    g = float(jax.grad(u_of_L)(jnp.float32(5.64)))
    eps = 2e-3
    fd = (float(u_of_L(jnp.float32(5.64 + eps)))
          - float(u_of_L(jnp.float32(5.64 - eps)))) / (2 * eps)
    assert abs(g - fd) < 5e-2 * abs(fd)


def test_madelung_nacl_triclinic_primitive():
    # the rhombohedral fcc PRIMITIVE cell of rock salt (2 ions) must
    # reproduce the same Madelung energy as the cubic conventional cell:
    # exercises the triclinic reciprocal sum (k = 2 pi n @ inv(cell)^T),
    # the det-volume terms and the triclinic real-space minimum image
    a = 5.64
    cell = 0.5 * a * np.array([[0.0, 1.0, 1.0],
                               [1.0, 0.0, 1.0],
                               [1.0, 1.0, 0.0]])
    xyz = np.array([[0.0, 0.0, 0.0],
                    [a / 2, a / 2, a / 2]])
    q = np.array([1.0, -1.0])
    sys_ = System(xyz, cell=cell, numbers=[11, 17])
    inter = EwaldElectrostatics(sys_, q)
    u = float(inter.energy({}, jnp.asarray(sys_.get_positions()), ()))
    expected = -M_NACL * ewald.COULOMB / (a / 2)   # one ion pair
    assert abs(u - expected) / abs(expected) < 2e-3


def test_triclinic_matches_conventional_energy_density():
    # energy per ion pair must agree between the 8-ion cubic cell and
    # the 2-ion primitive cell (two completely different summation
    # geometries over the same crystal)
    sys_c, q_c = nacl_system()
    u_cubic = float(EwaldElectrostatics(sys_c, q_c).energy(
        {}, jnp.asarray(sys_c.get_positions()), ()))
    a = 5.64
    cell = 0.5 * a * np.array([[0.0, 1.0, 1.0],
                               [1.0, 0.0, 1.0],
                               [1.0, 1.0, 0.0]])
    xyz = np.array([[0.0, 0.0, 0.0], [a / 2, a / 2, a / 2]])
    sys_p = System(xyz, cell=cell, numbers=[11, 17])
    u_prim = float(EwaldElectrostatics(sys_p, [1.0, -1.0]).energy(
        {}, jnp.asarray(xyz), ()))
    assert abs(u_cubic / 4 - u_prim) / abs(u_prim) < 2e-3


def test_ewald_under_npt_barostat():
    # "NPT-ready" must be executable: a charged melt under the MTK
    # barostat -- the Ewald cell-gradient feeds the virial, the cell is
    # a state variable, and gradients flow to the charge through the
    # barostatted trajectory
    from mdgrad_tpu import units, potentials as pot_zoo
    from mdgrad_tpu.md import NPTMTKNHC, Simulation
    from mdgrad_tpu.interface import PairPotentials, Stack
    from mdgrad_tpu.train.fit_salt import ScaledChargeEwald, rocksalt_melt

    sys_ = rocksalt_melt(n_cells=2, a=6.0, T_kelvin=1800.0,
                         rng=np.random.default_rng(0))
    pattern = np.where(np.asarray(sys_.get_atomic_numbers()) == 11,
                       1.0, -1.0)
    dt = 1.0 * units.fs
    stack = Stack({
        "core": PairPotentials(
            sys_, pot_zoo.ExcludedVolume(sigma=2.3, epsilon=0.1, power=9),
            cutoff=5.5),
        "coul": ScaledChargeEwald(sys_, pattern, 0.6, r_cut=5.5),
    })
    integ = NPTMTKNHC(stack, sys_, T=1800.0, P=1e-4,
                      tau=40 * dt, tau_p=100 * dt, num_chains=3,
                      adjoint=True)
    sim = Simulation(sys_, integ)
    ode = sim.epoch_fn(dt, 20)
    state, aux = sim.initial_state()
    ctrl = integ.default_ctrl()

    def vol_loss(p):
        traj, _ = ode(p, state, aux, ctrl)
        assert traj.cell is not None
        return jnp.prod(traj.cell[-5:], axis=-1).mean()

    v = float(vol_loss(sim.params))
    assert np.isfinite(v) and v > 0
    g = jax.grad(vol_loss)(sim.params)
    gq = float(g["coul"]["qscale"])
    assert np.isfinite(gq) and abs(gq) > 0
    # stronger Coulomb cohesion shrinks the equilibrium volume
    assert gq < 0


def test_table_mode_matches_dense(rng):
    """mode='table' real-space term == dense: energies and forces agree
    on a disordered charged configuration (the N=1000 bench's dense
    O(N^2) real term is the long-range overhead's dominant cost)."""
    sys_, q = nacl_system()
    xyz = jnp.asarray(sys_.get_positions()
                      + 0.1 * rng.standard_normal((8, 3)))
    dense = EwaldElectrostatics(sys_, q)
    table = EwaldElectrostatics(sys_, q, mode="table", capacity_slack=2.0)
    aux = table.aux_init(xyz)
    u_d = float(dense.energy({}, xyz, ()))
    u_t = float(table.energy({}, xyz, aux))
    assert abs(u_d - u_t) < 1e-3 * max(1.0, abs(u_d))
    g_d = np.asarray(jax.grad(lambda x: dense.energy({}, x, ()))(xyz))
    g_t = np.asarray(jax.grad(lambda x: table.energy({}, x, aux))(xyz))
    assert np.allclose(g_d, g_t, atol=5e-3)


def test_table_mode_exclusions_and_regrow(rng):
    """Exclusions baked into the table's select_mask reproduce the dense
    ex_pairs energy; grow_capacity clears a forced overflow."""
    from mdgrad_tpu import topology
    sys_, q = nacl_system()
    xyz = jnp.asarray(sys_.get_positions())
    dense = EwaldElectrostatics(sys_, q, ex_pairs=[(0, 4)])
    table = EwaldElectrostatics(sys_, q, ex_pairs=[(0, 4)], mode="table",
                                capacity_slack=2.0)
    aux = table.aux_init(xyz)
    u_d = float(dense.energy({}, xyz, ()))
    u_t = float(table.energy({}, xyz, aux))
    assert abs(u_d - u_t) < 1e-3 * max(1.0, abs(u_d))
    # regrow: with r_cut above the nn distance (the default L/2*0.99 =
    # 2.79 sits just under NaCl's 2.82 nn shell) an undersized table
    # overflows; grow_capacity must clear it and match dense
    dense4 = EwaldElectrostatics(sys_, q, r_cut=2.85)
    table4 = EwaldElectrostatics(sys_, q, r_cut=2.85, mode="table",
                                 capacity_slack=2.0)
    u_d4 = float(dense4.energy({}, xyz, ()))
    table4.k_max = 1
    aux = table4.aux_init(xyz)
    assert topology.aux_overflow(aux)
    assert table4.grow_capacity(factor=8.0)
    aux = table4.aux_init(xyz)
    assert not topology.aux_overflow(aux)
    assert abs(float(table4.energy({}, xyz, aux)) - u_d4) \
        < 1e-3 * max(1.0, abs(u_d4))
