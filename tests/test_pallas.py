"""Pallas fused pair energy/force kernel: correctness vs the XLA dense
path (interpret mode on CPU; the same code compiles on TPU -- see
BENCH.md for device benchmarks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mdgrad_tpu import units, potentials
from mdgrad_tpu.system import System
from mdgrad_tpu.interface import PairPotentials
from mdgrad_tpu.ops.pallas_pair import lj_energy_forces, PallasLJPair


@pytest.fixture(scope="module")
def perturbed_fcc():
    sys_ = System.from_lattice("fcc", 3, 1.679)
    rng = np.random.default_rng(1)
    xyz = jnp.asarray(sys_.get_positions()
                      + rng.normal(0, 0.05, (108, 3)))
    return sys_, xyz


@pytest.mark.parametrize("rep,attr", [(12, 6), (9, 6), (12, 0)])
def test_kernel_matches_dense(perturbed_fcc, rep, attr):
    sys_, xyz = perturbed_fcc
    cell_len = np.diag(sys_.get_cell())
    e, f = lj_energy_forces(xyz, cell_len, 2.4, 0.95, 1.1, rep_pow=rep,
                            attr_pow=attr, interpret=True)
    model = potentials.LJFamily(sigma=0.95, epsilon=1.1, rep_pow=rep,
                                attr_pow=attr)
    dense = PairPotentials(sys_, model, cutoff=2.4, mode="dense")
    p = dense.init_params()
    e_ref = float(dense.energy(p, xyz, ()))
    f_ref = -jax.grad(dense.energy, argnums=1)(p, xyz, ())
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                               rtol=1e-3, atol=1e-4)


def test_kernel_padding_independence(perturbed_fcc):
    """Adding ghost atoms beyond n must not change results (exercises the
    n_real masking)."""
    sys_, xyz = perturbed_fcc
    cell_len = np.diag(sys_.get_cell())
    e1, f1 = lj_energy_forces(xyz, cell_len, 2.4, 1.0, 1.0,
                              interpret=True)
    e2, f2 = lj_energy_forces(xyz[:100], cell_len, 2.4, 1.0, 1.0,
                              interpret=True)
    assert f1.shape == (108, 3) and f2.shape == (100, 3)
    # recompute reference for the 100-atom subset
    sub = System(np.asarray(xyz)[:100], sys_.get_cell())
    dense = PairPotentials(sub, potentials.LennardJones(1.0, 1.0),
                           cutoff=2.4, mode="dense")
    p = dense.init_params()
    np.testing.assert_allclose(float(e2),
                               float(dense.energy(p, xyz[:100], ())),
                               rtol=1e-5, atol=1e-3)


def test_pallas_interaction_runs_md(perturbed_fcc):
    """PallasLJPair drives NVE through the Simulation machinery
    (interpret mode on CPU); the integrator picks up the model-provided
    force automatically."""
    import mdgrad_tpu.ops.pallas_pair as pp
    sys_, _ = perturbed_fcc
    from mdgrad_tpu.md import NVE, Simulation
    sys_.set_temperature(1.0 / units.kB, rng=np.random.default_rng(3))
    pair = pp.PallasLJPair(sys_, cutoff=2.4, sigma=1.0, epsilon=1.0,
                           interpret=True)

    integ = NVE(pair, sys_, adjoint=False)
    sim = Simulation(sys_, integ)
    traj = sim.simulate(steps=20, dt=0.002, frequency=20)
    assert np.isfinite(np.asarray(traj.q)).all()
    # energy conservation with in-kernel forces
    m = jnp.asarray(sys_.get_masses())[:, None]
    p = pair.init_params()
    e0 = float(0.5 * (m * traj.v[0] ** 2).sum()
               + pair.energy(p, traj.q[0], ()))
    e1 = float(0.5 * (m * traj.v[-1] ** 2).sum()
               + pair.energy(p, traj.q[-1], ()))
    assert abs(e1 - e0) / abs(e0) < 1e-2, (e0, e1)


def test_pallas_rdf_counts_and_grads_match_xla(perturbed_fcc):
    """Streaming soft-histogram kernel (fwd + custom-vjp bwd) matches the
    XLA dense RDF path (interpret mode)."""
    from mdgrad_tpu.ops.pallas_rdf import make_pallas_rdf
    from mdgrad_tpu.observables import rdf as rdf_obs
    sys_, xyz = perturbed_fcc
    obs = rdf_obs(sys_, nbins=48, r_range=(0.75, 2.0))
    counts_fn = make_pallas_rdf(
        np.asarray(np.diag(sys_.get_cell())),
        np.asarray(obs.smear.offsets), np.asarray(obs.smear.widths),
        obs.cutoff_boundary, interpret=True)
    raw_ref = obs._frame_counts(xyz)
    raw_pal = counts_fn(xyz)
    np.testing.assert_allclose(np.asarray(raw_pal), np.asarray(raw_ref),
                               rtol=1e-5, atol=1e-3)
    g_ref = jax.grad(lambda x: (obs._frame_counts(x) ** 2).sum())(xyz)
    g_pal = jax.grad(lambda x: (counts_fn(x) ** 2).sum())(xyz)
    # gradient magnitudes reach ~1e5; tolerance scales with them
    scale = float(np.abs(np.asarray(g_ref)).max())
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-5 * scale)


def test_rdf_pallas_backend_api(perturbed_fcc, monkeypatch):
    """rdf(..., backend='pallas') gives the same normalized g(r)."""
    import mdgrad_tpu.ops.pallas_rdf as pr
    orig = pr.make_pallas_rdf
    monkeypatch.setattr(
        pr, "make_pallas_rdf",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    from mdgrad_tpu.observables import rdf as rdf_obs
    sys_, xyz = perturbed_fcc
    g1 = rdf_obs(sys_, 48, (0.75, 2.0))(xyz)[2]
    g2 = rdf_obs(sys_, 48, (0.75, 2.0), backend="pallas")(xyz)[2]
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=1e-4, atol=1e-4)


def test_rdf_pallas_frames_kernel(perturbed_fcc):
    """The frame-batched grid kernel == per-frame calls (fwd + grads)."""
    from mdgrad_tpu.ops.pallas_rdf import make_pallas_rdf
    from mdgrad_tpu.nn.layers import GaussianSmearing
    sys_, xyz = perturbed_fcc
    rng = np.random.default_rng(3)
    frames = jnp.asarray(np.stack(
        [np.asarray(xyz) + 0.02 * rng.standard_normal(xyz.shape)
         for _ in range(3)]))
    smear = GaussianSmearing(start=0.75, stop=2.0, n_gaussians=48)
    counts_fn = make_pallas_rdf(
        np.diag(np.asarray(sys_.get_cell())), np.asarray(smear.offsets),
        np.asarray(smear.widths), 2.5, interpret=True)

    c_frames = counts_fn.frames(frames)
    c_loop = sum(counts_fn(frames[i]) for i in range(3))
    np.testing.assert_allclose(np.asarray(c_frames), np.asarray(c_loop),
                               rtol=1e-5, atol=1e-4)

    g1 = jax.grad(lambda x: (counts_fn.frames(x) ** 2).sum())(frames)
    g2 = jax.grad(lambda x: (sum(counts_fn(x[i]) for i in range(3))
                             ** 2).sum())(frames)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_differentiable_pallas_force_in_md_adjoint(perturbed_fcc):
    """Fitting-path chain: RDF loss -> trajectory adjoint -> pallas force
    (custom-vjp HVP backward) -> d/d(sigma, epsilon) matches the XLA dense
    path."""
    from mdgrad_tpu.ops.pallas_pair import PallasLJPair
    from mdgrad_tpu.md import NVE, Simulation
    from mdgrad_tpu.observables import rdf as rdf_obs
    sys_, _ = perturbed_fcc
    sys_.set_temperature(1.0 / units.kB, rng=np.random.default_rng(2))

    def make_loss(use_pallas):
        if use_pallas:
            pair = PallasLJPair(sys_, cutoff=2.4, sigma=0.95, epsilon=1.0,
                                interpret=True)
        else:
            pair = PairPotentials(
                sys_, potentials.LennardJones(0.95, 1.0), cutoff=2.4,
                mode="dense")
        integ = NVE(pair, sys_, adjoint=True)
        sim = Simulation(sys_, integ)
        ode = sim.epoch_fn(dt=0.003, frequency=8)
        state, aux = sim.initial_state()
        obs = rdf_obs(sys_, nbins=24, r_range=(0.8, 2.3))

        def loss(p):
            traj, _ = ode(p, state, aux, {})
            return (obs(traj.q[-1])[2] ** 2).mean()
        return loss, sim.params

    loss_p, params = make_loss(True)
    loss_x, _ = make_loss(False)
    gp = jax.grad(loss_p)(params)
    gx = jax.grad(loss_x)(params)
    for k in ("sigma", "epsilon"):
        np.testing.assert_allclose(float(gp[k]), float(gx[k]), rtol=5e-3,
                                   atol=1e-7)
        assert abs(float(gp[k])) > 0


# ---------------------------------------------------------------------------
# in-VMEM one-hot gather/scatter pair (ops/pallas_gather.py)
# ---------------------------------------------------------------------------

def test_table_gather_scatter_match_oracle_any_grad_order():
    """table_gather/table_scatter vs plain-XLA oracles, incl. the adjoint
    identity <g, gather(v)> == <scatter(g), v> and reverse-over-reverse
    (the force grad-of-grad pattern the SchNet adjoint needs)."""
    from mdgrad_tpu.ops.pallas_gather import table_gather, table_scatter
    rng = np.random.default_rng(0)
    N, F, E = 37, 70, 211
    vals = jnp.asarray(rng.normal(size=(N, F)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N + 1, size=E), jnp.int32)
    w = jnp.asarray(rng.normal(size=(E, F)), jnp.float32)

    def oracle_gather(v):
        ext = jnp.concatenate([v, jnp.zeros((1, F))])
        return jnp.where((idx < N)[:, None], ext[jnp.clip(idx, 0, N)], 0.0)

    out = table_gather(vals, idx, True, True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(oracle_gather(vals)),
                               atol=5e-5)

    g = jnp.asarray(rng.normal(size=(E, F)), jnp.float32)
    sc = table_scatter(g, idx, N, True, True)
    ref_sc = jax.ops.segment_sum(jnp.where((idx < N)[:, None], g, 0.0),
                                 jnp.clip(idx, 0, N - 1), num_segments=N)
    np.testing.assert_allclose(np.asarray(sc), np.asarray(ref_sc),
                               atol=1e-4)
    # adjoint identity
    np.testing.assert_allclose(float((g * out).sum()),
                               float((sc * vals).sum()), rtol=1e-4)

    # grad-of-grad: "force" of a gather-based energy, then a loss of it
    def energy(v):
        return (table_gather(v * v, idx, True, True) * w).sum()

    def energy_o(v):
        return (oracle_gather(v * v) * w).sum()

    g2 = jax.grad(lambda v: (jax.grad(energy)(v) ** 2).sum())(vals)
    g2o = jax.grad(lambda v: (jax.grad(energy_o)(v) ** 2).sum())(vals)
    scale = np.abs(np.asarray(g2o)).max()
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g2o),
                               atol=1e-4 * scale)


def test_schnet_pallas_gather_mode_matches_gather():
    """gather_mode='pallas' must reproduce the plain gather path's energy
    and forces (interpret mode on CPU; identical code compiles on TPU)."""
    from mdgrad_tpu.nn import SchNet
    from mdgrad_tpu.interface import GNNPotentials
    sys_ = System.from_lattice("fcc", 2, 2.9)
    rng = np.random.default_rng(5)
    xyz = jnp.asarray(sys_.get_positions()
                      + 0.08 * rng.standard_normal((32, 3)))
    params_common = {"n_atom_basis": 16, "n_filters": 16, "n_gaussians": 8,
                     "n_convolutions": 2, "cutoff": 2.5}
    outs = {}
    for mode in ("gather", "pallas"):
        gnn = SchNet({**params_common, "gather_mode": mode})
        inter = GNNPotentials(sys_, gnn, cutoff=2.5)
        p = inter.init_params()
        aux = inter.aux_init(xyz)
        u = inter.energy(p, xyz, aux)
        f = -jax.grad(inter.energy, argnums=1)(p, xyz, aux)
        outs[mode] = (float(u), np.asarray(f))
    np.testing.assert_allclose(outs["pallas"][0], outs["gather"][0],
                               rtol=1e-5)
    scale = np.abs(outs["gather"][1]).max()
    np.testing.assert_allclose(outs["pallas"][1], outs["gather"][1],
                               atol=5e-3 * scale + 1e-7)


def test_schnet_pallas_mode_trains_through_adjoint():
    """Fit-shaped grad (loss -> trajectory adjoint -> force grad-of-grad)
    through gather_mode='pallas' stays finite and matches the gather
    path."""
    from mdgrad_tpu.nn import SchNet
    from mdgrad_tpu.interface import GNNPotentials
    from mdgrad_tpu.md import NoseHooverChain, Simulation
    sys_ = System.from_lattice("fcc", 2, 2.9)
    sys_.set_temperature(1.0 / units.kB, rng=np.random.default_rng(3))
    params_common = {"n_atom_basis": 16, "n_filters": 16, "n_gaussians": 8,
                     "n_convolutions": 2, "cutoff": 2.5}
    grads = {}
    for mode in ("gather", "pallas"):
        gnn = SchNet({**params_common, "gather_mode": mode})
        inter = GNNPotentials(sys_, gnn, cutoff=2.5)
        integ = NoseHooverChain(inter, sys_, T=1.0 / units.kB,
                                Q=50.0, adjoint=True)
        sim = Simulation(sys_, integ)
        ode = sim.epoch_fn(dt=0.005, frequency=8)
        state, aux = sim.initial_state()
        ctrl = integ.default_ctrl()

        def loss(params):
            traj, _ = ode(params, state, aux, ctrl)
            return (traj.q[-1] ** 2).sum()

        grads[mode] = jax.grad(loss)(sim.params)
    ga = np.concatenate([np.ravel(x) for x in
                         jax.tree_util.tree_leaves(grads["gather"])])
    gp = np.concatenate([np.ravel(x) for x in
                         jax.tree_util.tree_leaves(grads["pallas"])])
    assert np.isfinite(gp).all()
    scale = np.abs(ga).max()
    np.testing.assert_allclose(gp, ga, atol=2e-3 * scale)


def test_gather_mul_reduce_matches_oracle():
    """Fused aggregation kernel (gather x weight -> K-reduce) vs plain
    ops, values/weight grads and the grad-of-grad pattern."""
    from mdgrad_tpu.ops.pallas_gather import gather_mul_reduce
    rng = np.random.default_rng(0)
    N, F, K, NO = 37, 70, 12, 29
    vals = jnp.asarray(rng.normal(size=(N, F)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N + 1, size=NO * K), jnp.int32)
    w = jnp.asarray(rng.normal(size=(NO * K, F)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(NO, F)), jnp.float32)

    def oracle(v, w_):
        ext = jnp.concatenate([v, jnp.zeros((1, F))])
        g = jnp.where((idx < N)[:, None], ext[jnp.clip(idx, 0, N)], 0.0)
        return (g * w_).reshape(NO, K, F).sum(1)

    out = gather_mul_reduce(vals, w, idx, K, True, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle(vals, w)),
                               atol=2e-4)
    g1 = jax.grad(lambda v, w_: (gather_mul_reduce(
        v, w_, idx, K, True, True) * ct).sum(), argnums=(0, 1))(vals, w)
    g2 = jax.grad(lambda v, w_: (oracle(v, w_) * ct).sum(),
                  argnums=(0, 1))(vals, w)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               atol=2e-4)
    h1 = jax.grad(lambda v: (jax.grad(lambda v_: (gather_mul_reduce(
        v_ * v_, w, idx, K, True, True) * ct).sum())(v) ** 2).sum())(vals)
    h2 = jax.grad(lambda v: (jax.grad(lambda v_: (oracle(
        v_ * v_, w) * ct).sum())(v) ** 2).sum())(vals)
    scale = np.abs(np.asarray(h2)).max()
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                               atol=1e-4 * scale)


def test_make_lj_force_custom_vjp_matches_dense(perturbed_fcc):
    """The differentiable Pallas force (`make_lj_force`): forward AND the
    analytic-HVP custom_vjp backward match XLA autodiff of the dense
    minimum-image LJ force (interpret mode).  This is the kernel that
    sits INSIDE fitting adjoints -- its vjp carries the second-order
    grad-of-grad chain d(loss)/d(sigma, epsilon)."""
    from mdgrad_tpu.ops.pallas_pair import make_lj_force
    sys_, xyz = perturbed_fcc
    cell_len = jnp.asarray(np.diag(sys_.get_cell()))
    cutoff = 2.4
    force_pal = make_lj_force(cell_len, cutoff, interpret=True)

    def dense_force(xyz, sigma, eps):
        dr = xyz[:, None, :] - xyz[None, :, :]
        dr = dr - jnp.round(dr / cell_len) * cell_len
        r2 = (dr ** 2).sum(-1)
        n = xyz.shape[0]
        valid = (~jnp.eye(n, dtype=bool)) & (r2 < cutoff ** 2)
        r2s = jnp.where(valid, r2, 1.0)
        inv_r2 = 1.0 / r2s
        sr = sigma * jnp.sqrt(inv_r2)
        g = 4.0 * eps * (-12 * sr ** 12 + 6 * sr ** 6) * inv_r2 * valid
        return -(g[..., None] * dr).sum(axis=1)

    sigma, eps = jnp.float32(0.95), jnp.float32(1.1)
    f_pal = force_pal(xyz, sigma, eps)
    f_ref = dense_force(xyz, sigma, eps)
    scale = float(jnp.abs(f_ref).max())
    np.testing.assert_allclose(np.asarray(f_pal), np.asarray(f_ref),
                               rtol=1e-4, atol=1e-5 * scale)

    # backward: one fixed cotangent through the force -- exercises the
    # HVP kernel against grad-of-the-dense-force for ALL three inputs
    w = jnp.asarray(np.random.default_rng(7).normal(size=f_ref.shape),
                    jnp.float32)

    def scalar(force_fn):
        return lambda x, s, e: (w * force_fn(x, s, e)).sum()

    g_pal = jax.grad(scalar(force_pal), argnums=(0, 1, 2))(xyz, sigma, eps)
    g_ref = jax.grad(scalar(dense_force), argnums=(0, 1, 2))(xyz, sigma,
                                                             eps)
    for a, b, name in zip(g_pal, g_ref, ("xyz", "sigma", "eps")):
        sc = max(float(jnp.abs(jnp.asarray(b)).max()), 1e-8)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5 * sc,
                                   err_msg=f"d/d{name} mismatch")
