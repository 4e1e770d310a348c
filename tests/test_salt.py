"""Molten-salt charge-recovery workload (fit_salt): the Ewald term is
identifiable from partial RDFs and trainable through the trajectory."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mdgrad_tpu.train import fit_salt as fs


@pytest.fixture(scope="module")
def tiny():
    rng = np.random.default_rng(3)
    system = fs.rocksalt_melt(n_cells=2, a=6.0, T_kelvin=2500.0, rng=rng)
    g_l, g_u, state = fs.generate_targets(
        system, q_true=0.9, n_sim=4, steps=40, burn=2,
        log=lambda *a: None)
    return system, g_l, g_u, state


def test_targets_show_charge_ordering(tiny):
    _, g_l, g_u, _ = tiny
    # unlike pairs (opposite charge) pile up at contact; the first peak
    # of g_unlike must exceed g_like's value there
    i = int(np.argmax(g_u))
    assert g_u[i] > 1.5 * max(g_l[i], 0.1)


def test_loss_prefers_truth_charge(tiny):
    system, g_l_t, g_u_t, state0 = tiny
    g_like, g_unlike = fs.partial_rdf_observers(system)

    def mean_rdfs(qscale, seed):
        sim, integ = fs.build_sim(system, qscale, q_truth_mode=True,
                                  T_kelvin=2500.0)
        from mdgrad_tpu import units
        run = sim.epoch_fn(1.0 * units.fs, 40)
        state = jax.tree_util.tree_map(jnp.asarray, state0)
        aux = sim.initial_state()[1]
        ctrl = integ.default_ctrl()
        acc_l = acc_u = 0.0
        for _ in range(4):
            traj, aux = run(sim.params, state, aux, ctrl)
            state = jax.tree_util.tree_map(lambda a: a[-1], traj)
            fr = traj.q[::4]
            acc_l = acc_l + jax.vmap(lambda q: g_like(q)[2])(fr).mean(0)
            acc_u = acc_u + jax.vmap(lambda q: g_unlike(q)[2])(fr).mean(0)
        return acc_l / 4, acc_u / 4

    def loss(qscale):
        gl, gu = mean_rdfs(qscale, 0)
        return float(((gl - g_l_t) ** 2).mean() + ((gu - g_u_t) ** 2).mean())

    l_truth = loss(0.9)
    l_low = loss(0.3)
    assert l_truth < l_low


def test_charge_gradient_flows_through_trajectory(tiny):
    system, g_l_t, g_u_t, state0 = tiny
    sim, integ = fs.build_sim(system, 0.5, T_kelvin=2500.0)
    g_like, g_unlike = fs.partial_rdf_observers(system)
    from mdgrad_tpu import units
    ode = sim.epoch_fn(1.0 * units.fs, 20)
    state = jax.tree_util.tree_map(jnp.asarray, state0)
    aux = sim.initial_state()[1]
    ctrl = integ.default_ctrl()
    g_l_t = jnp.asarray(g_l_t)
    g_u_t = jnp.asarray(g_u_t)

    def loss_fn(p):
        traj, _ = ode(p, state, aux, ctrl)
        fr = traj.q[::4]
        gl = jax.vmap(lambda q: g_like(q)[2])(fr).mean(0)
        gu = jax.vmap(lambda q: g_unlike(q)[2])(fr).mean(0)
        return ((gl - g_l_t) ** 2).mean() + ((gu - g_u_t) ** 2).mean()

    g = jax.grad(loss_fn)(sim.params)
    gq = float(g["coul"]["qscale"])
    assert np.isfinite(gq) and abs(gq) > 1e-6
    # core is present but frozen by the driver; its grads exist too
    assert np.isfinite(float(loss_fn(sim.params)))


def test_fit_salt_smoke_best_selection(tmp_path):
    """fit_salt end-to-end on a tiny melt: finishes, writes result.json,
    and the EMA best-model selection populates q_best/best_epoch (the
    r4 on-chip run's final-epoch qscale read 8% off truth while the
    EMA-selected one was 2% off -- the field is the deliverable)."""
    res = fs.fit_salt(model_path=str(tmp_path), n_cells=2, a=6.0,
                      q_true=0.8, q0=0.5, n_epochs=13, tau=20,
                      target_nsim=2, log=lambda *a: None,
                      rng=np.random.default_rng(5))
    assert len(res["history"]) == 13
    assert np.isfinite(res["q_best"]) and np.isfinite(res["q_final"])
    assert res["best_epoch"] is not None and res["best_epoch"] >= 10
    assert "ema_loss" in res["history"][0]
    import os, json
    with open(os.path.join(tmp_path, "result.json")) as f:
        assert json.load(f)["q_best"] == res["q_best"]
