"""Boltzmann-inversion pretraining of learnable pair potentials.

Parity target: ``pair_pretrain`` / ``tpair_pretrain``
(/root/reference/scripts/fit_rdf_gnn.py:254-349): before trajectory
fitting, the pair MLP is regressed onto the Boltzmann-inverted target RDF
u_BI(r) = -kB T log g(r) (averaged over state points), with the repulsive
prior subtracted, using Adam + reduce-on-plateau.

TPU-native: the whole regression step is one jitted value_and_grad; the
plateau schedule is optax.contrib.reduce_on_plateau.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .. import units


def boltzmann_inversion_targets(r_axis_list, g_obs_list, T_list,
                                rrange, posinf=100.0, g_support=1e-3):
    """u_BI(r) per state point on a common grid
    (reference fit_rdf_gnn.py:261-267).

    Bins with g <= ``g_support`` carry no information (the reference
    clamps them to ``posinf``, which plants a 100-high cliff right at the
    edge of the sampled region -- the regressed MLP then reproduces the
    cliff and the first MD epoch blows through it).  Instead the core is
    continued linearly from the slope at the first supported bins,
    capped at ``posinf``: monotonically repulsive, no cliff."""
    pots = []
    for x, g, T in zip(r_axis_list, g_obs_list, T_list):
        x = np.asarray(x)
        g = np.asarray(g)
        supported = g > g_support
        if supported.sum() < 2:
            raise ValueError("target RDF has <2 supported bins")
        xs, gs = x[supported], g[supported]
        with np.errstate(divide="ignore"):
            us = -units.kB * T * np.log(gs)
        u = np.interp(rrange, xs, us)
        core = rrange < xs[0]
        if core.any():
            slope = min((us[1] - us[0]) / max(xs[1] - xs[0], 1e-9), 0.0)
            u[core] = us[0] + slope * (rrange[core] - xs[0])
        pots.append(np.clip(u, -posinf, posinf))
    return np.stack(pots)


def boltzmann_inversion_pretrain(net, params, prior, prior_params,
                                 r_axis_list, g_obs_list, T_list,
                                 rrange=None, n_iters=2000, lr=1e-3,
                                 temperature_dependent=False,
                                 log_every=None):
    """Fit ``net`` so that net(r) [+ prior(r)] matches u_BI(r).

    For ``temperature_dependent`` nets (TPairMLP), each state point is
    regressed at its own kT input (reference tpair_pretrain,
    fit_rdf_gnn.py:303-349); otherwise targets are averaged over state
    points (pair_pretrain, fit_rdf_gnn.py:254-298).

    Returns trained params.
    """
    if rrange is None:
        rrange = np.linspace(2.5, 7.5, 1000)
    targets = boltzmann_inversion_targets(r_axis_list, g_obs_list, T_list,
                                          rrange)
    r = jnp.asarray(rrange)[:, None]
    kTs = jnp.asarray([units.kB * T for T in T_list])
    u_prior = prior(prior_params, r).squeeze(-1)

    if not temperature_dependent:
        u_target = jnp.asarray(targets.mean(0))

        def loss_fn(p):
            u_fit = net(p, r).squeeze(-1) + u_prior
            return ((u_fit - u_target) ** 2).mean()
    else:
        u_targets = jnp.asarray(targets)

        def loss_fn(p):
            def per_T(kT, u_t):
                u_fit = net(p, r, kT).squeeze(-1) + u_prior
                return ((u_fit - u_t) ** 2).mean()
            return jax.vmap(per_T)(kTs, u_targets).sum()

    opt = optax.chain(
        optax.adam(lr),
        optax.contrib.reduce_on_plateau(factor=0.5, patience=25,
                                        min_scale=1e-4, atol=1e-5))
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s, p, value=loss)
        return optax.apply_updates(p, updates), s, loss

    for i in range(n_iters):
        params, opt_state, loss = step(params, opt_state)
        if log_every and i % log_every == 0:
            print(f"  BI pretrain {i}: {float(loss):.6f}")
    return params
