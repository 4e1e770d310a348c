"""Binary-mixture fitting: learn 3 partial pair potentials from 3 partial
RDFs.

Parity target: /root/reference/scripts/fit_2_comp.py -- random species
assignment (``mix_system``, :13-35), ground truth = three LJ
``PairPotentials`` restricted by ``index_tuple`` (:168-182), targets =
equilibrium partial RDFs g11/g12/g22 (:197-222), model = three pairMLPs
with a shared LJFamily soft-core prior over all particles (:228-255),
NHC(Q=50, 5 chains) with topology refresh every 10 steps (:188-195).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .. import potentials as pot_zoo
from ..system import System
from ..interface import PairPotentials, Stack
from ..md import NoseHooverChain, Simulation
from ..observables import rdf as rdf_obs_cls
from ..nn import PairMLP
from ..data.registry import number_density_unit_len
from .. import units


def mix_system(system, type1_composition=0.5, rng=None):
    """Randomly assign species (parity: fit_2_comp.py:13-35)."""
    rng = np.random.default_rng() if rng is None else rng
    n = system.get_number_of_atoms()
    n1 = int(n * type1_composition)
    all_idx = rng.permutation(n)
    idx1, idx2 = np.sort(all_idx[:n1]), np.sort(all_idx[n1:])
    z = system.get_atomic_numbers().copy()
    z[idx2] = 2
    system.numbers = z
    system.masses = np.ones(n)
    return system, idx1, idx2


def build_mixture(size=4, rho=0.845, T=1.2, x=0.5, cutoff=2.5,
                  sigmas=(0.9, 1.0, 1.1), rng=None):
    """System + ground-truth Stack of 3 species-restricted LJ potentials."""
    L = number_density_unit_len(rho, 4)
    system = System.from_lattice("fcc", size, L)
    # T is reduced (energy units) in the mixture workloads
    system.set_temperature(T / units.kB, rng=rng)
    system, idx1, idx2 = mix_system(system, x, rng=rng)
    pairs = {
        "pot11": (pot_zoo.LennardJones(1.0, sigmas[0]), (idx1, idx1)),
        "pot12": (pot_zoo.LennardJones(1.0, sigmas[1]), (idx1, idx2)),
        "pot22": (pot_zoo.LennardJones(1.0, sigmas[2]), (idx2, idx2)),
    }
    target = Stack({k: PairPotentials(system, m, cutoff=cutoff,
                                      index_tuple=it)
                    for k, (m, it) in pairs.items()})
    return system, target, idx1, idx2


def partial_rdfs(system, idx1, idx2, nbins=100, rdf_range=(0.6, 3.3)):
    return {
        "11": rdf_obs_cls(system, nbins, rdf_range,
                          index_tuple=(idx1, idx1)),
        "12": rdf_obs_cls(system, nbins, rdf_range,
                          index_tuple=(idx1, idx2)),
        "22": rdf_obs_cls(system, nbins, rdf_range,
                          index_tuple=(idx2, idx2)),
    }


def fit_mix(size=3, rho=0.845, T=1.2, x=0.5, n_epochs=3, tau=21, dt=0.005,
            nbins=64, rdf_range=(0.6, 2.5), lr=3e-3, n_target_epochs=4,
            target_steps=40, mlp=None, sigma_prior=0.9, model_path=None,
            log=print, rng=None):
    """End-to-end mixture fit; returns losses and recovered potentials."""
    rng = np.random.default_rng(0) if rng is None else rng
    cutoff = 2.5
    system, target_stack, idx1, idx2 = build_mixture(
        size, rho, T, x, cutoff, rng=rng)

    # --- ground-truth targets ------------------------------------------
    integ = NoseHooverChain(target_stack, system, T=T / units.kB, Q=50.0,
                            num_chains=5, adjoint=False,
                            topology_update_freq=10)
    sim = Simulation(system, integ)
    robs = partial_rdfs(system, idx1, idx2, nbins, rdf_range)
    frames = []
    for _ in range(n_target_epochs):
        traj = sim.simulate(steps=target_steps, dt=dt,
                            frequency=target_steps)
        frames.append(np.asarray(traj.q[-1]))
    skip = len(frames) // 3
    targets = {k: jnp.asarray(np.mean(
        [np.asarray(o(jnp.asarray(f))[2]) for f in frames[skip:]], axis=0))
        for k, o in robs.items()}

    # --- learnable model ------------------------------------------------
    mlp = mlp or dict(n_gauss=int(cutoff // 0.1), r_start=0.0,
                      r_end=cutoff, n_width=32, n_layers=1,
                      nonlinear="SELU")
    nets = {k: PairMLP(**mlp) for k in ("11", "12", "22")}
    prior = pot_zoo.LJFamily(epsilon=2.0, sigma=sigma_prior, rep_pow=6,
                             attr_pow=3)
    model = Stack({
        "mlppot11": PairPotentials(system, nets["11"], cutoff=cutoff,
                                   index_tuple=(idx1, idx1)),
        "mlppot12": PairPotentials(system, nets["12"], cutoff=cutoff,
                                   index_tuple=(idx1, idx2)),
        "mlppot22": PairPotentials(system, nets["22"], cutoff=cutoff,
                                   index_tuple=(idx2, idx2)),
        "prior": PairPotentials(system, prior, cutoff=cutoff),
    })
    fit_system = System(system.get_positions(), system.get_cell(),
                        numbers=system.numbers, masses=system.masses)
    fit_system.set_temperature(T / units.kB, rng=rng)
    integ2 = NoseHooverChain(model, fit_system, T=T / units.kB, Q=50.0,
                             num_chains=5, adjoint=True,
                             topology_update_freq=10)
    sim2 = Simulation(fit_system, integ2)
    params = sim2.params
    ode = sim2.epoch_fn(dt, tau)
    ctrl = integ2.default_ctrl()

    def loss_fn(p, state, aux):
        traj, faux = ode(p, state, aux, ctrl)
        fr = traj.q[::5]
        loss = 0.0
        for k, o in robs.items():
            g = jax.vmap(lambda q: o(q)[2])(fr).mean(0)
            loss = loss + ((g - targets[k]) ** 2).mean()
        last = jax.tree_util.tree_map(lambda a: a[-1], traj)
        return loss, (last, faux)

    vg = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    def label(path, _):
        return "frozen" if getattr(path[0], "key", None) == "prior" \
            else "train"
    labels = jax.tree_util.tree_map_with_path(label, params)
    opt = optax.multi_transform(
        {"train": optax.adam(lr), "frozen": optax.set_to_zero()}, labels)
    opt_state = opt.init(params)

    @jax.jit
    def _opt_step(grads, opt_state, params):
        # fused optimizer step (eager optax over the axon tunnel costs
        # hundreds of small dispatches per epoch; see fit_rdf.py)
        updates, new_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_state

    state, aux = sim2.initial_state()
    loss_log = []
    for epoch in range(n_epochs):
        (loss, (last, aux_new)), grads = vg(params, state, aux)
        if not bool(jnp.isfinite(last.q).all()):
            log(f"NaN bailout at epoch {epoch}")
            return {"objective": 5 - (epoch / n_epochs) * 5,
                    "nan_bailout": True, "loss_log": loss_log}
        state, aux = jax.lax.stop_gradient(last), aux_new
        params, opt_state = _opt_step(grads, opt_state, params)
        loss_log.append(float(loss))
        log(f"epoch {epoch} | mixture loss {float(loss):.6f}")

    # recovered potentials
    r_grid = jnp.linspace(0.5, cutoff, 200)[:, None]
    u_prior = prior(params["prior"], r_grid).squeeze(-1)
    recovered = {}
    for k in ("11", "12", "22"):
        u = nets[k](params[f"mlppot{k}"], r_grid).squeeze(-1) + u_prior
        recovered[k] = np.asarray(u - u[-1])
    out = {"loss_log": loss_log, "targets": {k: np.asarray(v)
                                             for k, v in targets.items()},
           "recovered": recovered, "params": params,
           "r_grid": np.asarray(r_grid).squeeze(-1),
           "objective": loss_log[-1] if loss_log else float("nan")}
    if model_path:
        os.makedirs(model_path, exist_ok=True)
        for k, v in recovered.items():
            np.savetxt(os.path.join(model_path, f"pot{k}.csv"),
                       np.vstack([out["r_grid"], v]), delimiter=",")
    return out
