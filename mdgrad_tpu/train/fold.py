"""Differentiable polymer folding: drive a chain toward a helix target.

Parity target: /root/reference/demo/fold.py -- target geometry = helix
(``gen_helix``, fold.py:8-19), targets are the helix's internal coordinates
(bond lengths, angles, signed dihedrals; ``compute_intcoord``, fold.py:57-71)
plus a within-cutoff distance list; the simulated system is a straight
chain with a harmonic-bond prior, a SchNet GNN and an excluded-volume pair
term with bonded exclusions (fold.py:117-161); training backprops the
internal-coordinate losses through an NHC/NVE trajectory into the GNN
(fold.py:226-260).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .. import potentials as pot_zoo
from ..lattice import helix, straight_chain
from ..system import System
from ..interface import (BondPotentials, GNNPotentials, PairPotentials,
                         Stack)
from ..md import NVE, NoseHooverChain, Simulation
from ..nn import SchNet


def compute_bond(xyz, bonds):
    """Bond lengths per frame (parity: fold.py:52-55)."""
    d = xyz[:, bonds[:, 0], :] - xyz[:, bonds[:, 1], :]
    return jnp.sqrt((d ** 2).sum(-1))


def compute_intcoord(xyz):
    """(bond lengths, angles, signed dihedrals) of a chain
    (parity: fold.py:57-71)."""
    vec = xyz[:, :-1] - xyz[:, 1:]
    u_norm = jnp.sqrt((vec ** 2).sum(-1) + 1e-12)
    u_i = vec / u_norm[..., None]
    cos_a = jnp.clip((u_i[:, :-1] * u_i[:, 1:]).sum(-1), -0.99, 0.99)
    a = jnp.arccos(cos_a)
    n_unorm = jnp.cross(u_i[:, :-1], u_i[:, 1:])
    # eps-guarded: a perfectly straight segment has a zero normal (the
    # initial chain), which would 0/0 -> NaN like the reference's first
    # epoch (it skips the loss there, fold.py:219; we guard instead)
    n_i = n_unorm / jnp.sqrt((n_unorm ** 2).sum(-1) + 1e-12)[..., None]
    cos_d = jnp.clip((n_i[:, :-1] * n_i[:, 1:]).sum(-1), -0.99, 0.99)
    sign = jnp.sign((u_i[:, :-2] * n_i[:, 1:]).sum(-1))
    d_i = jnp.arccos(cos_d) * sign
    return u_norm, a, d_i


def get_dis_list(xyz, cutoff):
    """All (i, j) pairs of the target geometry within ``cutoff`` plus their
    distances (parity: fold.py:93-108).  Host-side: the topology is fixed."""
    n = xyz.shape[1]
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    sel = ii != jj
    adj = np.stack([ii[sel], jj[sel]], axis=-1)
    d = np.asarray(compute_bond(jnp.asarray(xyz), jnp.asarray(adj)))
    keep = d.squeeze(0) < cutoff
    adj = adj[keep]
    return jnp.asarray(d[:, keep]), jnp.asarray(adj)


def train_fold(params, model_path=None, log=print, rng=None):
    """Fold a chain toward the helix; returns loss history + final frame.

    ``params`` keys follow the reference driver (fold.py:110-179 defaults):
    n_atoms, n_spiral, a_spiral, dz_spiral, loss_cutoff, k0, epsilon,
    sigma, n_atom_basis/n_filters/n_gaussians/n_convolutions/cutoff (GNN),
    T, method ('NH_verlet'|'verlet'|'rk4'), dt, tau, lr, l_b/l_a/l_d/l_dis,
    n_epochs.
    """
    rng = np.random.default_rng(0) if rng is None else rng
    n_atoms = params["n_atoms"]
    target_xyz = helix(params["n_spiral"], n_atoms, params["a_spiral"],
                       params["dz_spiral"])[None]
    target_xyz = jnp.asarray(target_xyz)

    bond_top = np.stack([np.arange(n_atoms - 1),
                         np.arange(1, n_atoms)], axis=-1)
    dis_targ, adj = get_dis_list(np.asarray(target_xyz),
                                 params["loss_cutoff"])
    b_targ, a_targ, d_targ = compute_intcoord(target_xyz)
    bond_len = float(b_targ[0, 0])

    positions, cell = straight_chain(n_atoms, bond_len)
    system = System(positions, cell)
    # params['T'] is in energy units (reference passes it straight to the
    # NHC, fold.py:168-171); convert to Kelvin for our API
    from .. import units
    T_kelvin = params["T"] / units.kB
    system.set_temperature(T_kelvin, rng=rng)

    gnn = SchNet({"n_atom_basis": params["n_atom_basis"],
                  "n_filters": params["n_filters"],
                  "n_gaussians": params["n_gaussians"],
                  "n_convolutions": params["n_convolutions"],
                  "cutoff": params["cutoff"]})
    # note: BondPotentials penalizes (r^2 - ro)^2 like the reference, so
    # ro is the *squared* bond length here (reference passes bond_len;
    # we keep its exact call shape, fold.py:141)
    ff = Stack({
        "gnn": GNNPotentials(system, gnn, cutoff=params["cutoff"]),
        "prior": BondPotentials(system, bond_top, params["k0"], bond_len),
        "pair": PairPotentials(system, pot_zoo.ExcludedVolume(
            epsilon=params["epsilon"], sigma=params["sigma"], power=10),
            cutoff=2.5, ex_pairs=bond_top),
    })
    if params["method"] in ("NH_verlet", "rk4"):
        integ = NoseHooverChain(ff, system, T=T_kelvin,
                                Q=50.0, num_chains=5, adjoint=True)
    else:
        integ = NVE(ff, system, adjoint=True)
    sim = Simulation(system, integ, wrap=False, method=params["method"])

    tau = params["tau"]
    ode = sim.epoch_fn(params["dt"], tau)
    ctrl = integ.default_ctrl()

    def loss_fn(p, state, aux):
        traj, faux = ode(p, state, aux, ctrl)
        q_t = traj.q
        b, a, d = compute_intcoord(q_t)
        dis = compute_bond(q_t, adj)
        loss = (params["l_b"] * ((b - b_targ.squeeze(0)) ** 2).mean()
                + params["l_a"] * ((a - a_targ.squeeze(0)) ** 2).mean()
                + params["l_d"] * ((d - d_targ.squeeze(0)) ** 2).mean()
                + params["l_dis"] * ((dis - dis_targ) ** 2).mean())
        last = jax.tree_util.tree_map(lambda x: x[-1], traj)
        return loss, (last, faux)

    vg = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    # train the GNN only (reference optimizes diffeq.parameters(); the
    # prior k0/epsilon/sigma are constructor floats there too)
    def label(path, _):
        return "train" if getattr(path[0], "key", None) == "gnn" \
            else "frozen"
    weights = sim.params
    labels = jax.tree_util.tree_map_with_path(label, weights)
    opt = optax.multi_transform(
        {"train": optax.adam(params["lr"]),
         "frozen": optax.set_to_zero()}, labels)
    opt_state = opt.init(weights)

    @jax.jit
    def _opt_step(grads, opt_state, params):
        # fused optimizer step (eager optax over the axon tunnel costs
        # hundreds of small dispatches per epoch; see fit_rdf.py)
        updates, new_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_state

    state, aux = sim.initial_state()
    loss_log = []
    for epoch in range(params["n_epochs"]):
        if epoch == 0:
            # warmup epoch: simulate without optimizing, exactly like the
            # reference's i==0 skip (fold.py:219) -- the straight chain's
            # internal coordinates are degenerate
            traj, aux = ode(weights, state, aux, ctrl)
            state = jax.lax.stop_gradient(
                jax.tree_util.tree_map(lambda x: x[-1], traj))
            continue
        (loss, (last, aux_new)), grads = vg(weights, state, aux)
        if not bool(jnp.isfinite(last.q).all()):
            log(f"NaN bailout at epoch {epoch}")
            return {"objective": 55.0, "nan_bailout": True,
                    "loss_log": loss_log}
        state, aux = jax.lax.stop_gradient(last), aux_new
        weights, opt_state = _opt_step(grads, opt_state, weights)
        loss_log.append(float(loss))
        log(f"epoch {epoch} | fold loss {float(loss):.6f}")

    return {"loss_log": loss_log, "params": weights,
            "final_frame": np.asarray(state.q),
            "target": np.asarray(target_xyz[0]),
            "objective": loss_log[-1] if loss_log else float("nan")}
