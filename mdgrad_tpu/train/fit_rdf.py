"""RDF-fitting driver: learn potentials from target g(r) via MD gradients.

Parity target: ``fit_rdf`` (/root/reference/scripts/fit_rdf_gnn.py:217-516):
build one system per thermodynamic state point, wrap a shared learnable
potential (SchNet / pairMLP / TpairMLP) plus a repulsive ExcludedVolume
prior in a Stack, thermostat with a Nose-Hoover chain (Q=50, 5 chains,
adjoint), and per training epoch: simulate tau steps -> soft-histogram RDF
of every 20th frame -> density-weighted shell MSE (+ JS diagnostic) ->
gradients through the trajectory -> Adam + reduce-on-plateau on the
learnable potential only (prior frozen).  Includes temperature annealing
(fit_rdf_gnn.py:392-399), NaN bailout returning a penalty objective
(:403-404), validation state points, and an 800-bin inference phase
(:483-509).

TPU-native notes: the per-epoch loss+grad is ONE jitted XLA program per
state point (scan over steps inside), reused across epochs; optimizer
masking (optax.multi_transform) replaces the reference's
"optimizer = Adam(net.parameters())" selection.
"""

import functools
import os
import json

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .. import units, potentials as pot_zoo
from ..topology import aux_overflow
from ..system import System
from ..lattice import ATOMS_PER_UNITCELL
from ..interface import (PairPotentials, TPairPotentials, GNNPotentials,
                         Stack)
from ..md import NoseHooverChain, MTSNoseHooverChain, Simulation
from ..observables import rdf as rdf_obs
from ..nn import SchNet, PairMLP, TPairMLP
from ..data import exp_rdf_data_dict, get_exp_rdf, get_unit_len
from .loss import JS_rdf, compute_D
from .pretrain import boltzmann_inversion_pretrain

WIDTH_DICT = {"tiny": 64, "low": 128, "mid": 256, "high": 512}


def _traj_finite(last):
    """Final-state finiteness of one epoch trajectory (module-level so
    recovery tests can inject failures, same as fit_rdf_multi's
    ``_states_finite``)."""
    return bool(jnp.isfinite(last.q).all())


def _dt_scale(entry):
    """dt is femtoseconds for physical-units registry targets and reduced
    time units for LJ-style reduced-units entries (see fit_rdf's dt
    note)."""
    return 1.0 if entry.get("reduced_units") else units.fs


def get_temp(T_start, T_equil, n_epochs, i, anneal_rate):
    """Annealing schedule (reference fit_rdf_gnn.py:119-120)."""
    return ((T_start - T_equil) * np.exp(-i * (1 / n_epochs) * anneal_rate)
            + T_equil)


def registry_T_kelvin(entry):
    """Registry temperatures are Kelvin for physical-units targets and
    kT in energy units for reduced-units targets (the reference passes
    the latter straight into its kB-multiplying thermostat from drivers
    that work in reduced units); convert to the Kelvin API uniformly."""
    from .. import units as u
    T = entry["T"]
    return T / u.kB if entry.get("reduced_units") else T


def get_system(data_tag, size, registry=None, rng=None):
    """Lattice-initialized System for a registry entry
    (parity: reference fit_rdf_gnn.py:61-82; 2-D stripe systems via the
    square lattice, fit_rdf_pair.py:124-155)."""
    registry = exp_rdf_data_dict if registry is None else registry
    entry = registry[data_tag]
    if entry.get("dim", 3) == 2:
        from ..lattice import square_lattice_2d
        positions, cell = square_lattice_2d(entry["rho"],
                                            entry.get("size", size))
        sys = System(positions, cell, dim=2)
        sys.masses = np.full(len(positions), entry.get("mass", 1.0))
        # stripe registries are reduced-units (kT passed as T)
        sys.set_temperature(entry["T"] / units.kB, rng=rng)
        return sys
    if entry.get("reduced_units"):
        # LJ-style number density (reference fit_rdf_pair.py:113)
        from ..data.registry import number_density_unit_len
        L = number_density_unit_len(entry["rho"], entry["N_unitcell"])
    else:
        L = get_unit_len(entry["rho"], entry["mass"], entry["N_unitcell"])
    sys = System.from_lattice(entry["cell"], size, L,
                              symbol=entry["element"])
    sys.masses = np.full(sys.get_number_of_atoms(), entry["mass"])
    sys.set_temperature(registry_T_kelvin(entry), rng=rng)
    return sys


def get_observer(system, data_tag, nbins, registry=None, backend="xla"):
    """(r_axis, g_obs, rdf observable) for a state point
    (parity: reference fit_rdf_gnn.py:101-117).

    backend="pallas" streams the soft histogram through the frame-batched
    Pallas kernel -- required for high-resolution training (e.g. a-Si at
    nbins=800 and N=512, where the dense (N, N, G) expansion would not
    fit; see ops/pallas_rdf.py)."""
    registry = exp_rdf_data_dict if registry is None else registry
    entry = registry[data_tag]
    fn = entry.get("fn") or entry["rdf_fn"]
    data = np.loadtxt(fn, delimiter=",")
    start, end = entry["start"], entry["end"]
    x, g_obs = get_exp_rdf(data, nbins, (start, end))
    obs = rdf_obs(system, nbins, (start, end), backend=backend)
    return x, jnp.asarray(g_obs), obs


def _build_net_and_prior(assignments, sys_params):
    """Learnable potential + frozen prior
    (parity: reference get_gnn_potential / get_pair_potential /
    get_tpair_potential, fit_rdf_gnn.py:124-183)."""
    cutoff = assignments["cutoff"]
    prior = pot_zoo.ExcludedVolume(
        epsilon=assignments["epsilon"], sigma=assignments["sigma"],
        power=assignments.get("power", 12))
    if sys_params.get("pair_flag") or sys_params.get("tpair_flag"):
        mlp_params = dict(
            n_gauss=int(cutoff // assignments["gaussian_width"]),
            r_start=0.0, r_end=cutoff,
            n_width=assignments["n_width"],
            n_layers=assignments["n_layers"],
            nonlinear=assignments["nonlinear"], res=False)
        net = (TPairMLP(**mlp_params) if sys_params.get("tpair_flag")
               else PairMLP(**mlp_params))
    else:
        def w(v):
            return WIDTH_DICT[v] if isinstance(v, str) else int(v)
        net = SchNet({
            "n_atom_basis": w(assignments["n_atom_basis"]),
            "n_filters": w(assignments["n_filters"]),
            "n_gaussians": int(cutoff // assignments["gaussian_width"]),
            "n_convolutions": assignments["n_convolutions"],
            "cutoff": cutoff, "trainable_gauss": False,
            "compute_dtype": assignments.get("compute_dtype", "float32")})
    return net, prior


def build_fit(assignments, sys_params, registry=None, rng=None):
    """Construct systems, simulators and observers for all state points
    (parity: reference build_simulators, fit_rdf_gnn.py:185-214).

    Returns a dict of fitting components shared by fit_rdf and tests.
    """
    registry = exp_rdf_data_dict if registry is None else registry
    size = sys_params["size"]
    cutoff = assignments["cutoff"]
    nbins = assignments["nbins"]
    train_list = list(sys_params["data"])
    all_sys = train_list + list(sys_params.get("val") or [])

    systems, sims, observers, targets, r_axes = [], [], [], [], []
    net, prior = _build_net_and_prior(assignments, sys_params)

    params = None
    for tag in all_sys:
        entry = registry[tag]
        system = get_system(tag, size, registry, rng=rng)
        T_kelvin = registry_T_kelvin(entry)
        if str(sys_params.get("anneal_flag")) == "True":
            system.set_temperature(assignments["start_T"], rng=rng)
        # share_prior_aux (GNN stacks): the prior consumes the GNN's
        # neighbor table via Stack(share_aux=...) instead of rebuilding
        # its own topology -- at 4096 atoms the prior's O(N^2) sparse
        # rebuild is 158 ms vs 7.6 ms for the whole cells-path rebuild
        # (benchmarks/bench_4k_budget.py components), ~80% of the fit
        # epoch.  Exact: table-mode PairPotentials re-masks by current
        # distance, so the donor's (cutoff + skin) build stays the
        # prior's own cutoff at evaluation.
        share = (bool(sys_params.get("share_prior_aux"))
                 and not (sys_params.get("pair_flag")
                          or sys_params.get("tpair_flag")))
        prior_int = PairPotentials(
            system, prior, cutoff=cutoff,
            mode="table" if share else sys_params.get("prior_mode",
                                                      "auto"))
        # MLP pair models default to the (N, K) table: dense mode's
        # (N, N, hidden) activations are HBM-bound at fit scale
        # (~13x the bytes; tpair epochs ran 28 s dense vs the table's
        # few seconds) while closed-form priors stay dense
        pmode = sys_params.get("pair_mode", "table")
        pslack = float(sys_params.get("capacity_slack", 1.6))
        if sys_params.get("pair_flag"):
            nn_int = PairPotentials(system, net, cutoff=cutoff, mode=pmode,
                                    capacity_slack=pslack)
        elif sys_params.get("tpair_flag"):
            nn_int = TPairPotentials(system, net, T_kelvin, cutoff=cutoff,
                                     mode=pmode, capacity_slack=pslack)
        else:
            nn_int = GNNPotentials(
                system, net, cutoff=cutoff,
                nbr_mode=sys_params.get("nbr_mode", "table"),
                capacity_slack=float(sys_params.get("capacity_slack",
                                                    1.6)),
                skin=float(sys_params.get("gnn_skin", 0.0)))
        stack = Stack({"nn": nn_int, "pair": prior_int},
                      share_aux={"pair": "nn"} if share else None)
        # Q=50 is the reference convention (md.py:191-193) and the
        # validated default at every fitted scale incl. 4096 atoms
        # (results/water_4k_r3).  For large-N MELT transients the Q/N
        # link masses cascade-diverge (size-8 a-Si) -- pass
        # sys_params['nhc_tau'] for canonical N-invariant MTK masses
        # instead (integrators.NoseHooverChain docstring).
        Q = float(sys_params.get("Q") or 50.0)
        nhc_tau = sys_params.get("nhc_tau")
        mts_k = int(sys_params.get("mts_inner", 0) or 0)
        # adjoint=True (replay) is the memory-safe default; direct
        # backprop through the scan (adjoint=False) stores activations
        # and saves the backward's step replay -- at N=512/tau=52 the
        # activations fit and the epoch is ~25% faster at identical
        # gradients (tests/test_adjoint.py, bench_headline_r5.py
        # 'direct'); prefer it when (N, tau) activations fit in HBM
        adj = bool(sys_params.get("adjoint", True))
        if mts_k > 1 and not (sys_params.get("pair_flag")
                              or sys_params.get("tpair_flag")):
            # r-RESPA: GNN force at the outer step, prior at dt/k inner
            # steps (md/integrators.MTSNoseHooverChain); callers scale
            # dt/opt_freq so the INNER step and the simulated window
            # match the single-rate config (fit_rdf does this)
            integ = MTSNoseHooverChain(
                stack, system, T=T_kelvin, Q=Q, tau=nhc_tau,
                num_chains=5,
                adjoint=adj, fast_keys=("pair",), n_inner=mts_k,
                topology_update_freq=sys_params.get(
                    "topology_update_freq", 1))
        else:
            integ = NoseHooverChain(
                stack, system, T=T_kelvin, Q=Q, tau=nhc_tau,
                num_chains=5,
                adjoint=adj,
                topology_update_freq=sys_params.get(
                    "topology_update_freq", 1))
        sim = Simulation(system, integ)
        if params is None:
            params = sim.params
        else:
            sim.params = params  # shared potential across state points
        x, g_obs, obs = get_observer(
            system, tag, nbins, registry,
            backend=assignments.get("rdf_backend", "xla"))
        systems.append(system)
        sims.append(sim)
        observers.append(obs)
        targets.append(g_obs)
        r_axes.append(x)

    return {"systems": systems, "sims": sims, "observers": observers,
            "targets": targets, "r_axes": r_axes, "net": net,
            "prior": prior, "params": params, "train_list": train_list,
            "all_sys": all_sys, "registry": registry}


def _make_epoch_loss(sim, obs, g_target, system, tau, dt, frame_skip=20,
                     kT_override=None, angle_extra=None):
    """One state point's differentiable epoch objective.

    kT_override grafts this state point's own kT into the (shared)
    TPairPotentials params -- build_fit shares one params pytree across
    state points, so the frozen params['nn']['kT'] leaf would otherwise be
    the FIRST tag's temperature for every system.

    angle_extra = (angle_distribution obs, target density, weight) adds an
    angle-distribution MSE term (the reference ships the water angle
    targets, scripts/data.py:33-46,1007, and imports angle_distribution in
    its GNN driver but never wires the loss; here it is a first-class
    target)."""
    ode = sim.epoch_fn(dt, tau)
    rho = system.get_number_of_atoms() / system.get_volume()
    rrange = jnp.linspace(float(obs.bins[0]), float(obs.bins[-1]),
                          obs.nbins)

    def loss_fn(params, state, aux, ctrl):
        if kT_override is not None:
            params = {**params,
                      "nn": {**params["nn"],
                             "kT": jnp.asarray(kT_override)}}
        traj, final_aux = ode(params, state, aux, ctrl)
        frames = traj.q[::frame_skip]
        _, _, g = obs(frames)
        loss = compute_D(g - g_target, rho, rrange)
        if angle_extra is not None:
            aobs, a_target, a_w = angle_extra
            _, a_count, _ = aobs(frames)
            loss = loss + a_w * ((a_count - a_target) ** 2).sum()
        last = jax.tree_util.tree_map(lambda x: x[-1], traj)
        return loss, (g, last, final_aux)

    return jax.jit(jax.value_and_grad(loss_fn, has_aux=True)), ode


def fit_rdf(assignments, sys_params, model_path=None, log=print,
            registry=None, rng=None):
    """Train; returns dict with loss trajectory and final RDFs
    (objective value matches the reference's return contract: final
    inference MSE summed over state points, or the NaN penalty)."""
    registry = exp_rdf_data_dict if registry is None else registry
    rng = np.random.default_rng(0) if rng is None else rng
    n_epochs = sys_params["n_epochs"]
    n_sim = sys_params.get("n_sim", 2)
    tau = assignments["opt_freq"]
    nbins = assignments["nbins"]
    frame_skip = sys_params.get("frame_skip", 20)
    # MTS: keep the INNER resolution and simulated window of the
    # single-rate config -- outer dt = dt * k, outer steps = tau / k
    mts_k = int(sys_params.get("mts_inner", 0) or 0)
    dt_mult = mts_k if mts_k > 1 else 1
    if dt_mult > 1:
        tau = max(2, tau // dt_mult)
        frame_skip = max(1, frame_skip // dt_mult)

    comps = build_fit(assignments, sys_params, registry, rng=rng)
    sims, observers, targets = (comps["sims"], comps["observers"],
                                comps["targets"])
    systems, all_sys = comps["systems"], comps["all_sys"]
    train_list = comps["train_list"]
    params = comps["params"]

    if model_path:
        os.makedirs(model_path, exist_ok=True)
        with open(os.path.join(model_path, "assignments.json"), "w") as f:
            json.dump({k: str(v) for k, v in assignments.items()}, f)

    # checkpoint/resume (SURVEY §5 gap: the reference never persists
    # optimizer state in its fitting loops)
    from .checkpoint import FitCheckpointer
    ckpt = FitCheckpointer(model_path, every=sys_params.get("ckpt_every", 10))
    resume = ckpt.restore()

    # params-only warm start from a saved fit checkpoint / best.pkl
    # (mirrors fit_rdf_pair's init_pkl): the optimizer and MD states
    # start fresh, only the learned subtree is grafted -- e.g. seed an
    # MTS fine-tune from a converged single-rate checkpoint
    init_pkl = sys_params.get("init_pkl")
    if resume is None and init_pkl:
        import pickle
        with open(init_pkl, "rb") as f:
            blob = pickle.load(f)
        init_p = blob["params"] if isinstance(blob, dict) and \
            "params" in blob else blob
        params["nn"] = jax.device_put(
            jax.tree_util.tree_map(jnp.asarray, init_p["nn"]))
        log(f"warm start (nn subtree) from {init_pkl}")

    # Boltzmann-inversion pretraining for pair models
    # (reference fit_rdf_gnn.py:254-349); skipped on resume -- the
    # checkpointed params already contain it
    if resume is None and not init_pkl and (
            sys_params.get("pair_flag") or sys_params.get("tpair_flag")):
        T_list = [registry_T_kelvin(registry[t]) for t in all_sys]
        rr_lo = min(registry[t]["start"] for t in all_sys)
        rr_hi = max(registry[t]["end"] for t in all_sys)
        pre_rrange = np.linspace(rr_lo + 0.5, rr_hi, 500)
        nn_params = params["nn"]["model"] if sys_params.get("tpair_flag") \
            else params["nn"]
        nn_params = boltzmann_inversion_pretrain(
            comps["net"], nn_params, comps["prior"], params["pair"],
            comps["r_axes"], targets, T_list, rrange=pre_rrange,
            n_iters=sys_params.get("pretrain_iters", 1000),
            temperature_dependent=bool(sys_params.get("tpair_flag")))
        if sys_params.get("tpair_flag"):
            params["nn"]["model"] = nn_params
        else:
            params["nn"] = nn_params

    # optimizer: train the learnable net only (prior & kT frozen),
    # Adam + reduce-on-plateau (reference fit_rdf_gnn.py:371-380)
    def label(path, _):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if keys and keys[0] == "nn" and "kT" not in keys:
            return "train"
        return "frozen"

    labels = jax.tree_util.tree_map_with_path(label, params)
    opt = optax.multi_transform(
        {"train": optax.chain(
            optax.clip_by_global_norm(assignments.get("grad_clip", 10.0)),
            optax.adam(assignments["lr"]),
            optax.contrib.reduce_on_plateau(
                factor=0.5, patience=25, min_scale=1e-4, atol=1e-5)),
         "frozen": optax.set_to_zero()}, labels)
    opt_state = opt.init(params)

    # one jitted program for the whole optimizer step: eager optax over
    # the axon tunnel costs hundreds of ~1 ms dispatches per epoch (more
    # than the MD itself); fused it is a single device call
    @jax.jit
    def apply_update(grads_acc, opt_state, params, total_loss, step_scale):
        updates, opt_state = opt.update(grads_acc, opt_state, params,
                                        value=total_loss)
        updates = jax.tree_util.tree_map(lambda u: u * step_scale, updates)
        return optax.apply_updates(params, updates), opt_state

    tree_add = jax.jit(functools.partial(jax.tree_util.tree_map, jnp.add))
    zero_grads = jax.jit(
        functools.partial(jax.tree_util.tree_map, jnp.zeros_like))(params)

    # Well-depth guard (pair/tpair families; same policy as
    # fit_rdf_multi): penalize u(r, kT) deepening past ``u_floor_mult``
    # x the pretrained depth.  Motivated by the r4 tpair fits walking
    # to unphysical (-3 eV, ~117 kT) wells and becoming dynamically
    # unstable (BENCH.md tpair close-out).
    u_reg_weight = float(sys_params.get("u_reg_weight", 0.0))
    reg_vg = None
    if u_reg_weight > 0 and (sys_params.get("pair_flag")
                             or sys_params.get("tpair_flag")):
        rr_lo = min(registry[t]["start"] for t in all_sys)
        reg_grid = jnp.linspace(rr_lo + 0.3, assignments["cutoff"],
                                200)[:, None]
        tflag = bool(sys_params.get("tpair_flag"))
        net_f, prior_f = comps["net"], comps["prior"]
        kT_list = jnp.asarray([registry_T_kelvin(registry[t]) * units.kB
                               for t in train_list])

        def _depth_of(p, kT):
            if tflag:
                u = net_f(p["nn"]["model"], reg_grid, kT)
            else:
                u = net_f(p["nn"], reg_grid)
            return (u.squeeze(-1)
                    + prior_f(p["pair"], reg_grid).squeeze(-1)).min()

        d0 = jnp.asarray([_depth_of(params, kT) for kT in kT_list])
        u_floor = float(sys_params.get("u_floor_mult", 1.5)) \
            * jnp.minimum(d0, 0.0)
        log(f"depth guard: pretrained depths {np.asarray(d0).round(3)}, "
            f"floors {np.asarray(u_floor).round(3)}")

        def _reg(p):
            d = jnp.stack([_depth_of(p, kT) for kT in kT_list])
            return u_reg_weight * (jax.nn.relu(u_floor - d) ** 2).sum()

        reg_vg = jax.jit(jax.value_and_grad(_reg))

    def _dt_for(tag):
        # (the reference's fit_rdf actually ignores its dt and integrates
        # at the 1 fs default, md.py:73); dt_mult > 1 = the MTS OUTER
        # step (sys_params dt stays the inner/base step)
        return sys_params["dt"] * _dt_scale(registry[tag]) * dt_mult

    # optional angle-distribution target (reference angle_data_dict,
    # scripts/data.py:1007; loss wiring is new -- the reference loads the
    # CSVs but never trains against them)
    angle_extras = [None] * len(all_sys)
    if sys_params.get("angle_flag"):
        from ..observables import angle_distribution
        from ..data import angle_data_dict, exp_angle_data
        a_cut = float(assignments.get("angle_cutoff", 3.7))
        a_nbins = int(assignments.get("angle_nbins", 64))
        a_range = (float(assignments.get("angle_start", 0.5)), float(np.pi))
        a_w = float(assignments.get("angle_weight", 1.0))
        species = sys_params.get("angle_species", "water")
        fn = sys_params.get("angle_fn") or angle_data_dict[species][a_cut]
        a_target = jnp.asarray(exp_angle_data(a_nbins, a_range, fn))
        for j, system in enumerate(systems):
            aobs = angle_distribution(
                system, a_nbins, a_range, cutoff=a_cut,
                k_max=int(sys_params.get("angle_k_max", 24)))
            angle_extras[j] = (aobs, a_target, a_w)

    loss_and_grads = []
    md_states = []
    for j, (tag, sim, obs, g_t, system) in enumerate(zip(
            all_sys, sims, observers, targets, systems)):
        kT_override = None
        if sys_params.get("tpair_flag"):
            kT_override = registry_T_kelvin(registry[tag]) * units.kB
        loss_and_grads.append(_make_epoch_loss(
            sim, obs, g_t, system, tau, _dt_for(tag), frame_skip,
            kT_override=kT_override, angle_extra=angle_extras[j]))
        md_states.append(sim.initial_state())

    loss_log, js_log = [], []
    start_epoch = 0
    if resume is not None:
        params = jax.device_put(resume["params"])
        if sys_params.get("reset_opt_on_resume"):
            # fresh optimizer over checkpointed params: lets a follow-up
            # phase (e.g. post-anneal equilibrium training) escape a
            # reduce-on-plateau scale that already collapsed to its floor
            opt_state = opt.init(params)
            log("optimizer state reset on resume")
        else:
            opt_state = jax.tree_util.tree_map(
                lambda _, new: jnp.asarray(new), opt_state,
                resume["opt_state"])
        md_states = [jax.device_put(s) for s in resume["md_states"]]
        loss_log = list(resume["logs"].get("loss_log", []))
        js_log = list(resume["logs"].get("js_log", []))
        start_epoch = resume["epoch"] + 1
        for sim in sims:
            sim.params = params
        log(f"resumed from checkpoint at epoch {resume['epoch']}")
    # overflow_policy: 'warn' logs and continues; 'skip' additionally
    # drops the epoch's parameter update -- gradients computed from a
    # neighbor-dropping trajectory are corrupt, not merely noisy;
    # 'regrow' also enlarges the overflowed neighbor capacities in
    # place (Interaction.grow_capacity), rebuilds aux from the epoch's
    # ENTRY state, and continues -- one recompile per regrow (shapes
    # are static per-compile), but the fit survives persistent
    # densification that 'skip' can only skip forever (the failure
    # that killed the r3 table-mode tpair runs at epoch 97,
    # results/r3_logs/water_tpair5.log)
    overflow_policy = sys_params.get("overflow_policy", "warn")
    regrow_factor = float(sys_params.get("regrow_factor", 1.5))
    # NaN recovery (same pattern as fit_rdf_multi/difftre): keep a
    # last-good snapshot; on a non-finite trajectory restore it, halve
    # the update scale and RETRY the epoch instead of abandoning the
    # fit (the r4 table-mode tpair regrow run died this way at epoch
    # 99 of 150, results/r4_logs/tpair_table_regrow.log)
    step_scale = 1.0
    last_good = (params, opt_state, list(md_states))
    # checkpoint-backtrack ring (same design as fit_rdf_multi): on a
    # non-finite epoch, last_good's params ARE the unstable iterate --
    # the update landed at the end of the previous clean epoch, so
    # momenta redraws and next-update scaling can never walk params
    # back.  Revert to an older verified snapshot after repeated
    # failures instead of burning the whole step-scale budget in place.
    snap_every = max(int(sys_params.get("backtrack_every", 10)), 1)
    backtrack_after = int(sys_params.get("backtrack_after", 2))
    max_backtracks = int(sys_params.get("max_backtracks", 8))
    snaps = []
    fails = 0
    backtracks = 0
    epoch = start_epoch
    while epoch < n_epochs:
        total_loss = 0.0
        grads_acc = zero_grads
        epoch_overflow = False
        epoch_nan_tag = None
        overflow_js = []
        js_entry_len = len(js_log)
        entry_states = list(md_states)
        for j, tag in enumerate(all_sys):
            sim = sims[j]
            integ = sim.integrator
            # temperature annealing (reference fit_rdf_gnn.py:392-399)
            if (str(sys_params.get("anneal_flag")) == "True"
                    and epoch % assignments.get("anneal_freq", 5) == 0):
                T_equil = registry_T_kelvin(registry[tag])
                new_T = get_temp(assignments["start_T"], T_equil, n_epochs,
                                 epoch, assignments.get("anneal_rate", 2.0))
                integ.update_T(new_T)
            ctrl = integ.default_ctrl()

            (vg, _) = loss_and_grads[j]
            state, aux = md_states[j]
            (loss, (g, last, final_aux)), grads = vg(
                params, state, aux, ctrl)

            if not _traj_finite(last):
                epoch_nan_tag = tag
                break
            # aux may be a Stack's dict of child auxes or a bare
            # NeighborList/NeighborTable NamedTuple; both carry overflow
            if aux_overflow(final_aux):
                log(f"WARNING: neighbor capacity overflow ({tag}, epoch "
                    f"{epoch}) -- results drop neighbors; raise "
                    "k_max/capacity_slack")
                overflow_js.append(j)
                if tag in train_list:
                    epoch_overflow = True

            md_states[j] = (jax.lax.stop_gradient(last), final_aux)
            if tag in train_list:
                total_loss += float(loss)
                js_log.append(float(JS_rdf(targets[j], g)))
                grads_acc = tree_add(grads_acc, grads)

        if epoch_nan_tag is not None:
            fails += 1
            step_scale *= 0.5
            # consecutive-failure OR step-scale-erosion trigger (the
            # fail/clean thrash pattern resets `fails` on every lucky
            # epoch while the scale budget bleeds out -- see
            # fit_rdf_multi and the r5d tpair postmortem)
            if ((fails >= backtrack_after or step_scale < 0.1)
                    and snaps and backtracks < max_backtracks):
                sn_epoch, sn_params, sn_opt, sn_states = snaps.pop()
                params, opt_state, md_states = (sn_params, sn_opt,
                                                list(sn_states))
                from ..md import rethermalize
                md_states = [
                    (rethermalize(s,
                                  registry_T_kelvin(registry[t]) * units.kB,
                                  sims[j].system.get_masses(), rng=rng,
                                  dim=sims[j].system.dim), a)
                    for j, ((s, a), t) in enumerate(zip(md_states,
                                                        all_sys))]
                for sim in sims:
                    sim.params = params
                last_good = (params, opt_state, list(md_states))
                backtracks += 1
                step_scale, fails = 0.25, 0
                del js_log[js_entry_len:]
                log(f"epoch {epoch} ({epoch_nan_tag}): non-finite "
                    f"persists; BACKTRACK to the epoch-{sn_epoch} "
                    f"snapshot ({len(snaps)} snapshots left, "
                    f"{max_backtracks - backtracks} backtracks left)")
                continue
            if step_scale < 1 / 64:
                log(f"NaN bailout at epoch {epoch} ({epoch_nan_tag}, "
                    "step_scale exhausted)")
                return {"objective": 5 - (epoch / n_epochs) * 5,
                        "nan_bailout": True, "loss_log": loss_log}
            params, opt_state, md_states = (
                last_good[0], last_good[1], list(last_good[2]))
            # fresh MB momenta: a deterministic NHC replay of the
            # restored snapshot reproduces a STATE-driven blowup
            # identically (md.integrators.rethermalize docstring)
            from ..md import rethermalize
            md_states = [
                (rethermalize(s,
                              registry_T_kelvin(registry[t]) * units.kB,
                              sims[j].system.get_masses(), rng=rng,
                              dim=sims[j].system.dim), a)
                for j, ((s, a), t) in enumerate(zip(md_states, all_sys))]
            for sim in sims:
                sim.params = params
            del js_log[js_entry_len:]
            log(f"epoch {epoch} ({epoch_nan_tag}): non-finite trajectory; "
                f"restored last-good + rethermalized, "
                f"step_scale -> {step_scale:g}")
            continue

        if overflow_js and overflow_policy == "regrow":
            if epoch_overflow:
                log(f"epoch {epoch}: parameter update skipped "
                    "(overflow_policy='regrow')")
            for j in overflow_js:
                model = sims[j].integrator.model
                entry_state, _ = entry_states[j]
                if model.grow_capacity(regrow_factor):
                    new_aux = model.aux_init(entry_state.q)
                    md_states[j] = (entry_state, new_aux)
                    log(f"regrow: {all_sys[j]} neighbor capacity grown; "
                        "epoch entry state restored (recompiles once)")
                else:
                    log(f"regrow: {all_sys[j]} already at maximum "
                        "capacity -- overflow is unrecoverable here")
        if epoch_overflow and overflow_policy in ("skip", "regrow"):
            if overflow_policy == "skip":
                log(f"epoch {epoch}: parameter update skipped "
                    "(overflow_policy='skip')")
        else:
            if reg_vg is not None:
                reg_l, reg_g = reg_vg(params)
                total_loss += float(reg_l)
                grads_acc = tree_add(grads_acc, reg_g)
            params, opt_state = apply_update(grads_acc, opt_state, params,
                                             jnp.asarray(total_loss),
                                             jnp.asarray(step_scale))
        fails = 0
        if epoch % snap_every == 0:
            # entry params of this verified-finite epoch (last_good still
            # holds them here) + the epoch's final MD states
            snaps.append((epoch, last_good[0], last_good[1],
                          list(md_states)))
            del snaps[:-3]
        last_good = (params, opt_state, list(md_states))
        # trust-region recovery: grow the halved scale back slowly after
        # clean epochs so one rough patch does not starve every later
        # retry budget (fit_rdf_multi has the same policy)
        step_scale = min(1.0, step_scale * 1.26)
        for sim in sims:
            sim.params = params
        loss_log.append(total_loss)
        log(f"epoch {epoch} | loss: {total_loss:.5f}")
        ckpt.maybe_save(epoch, params, opt_state, md_states,
                        {"loss_log": loss_log, "js_log": js_log})
        epoch += 1

    # inference: longer sampling, 800-bin RDF
    # (reference fit_rdf_gnn.py:471-509)
    results = {"loss_log": loss_log, "js_log": js_log, "final": {}}
    total = 0.0
    test_nbins = sys_params.get("test_nbins", 800)
    for j, tag in enumerate(all_sys):
        sim = sims[j]
        p_infer = params
        if sys_params.get("tpair_flag"):
            # evaluate u(r, kT) at THIS tag's temperature -- the shared
            # params carry one kT leaf (the first tag's); training uses
            # kT_override per state, so inference must too
            p_infer = {**params,
                       "nn": {**params["nn"],
                              "kT": jnp.asarray(
                                  registry_T_kelvin(registry[tag])
                                  * units.kB)}}
        sim.params = p_infer
        sim.state, sim.aux = md_states[j]
        # include the last training frame and skip non-finite rollout
        # frames: diverged inference runs must not poison the average (the
        # reference averages its whole position log, fit_rdf_gnn.py:483-496)
        frames = [np.asarray(md_states[j][0].q)]
        for _ in range(n_sim):
            traj = sim.simulate(steps=100, dt=_dt_for(tag), frequency=25)
            f = np.asarray(traj.q[-1])
            if np.isfinite(f).all():
                frames.append(f)
            else:
                log(f"inference rollout diverged for {tag}; frame skipped")
                sim.state, sim.aux = md_states[j]  # restart from last good
        # same backend as training: the fused-XLA observer materializes
        # (pairs, nbins) and compile-OOMs at 4k atoms x 800 bins (50 GB)
        x, g_obs, obs = get_observer(
            systems[j], tag, test_nbins, registry,
            backend=assignments.get("rdf_backend", "xla"))
        g_sim = np.mean([np.asarray(obs(jnp.asarray(f))[2])
                         for f in frames], axis=0)
        mse = float(((np.asarray(g_obs) - g_sim) ** 2).mean())
        results["final"][tag] = {"r": x, "g_sim": g_sim,
                                 "g_obs": np.asarray(g_obs), "mse": mse}
        if angle_extras[j] is not None:
            aobs, a_target, _ = angle_extras[j]
            _, a_count, _ = aobs(jnp.asarray(np.stack(frames)))
            results["final"][tag]["angle_sim"] = np.asarray(a_count)
            results["final"][tag]["angle_obs"] = np.asarray(a_target)
            results["final"][tag]["angle_mse"] = float(
                ((np.asarray(a_count) - np.asarray(a_target)) ** 2).mean())
        if model_path:
            np.savetxt(os.path.join(model_path, f"rdf_{tag}.csv"),
                       np.vstack([x, g_sim]), delimiter=",")
        total += mse
    results["objective"] = total
    results["params"] = params
    if model_path:
        np.savetxt(os.path.join(model_path, "loss.csv"),
                   np.asarray(loss_log))
        from .plots import plot_rdfs, plot_loss
        plot_loss(loss_log, model_path)
        for tag, fin in results["final"].items():
            plot_rdfs(fin["r"], fin["g_obs"], fin["g_sim"],
                      f"rdf_{tag}_final", model_path, pname="final")
    return results
