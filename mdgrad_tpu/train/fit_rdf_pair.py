"""Pair-potential fitting to target RDF (+ VACF): the LJ/Yukawa/Morse
workloads.

Parity target: ``fit_lj`` (/root/reference/scripts/fit_rdf_pair.py:297-610):
model = Stack{pairMLP + LJFamily(eps=2, rep=6, attr=3) prior}
(fit_rdf_pair.py:355-358), NHC(Q=50, 5 chains) simulators per state point,
targets either loaded from the registry's rdf/vacf files or *self-generated*
by simulating the ground-truth analytic potential (``get_target_obs``,
fit_rdf_pair.py:159-204), per-epoch loss = rdf_weight * mean-MSE of the
per-frame-averaged RDF + vacf_weight * VACF MSE (fit_rdf_pair.py:455-510),
Adam + reduce-on-plateau on the MLP only, NaN bailout.

TPU-native: per-frame RDFs are one vmap (the reference loops frames in
Python "to save memory", fit_rdf_pair.py:454-462 -- on TPU the vmapped
soft histogram is a single fused program); the whole epoch loss+grad is one
jitted XLA program per state point.
"""

import os
import json

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .. import potentials as pot_zoo
from ..interface import PairPotentials, Stack
from ..md import NoseHooverChain, Simulation
from ..observables import rdf as rdf_obs_cls, vacf as vacf_obs_cls
from ..nn import PairMLP
from ..data import pair_data_dict, get_exp_rdf
from .fit_rdf import get_system, registry_T_kelvin
from .pretrain import boltzmann_inversion_pretrain

TARGET_POT_CLASSES = {
    "LennardJones": pot_zoo.LennardJones,
    "ExcludedVolume": pot_zoo.ExcludedVolume,
    "Yukawa": pot_zoo.Yukawa,
    "Morse": pot_zoo.Morse,
    "LJFamily": pot_zoo.LJFamily,
}


def resolve_target_pot(spec):
    """Registry entries carry ('ClassName', kwargs) specs."""
    if spec is None:
        return None
    if isinstance(spec, tuple):
        name, kw = spec
        if name == "SplineOverlap":
            return pot_zoo.spline_overlap(**kw)
        return TARGET_POT_CLASSES[name](**kw)
    return spec


def get_target_obs(system, entry, n_sim, rdf_range, nbins, t_range,
                   dt, skip=None, steps_per_sim=100, rng=None):
    """Simulate the ground-truth potential to generate target RDF/VACF
    (parity: reference fit_rdf_pair.py:159-204) -- plus the mean virial
    pressure, the auxiliary target that breaks the RDF-only well-depth
    degeneracy (the reference's Pressure observable is broken and never
    used, /root/reference/torchmd/thermo.py:17-54).

    ``skip`` (default ``max(2, n_sim // 3)``) is the equilibration
    prefix discarded before sampling.  It must SCALE with n_sim: a
    fixed skip=2 (200 steps from the lattice) leaves the dense-cold
    states under-equilibrated and their P target biased low by ~0.2
    (lj_0.845_0.75: short-protocol target 0.804 vs the low-noise
    validation's 1.046 for the same truth potential) -- and that state
    is exactly the one whose pressure pins the attractive-well depth
    (results/r3_logs/validate_lj_r3e.log)."""
    from .. import thermo
    if skip is None:
        skip = max(2, n_sim // 3)
    target_pot = resolve_target_pot(entry["target_pot"])
    pot_int = PairPotentials(system, target_pot, cutoff=2.5)
    integ = NoseHooverChain(pot_int, system, T=registry_T_kelvin(entry),
                            Q=50.0, num_chains=5, adjoint=False)
    sim = Simulation(system, integ)
    robs = rdf_obs_cls(system, nbins=nbins, r_range=rdf_range)
    vobs = vacf_obs_cls(system, t_range=t_range)
    masses = system.get_masses()
    cell = system.get_cell()
    tp = target_pot.init_params()
    p_fn = jax.jit(jax.vmap(lambda q, v: thermo.pressure(
        pot_int, tp, q, (), v, masses, cell, dim=system.dim)))
    gs, vacfs, ps = [], [], []
    for i in range(n_sim):
        traj = sim.simulate(steps_per_sim, dt=dt,
                            frequency=steps_per_sim)
        if i >= skip:
            _, _, g = robs(traj.q[-1])
            gs.append(np.asarray(g))
            vacfs.append(np.asarray(vobs(traj.v)))
            ps.append(float(p_fn(traj.q[::10], traj.v[::10]).mean()))
    return (np.mean(gs, axis=0), np.mean(vacfs, axis=0),
            float(np.mean(ps)))


def get_observer(system, data_tag, nbins, t_range, rdf_start,
                 registry=None, target_nsim=20, rng=None,
                 want_pressure=False):
    """(r_axis, rdf_target, rdf obs, vacf_target, vacf obs, P_target);
    loads file targets or self-generates (parity:
    fit_rdf_pair.py:206-248).  P_target comes from the ground-truth sim
    (self-generated entries), an explicit ``pressure`` registry field,
    or -- with ``want_pressure`` and a known ``target_pot`` -- a
    dedicated ground-truth simulation even when the RDF itself comes
    from a file; None otherwise."""
    registry = pair_data_dict if registry is None else registry
    entry = registry[data_tag]
    dt = entry.get("dt", 0.01)
    rdf_end = entry["end"]
    dim = entry.get("dim", 3)
    robs = rdf_obs_cls(system, nbins, (rdf_start, rdf_end))
    vobs = vacf_obs_cls(system, t_range=t_range)
    fn = entry.get("rdf_fn") or entry.get("fn")
    p_target = entry.get("pressure")
    if fn and os.path.exists(fn):
        rdf_data = np.loadtxt(fn, delimiter=",")
        vacf_target = None
        if entry.get("vacf_fn") and os.path.exists(entry["vacf_fn"]):
            vacf_target = np.loadtxt(entry["vacf_fn"],
                                     delimiter=",")[:t_range]
        if want_pressure and p_target is None and entry.get("target_pot"):
            _, _, p_target = get_target_obs(
                system, entry, target_nsim, (rdf_start, rdf_end), nbins,
                t_range, dt, rng=rng)
    else:
        g, vacf_target, p_gen = get_target_obs(
            system, entry, target_nsim, (rdf_start, rdf_end), nbins,
            t_range, dt, rng=rng)
        rdf_data = np.vstack([np.linspace(rdf_start, rdf_end, nbins), g])
        if p_target is None:
            p_target = p_gen
    x, rdf_target = get_exp_rdf(rdf_data, nbins, (rdf_start, rdf_end),
                                dim=dim)
    return (x, jnp.asarray(rdf_target), robs,
            None if vacf_target is None else jnp.asarray(vacf_target),
            vobs, p_target)


def fit_lj(assignments, sys_params, model_path=None, log=print,
           registry=None, rng=None):
    """Train a pairMLP + LJFamily prior against target RDF/VACF.

    Returns dict with loss history, final observables, and the recovered
    pair potential u(r) on a grid (for comparison against the ground
    truth, reference plot_pair fit_rdf_pair.py:266-295).
    """
    registry = pair_data_dict if registry is None else registry
    rng = np.random.default_rng(0) if rng is None else rng
    n_epochs = sys_params["n_epochs"]
    size = sys_params["size"]
    cutoff = sys_params["cutoff"]
    t_range = sys_params["t_range"]
    nbins = assignments["nbins"]
    tau = assignments["opt_freq"]
    frame_skip = sys_params.get("frame_skip", 5)
    train_list = list(sys_params["data"])
    all_sys = train_list + list(sys_params.get("val") or [])

    if model_path:
        os.makedirs(model_path, exist_ok=True)
        with open(os.path.join(model_path, "paramset.json"), "w") as f:
            json.dump({**{k: str(v) for k, v in sys_params.items()},
                       **{k: str(v) for k, v in assignments.items()}}, f,
                      indent=2)

    net = PairMLP(n_gauss=int(cutoff // assignments["gaussian_width"]),
                  r_start=0.0, r_end=cutoff,
                  n_width=assignments["n_width"],
                  n_layers=assignments["n_layers"],
                  nonlinear=assignments["nonlinear"])
    # soft-core prior (reference fit_rdf_pair.py:358); purely repulsive
    # variant for systems whose ground truth has no attraction (the 2-D
    # stripe SplineOverlap: an attractive prior at kT = 0.07 collapses
    # the lattice before the MLP can counteract it)
    prior_kind = assignments.get("prior", "ljfamily")
    if prior_kind == "repulsive":
        prior = pot_zoo.ExcludedVolume(
            epsilon=assignments.get("prior_epsilon", 1.0),
            sigma=assignments["sigma"],
            power=assignments.get("prior_power", 12))
    elif prior_kind == "gauss":
        # bounded soft core for bounded target families (2-D stripe)
        prior = pot_zoo.GaussianCore(
            epsilon=assignments.get("prior_epsilon", 2.0),
            sigma=assignments["sigma"])
    else:
        prior = pot_zoo.LJFamily(epsilon=2.0, sigma=assignments["sigma"],
                                 rep_pow=6, attr_pow=3)

    systems, sims, observers = [], [], []
    params = None
    for tag in all_sys:
        system = get_system(tag, size, registry, rng=rng)
        # the MLP runs on the (N, K) table (dense (N, N, hidden)
        # activations are the HBM bottleneck -- see PairPotentials
        # mode='table'); the closed-form prior stays dense
        stack = Stack({
            "pairnn": PairPotentials(
                system, net, cutoff=cutoff,
                mode=sys_params.get("pair_mode", "table"),
                # low-density (gas-branch) states see large local density
                # fluctuations: lj rho=0.3 overflowed the default-1.6
                # table mid-fit (results/r3_logs/lj_pressure3.log)
                capacity_slack=float(sys_params.get("capacity_slack",
                                                    1.6))),
            "pair": PairPotentials(system, prior, cutoff=2.5),
        })
        integ = NoseHooverChain(
            stack, system, T=registry_T_kelvin(registry[tag]), Q=50.0,
            num_chains=5,
            adjoint=True,
            topology_update_freq=sys_params.get("topology_update_freq", 1))
        sim = Simulation(system, integ)
        params = sim.params if params is None else params
        sim.params = params
        rdf_start = registry[tag].get("start", 0.75)
        observers.append(get_observer(
            system, tag, nbins, t_range, rdf_start, registry,
            target_nsim=sys_params.get("target_nsim", 8), rng=rng,
            want_pressure=float(assignments.get("pressure_weight",
                                                0.0)) > 0))
        systems.append(system)
        sims.append(sim)

    # checkpoint/resume (SURVEY §5 gap; see train/checkpoint.py)
    from .checkpoint import FitCheckpointer
    ckpt = FitCheckpointer(model_path, every=sys_params.get("ckpt_every", 10))
    resume = ckpt.restore()

    # warm start from a previous run's saved params (best.pkl /
    # best_eval.pkl layout: {"params": pytree, ...}) -- replaces the BI
    # pretrain so a fit can continue refining an already-validated
    # candidate under new hyperparameters (reference analog: the GNN
    # driver reloads prior model state, fit_rdf_gnn.py:368-369)
    init_pkl = sys_params.get("init_pkl")
    if resume is None and init_pkl:
        import pickle
        with open(init_pkl, "rb") as f:
            blob = pickle.load(f)
        init_p = blob["params"] if isinstance(blob, dict) and \
            "params" in blob else blob
        params["pairnn"] = jax.device_put(init_p["pairnn"])
        for sim in sims:
            sim.params = params
        log(f"warm start from {init_pkl}")

    # optional Boltzmann-inversion pretraining of the pairMLP against the
    # targets (the reference only pretrains in its GNN driver,
    # fit_rdf_gnn.py:254-298; the same warm start stabilizes multi-state
    # pair fits here); skipped on resume
    if resume is None and not init_pkl and sys_params.get("pretrain_iters", 0):
        # pretrain expects Kelvin (it multiplies kB itself); for reduced-
        # units entries registry_T_kelvin(T)*kB == the reduced kT, exact
        T_list = [registry_T_kelvin(registry[t]) for t in all_sys]
        r_lo = min(registry[t].get("start", 0.75) for t in all_sys)
        # bounded (gauss) priors have no hard wall to keep the MLP honest
        # below the data range, so constrain the regression further into
        # the core (the BI target there is the slope-continued
        # extrapolation from pretrain.boltzmann_inversion_targets)
        pre_lo = (0.5 * r_lo if prior_kind == "gauss"
                  else max(r_lo, 0.8 * assignments["sigma"]))
        pre_rrange = np.linspace(pre_lo, cutoff, 400)
        params["pairnn"] = boltzmann_inversion_pretrain(
            net, params["pairnn"], prior, params["pair"],
            [o[0] for o in observers], [o[1] for o in observers],
            T_list, rrange=pre_rrange,
            n_iters=sys_params["pretrain_iters"])
        for sim in sims:
            sim.params = params

    # optimizer on the MLP only (reference fit_rdf_pair.py:404)
    def label(path, _):
        return "train" if getattr(path[0], "key", None) == "pairnn" \
            else "frozen"

    labels = jax.tree_util.tree_map_with_path(label, params)
    opt = optax.multi_transform(
        {"train": optax.chain(
            optax.clip_by_global_norm(assignments.get("grad_clip", 10.0)),
            optax.adam(assignments["lr"]),
            optax.contrib.reduce_on_plateau(factor=0.5, patience=20,
                                            min_scale=1e-3, atol=5e-5)),
         "frozen": optax.set_to_zero()}, labels)
    opt_state = opt.init(params)

    # jitted optimizer step (eager optax over the axon tunnel dominates
    # epoch wall-clock otherwise; see fit_rdf.py)
    @jax.jit
    def apply_update(grads_acc, opt_state, params, total_loss):
        updates, opt_state = opt.update(grads_acc, opt_state, params,
                                        value=total_loss)
        return optax.apply_updates(params, updates), opt_state

    import functools as _ft
    tree_add = jax.jit(_ft.partial(jax.tree_util.tree_map, jnp.add))
    zero_grads = jax.jit(
        _ft.partial(jax.tree_util.tree_map, jnp.zeros_like))(params)

    # one jitted loss+grad per state point
    vgs, md_states = [], []
    use_vacf_list, use_press_list = [], []
    for j, tag in enumerate(all_sys):
        sim = sims[j]
        entry = registry[tag]
        dt = sys_params.get("dt") or entry.get("dt", 0.01)
        ode = sim.epoch_fn(dt, tau)
        x, g_t, robs, vacf_t, vobs, p_t = observers[j]
        rdf_w = assignments.get("rdf_weight", 1.0)
        vacf_w = assignments.get("vacf_weight", 0.0)
        use_vacf = (str(assignments.get("train_vacf", "False")) == "True"
                    and vacf_t is not None)
        # virial-pressure target: breaks the RDF-only well-DEPTH
        # degeneracy (g(r) pins the well position but leaves an
        # epsilon-direction soft mode; P is first-order in epsilon).
        # The reference intended this (thermo.py Pressure) but its
        # implementation is broken and unused.
        press_w = float(assignments.get("pressure_weight", 0.0))
        press_skip = int(assignments.get("pressure_frame_skip", 10))
        use_press = press_w > 0.0 and p_t is not None
        stack_model = sim.integrator.model
        masses_j = systems[j].get_masses()
        cell_j = systems[j].get_cell()
        dim_j = systems[j].dim

        def make(ode=ode, robs=robs, vobs=vobs, g_t=g_t, vacf_t=vacf_t,
                 use_vacf=use_vacf, rdf_w=rdf_w, vacf_w=vacf_w,
                 use_press=use_press, p_t=p_t, stack_model=stack_model,
                 masses_j=masses_j, cell_j=cell_j, dim_j=dim_j):
            from .. import thermo

            def loss_fn(p, state, aux, ctrl):
                traj, final_aux = ode(p, state, aux, ctrl)
                frames = traj.q[::frame_skip]
                # per-frame-averaged RDF (parity: fit_rdf_pair.py:454-462)
                g = jax.vmap(lambda q: robs(q)[2])(frames).mean(0)
                loss = rdf_w * ((g - g_t) ** 2).mean()
                vacf_sim = vobs(traj.v)
                if use_vacf:
                    loss = loss + vacf_w * (
                        (vacf_sim - vacf_t[:t_range]) ** 2).mean()
                if use_press:
                    # sequential (lax.map) + rematerialized per-frame
                    # virial on a coarser frame grid: the vmapped form
                    # materialized (F, N, N, hidden) PairMLP
                    # intermediates for EVERY frame at once -- 177 GB at
                    # tau=120/N=500 under the training grad (compile
                    # OOM).  The pressure estimator does not need every
                    # frame; frames decorrelate over ~10 steps.
                    pskip = press_skip
                    p_frames = traj.q[::pskip]
                    p_vels = traj.v[::pskip]

                    @jax.checkpoint
                    def frame_pressure(qv):
                        q, v = qv
                        # refresh the neighbor state at THIS frame: the
                        # epoch-entry aux is up to tau steps stale, and
                        # in mode='table' a stale (N, K) table drops
                        # migrated pairs from the virial (dense mode has
                        # no neighbor state, so this is free there)
                        fa = stack_model.aux_update(q, aux)
                        return thermo.pressure(
                            stack_model, p, q, fa, v, masses_j, cell_j,
                            dim=dim_j)

                    p_sim = jax.lax.map(frame_pressure,
                                        (p_frames, p_vels)).mean()
                    loss = loss + press_w * (p_sim - p_t) ** 2
                else:
                    p_sim = jnp.zeros(())
                last = jax.tree_util.tree_map(lambda a: a[-1], traj)
                return loss, (g, vacf_sim, p_sim, last, final_aux)
            return jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        vgs.append(make())
        md_states.append(sim.initial_state())
        use_vacf_list.append(use_vacf)
        use_press_list.append(use_press)

    # equilibration burn-in: run the MD forward (no parameter updates)
    # until every state point sits in the pretrained potential's own
    # equilibrium structure.  Without it the first gradient steps see
    # melting-lattice trajectories whose adjoint gradients push the
    # potential away from the (good) Boltzmann-inversion warm start --
    # the multi-state loss then climbs from ~0.08/state to ~0.4/state
    # and never recovers (round-1 "over-deepens" failure).
    burnin = int(sys_params.get("burnin_epochs", 0))
    if resume is None and burnin:
        for j, tag in enumerate(all_sys):
            state, aux = md_states[j]
            ctrl = sims[j].integrator.default_ctrl()
            for _ in range(burnin):
                (_, (_, _, _, last, aux)), _ = vgs[j](params, state,
                                                      aux, ctrl)
                state = jax.lax.stop_gradient(last)
            md_states[j] = (state, aux)
        log(f"burn-in: {burnin} epochs x {len(all_sys)} states equilibrated")

    # periodic state reset: sub-critical low-density state points
    # (e.g. LJ rho 0.3-0.5 at T 1.2 < Tc ~ 1.31) are METASTABLE uniform
    # fluids -- their reference targets are short homogeneous runs, but a
    # state carried across hundreds of epochs eventually nucleates a
    # droplet, the contact peak explodes, and the summed gradient drags
    # the shared potential away for every state.  Restoring the stored
    # post-burn-in snapshots every K epochs keeps sampling on the same
    # metastable branch the targets were generated from.
    reset_every = int(sys_params.get("state_reset_every", 0))

    # --- equilibrated evaluation for best-model selection ------------
    # The per-epoch training loss conflates potential quality with MD
    # state drift: after burn-in the states keep relaxing toward the
    # current potential's own equilibrium, so the loss is lowest at the
    # least-equilibrated (most target-like) EARLY epochs, and selecting
    # the best epoch by train loss systematically picks them (the
    # state_reset sawtooth in results/lj_multi_r3b/loss.txt is the
    # drift made visible).  With eval_every > 0, every K epochs the MD
    # states are branched, run eval_eq_epochs with frozen params, and
    # the observables are then AVERAGED over eval_sample_epochs before
    # scoring against the targets -- a low-noise estimate of the
    # current potential's equilibrium error (the
    # scripts/validate_lj_best.py protocol, in-loop).  best_eval.pkl
    # tracks the winner of THIS metric.
    eval_every = int(sys_params.get("eval_every", 0))
    eval_eq = int(sys_params.get("eval_eq_epochs", 4))
    eval_samp = int(sys_params.get("eval_sample_epochs", 8))
    rdf_w_g = assignments.get("rdf_weight", 1.0)
    vacf_w_g = assignments.get("vacf_weight", 0.0)
    press_w_g = float(assignments.get("pressure_weight", 0.0))

    def equilibrated_eval(params):
        total, detail = 0.0, {}
        for j, tag in enumerate(all_sys):
            _, g_t, _, vacf_t, _, p_t = observers[j]
            state, aux = md_states[j]  # branch: training states untouched
            ctrl = sims[j].integrator.default_ctrl()
            gs, vls, pls = [], [], []
            for i in range(eval_eq + eval_samp):
                (_, (g, vacf_sim, p_sim, last, aux)), _ = vgs[j](
                    params, state, aux, ctrl)
                state = jax.lax.stop_gradient(last)
                if i >= eval_eq:
                    gs.append(np.asarray(g))
                    vls.append(np.asarray(vacf_sim))
                    pls.append(float(p_sim))
            loss = rdf_w_g * float(
                ((np.mean(gs, axis=0) - np.asarray(g_t)) ** 2).mean())
            if use_vacf_list[j]:
                loss += vacf_w_g * float(
                    ((np.mean(vls, axis=0)
                      - np.asarray(vacf_t)[:t_range]) ** 2).mean())
            if use_press_list[j]:
                loss += press_w_g * float((np.mean(pls) - p_t) ** 2)
            detail[tag] = loss
            if tag in train_list:
                total += loss
        return total, detail

    eval_log = []

    loss_log, obs_log = [], {t: {"rdf": [], "vacf": []} for t in all_sys}
    start_epoch = 0
    if resume is not None:
        params = jax.device_put(resume["params"])
        opt_state = jax.tree_util.tree_map(
            lambda _, new: jnp.asarray(new), opt_state,
            resume["opt_state"])
        md_states = [jax.device_put(s) for s in resume["md_states"]]
        loss_log = list(resume["logs"].get("loss_log", []))
        obs_log = resume["logs"].get("obs_log", obs_log)
        start_epoch = resume["epoch"] + 1
        for sim in sims:
            sim.params = params
        log(f"resumed from checkpoint at epoch {resume['epoch']}")
    eq_states = ([jax.tree_util.tree_map(lambda a: a, s)
                  for s in md_states] if reset_every else None)
    for epoch in range(start_epoch, n_epochs):
        if (reset_every and epoch > start_epoch
                and (epoch - start_epoch) % reset_every == 0):
            md_states = [jax.tree_util.tree_map(lambda a: a, s)
                         for s in eq_states]
        total = 0.0
        grads_acc = zero_grads
        for j, tag in enumerate(all_sys):
            state, aux = md_states[j]
            ctrl = sims[j].integrator.default_ctrl()
            (loss, (g, vacf_sim, p_sim, last, faux)), grads = vgs[j](
                params, state, aux, ctrl)
            if not bool(jnp.isfinite(last.q).all()):
                log(f"NaN bailout at epoch {epoch} ({tag})")
                return {"objective": 5 - (epoch / n_epochs) * 5,
                        "nan_bailout": True, "loss_log": loss_log}
            from ..topology import aux_overflow
            if aux_overflow(faux):
                log(f"WARNING: neighbor capacity overflow ({tag}, epoch "
                    f"{epoch}) -- raise capacity/capacity_slack")
            md_states[j] = (jax.lax.stop_gradient(last), faux)
            obs_log[tag]["rdf"].append(np.asarray(g))
            obs_log[tag]["vacf"].append(np.asarray(vacf_sim))
            obs_log[tag].setdefault("pressure", []).append(float(p_sim))
            if tag in train_list:
                total += float(loss)
                grads_acc = tree_add(grads_acc, grads)
        # best-model bookkeeping BEFORE the update: the logged loss was
        # computed with the current params, so best.pkl must store these
        # params, not the post-update ones (off-by-one fixed round 3)
        ckpt.save_best(epoch, total, params)
        if eval_every and ((epoch - start_epoch) % eval_every == 0
                           or epoch == n_epochs - 1):
            e_loss, e_detail = equilibrated_eval(params)
            eval_log.append({"epoch": epoch, "loss": e_loss,
                             "detail": e_detail})
            log(f"epoch {epoch} | eval(eq) loss: {e_loss:.6f}")
            ckpt.save_best(epoch, e_loss, params, fname="best_eval.pkl")
        params, opt_state = apply_update(grads_acc, opt_state, params,
                                         jnp.asarray(total))
        for sim in sims:
            sim.params = params
        loss_log.append(total)
        log(f"epoch {epoch} | loss: {total:.6f}")
        ckpt.maybe_save(epoch, params, opt_state, md_states,
                        {"loss_log": loss_log, "obs_log": obs_log})

    # recovered potential on a grid (reference plot_pair)
    r_grid = np.linspace(0.3, cutoff, 250)
    u_fit = (np.asarray(net(params["pairnn"],
                            jnp.asarray(r_grid)[:, None])).squeeze(-1)
             + np.asarray(prior(params["pair"],
                                jnp.asarray(r_grid)[:, None])).squeeze(-1))
    u_fit = u_fit - u_fit[-1]
    target_spec = registry[train_list[0]].get("target_pot")
    u_target = None
    if target_spec is not None:
        tp = resolve_target_pot(target_spec)
        u_t = np.asarray(tp(tp.init_params(),
                            jnp.asarray(r_grid)[:, None])).squeeze(-1)
        u_target = u_t - u_t[-1]

    # best-epoch potential (trajectory fits oscillate around their noise
    # floor; best.pkl tracks the lowest-loss epoch).  When the
    # equilibrated eval ran, best_eval.pkl is the drift-free selection.
    def _load_best(fname):
        if not model_path or not os.path.exists(
                os.path.join(model_path, fname)):
            return None, None
        import pickle
        with open(os.path.join(model_path, fname), "rb") as f:
            info = pickle.load(f)
        bp = jax.device_put(info["params"])
        u = (np.asarray(net(bp["pairnn"],
                            jnp.asarray(r_grid)[:, None])).squeeze(-1)
             + np.asarray(prior(bp["pair"],
                                jnp.asarray(r_grid)[:, None])).squeeze(-1))
        return u - u[-1], info

    u_best, best_info = _load_best("best.pkl")
    u_best_eval, best_eval_info = _load_best("best_eval.pkl")

    results = {"loss_log": loss_log, "obs_log": obs_log, "params": params,
               "r_grid": r_grid, "u_fit": u_fit, "u_target": u_target,
               "u_best": u_best, "u_best_eval": u_best_eval,
               "best_epoch": best_info["epoch"] if best_info else None,
               "best_loss": best_info["loss"] if best_info else None,
               "best_eval_epoch": (best_eval_info["epoch"]
                                   if best_eval_info else None),
               "best_eval_loss": (best_eval_info["loss"]
                                  if best_eval_info else None),
               "eval_log": eval_log,
               "objective": loss_log[-1] if loss_log else float("nan")}
    if model_path:
        np.savetxt(os.path.join(model_path, "loss.txt"),
                   np.asarray(loss_log))
        np.savetxt(os.path.join(model_path, "potential.txt"),
                   np.vstack([r_grid, u_fit]))
        if u_best is not None:
            np.savetxt(os.path.join(model_path, "potential_best.txt"),
                       np.vstack([r_grid, u_best]))
        if eval_log:
            with open(os.path.join(model_path, "eval_log.json"), "w") as f:
                json.dump(eval_log, f, indent=2)
        if u_best_eval is not None:
            np.savetxt(os.path.join(model_path,
                                    "potential_best_eval.txt"),
                       np.vstack([r_grid, u_best_eval]))
        from .plots import plot_pair, plot_loss
        plot_pair(r_grid, u_fit, u_target, "final", model_path)
        if u_best is not None:
            plot_pair(r_grid, u_best, u_target, "best", model_path)
        if u_best_eval is not None:
            plot_pair(r_grid, u_best_eval, u_target, "best_eval",
                      model_path)
        plot_loss(loss_log, model_path)
    return results
