"""Concurrent multi-state-point RDF fitting: ALL state points in ONE
compiled, dp-sharded program.

The reference trains multi-state potentials by looping state points
serially inside each epoch (/root/reference/scripts/fit_rdf_gnn.py:388:
``for i, sim in enumerate(sim_list)`` -- one full GPU pass per
thermodynamic state).  This driver replaces that loop with the
generalized multi-state engine (parallel/multistate.py
``make_stack_multistate_fit``): states are stacked on a leading S axis,
vmapped through the LIBRARY NHC stepper (same physics as fit_rdf, same
force cache), and sharded over the mesh's ``dp`` axis -- gradients
arrive pre-summed.  On one chip the stacked program still wins (state
points fill the chip the serial loop leaves idle); on a pod slice each
state rides its own device.

Supports the same model families as fit_rdf (SchNet GNN stack above all
-- the flagship; pair/tpair MLPs work too since everything goes through
the Interaction contract).
"""

import os
import json

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .. import units
from ..interface import (PairPotentials, GNNPotentials, Stack,
                         WithDynamicCell)
from ..md import NoseHooverChain, Simulation
from ..parallel import make_mesh, make_stack_multistate_fit
from ..data import exp_rdf_data_dict
from .fit_rdf import (get_system, get_observer, registry_T_kelvin,
                      _build_net_and_prior, _dt_scale)
from .loss import JS_rdf


def build_multistate(assignments, sys_params, registry=None, rng=None):
    """Systems/targets for all state points + ONE dynamic-cell stack.

    All tags must share composition (same element / N_unitcell / size);
    the prototype interaction is built on the *densest* state point so
    the auto-derived neighbor capacity (k_max) covers every box.
    """
    registry = exp_rdf_data_dict if registry is None else registry
    size = sys_params["size"]
    cutoff = assignments["cutoff"]
    nbins = assignments["nbins"]
    train_list = list(sys_params["data"])

    net, prior = _build_net_and_prior(assignments, sys_params)

    systems, targets, r_axes, kTs, cell_lens, rhos = [], [], [], [], [], []
    rdf_range = None
    for tag in train_list:
        entry = registry[tag]
        system = get_system(tag, size, registry, rng=rng)
        systems.append(system)
        x, g_obs, _ = get_observer(system, tag, nbins, registry)
        targets.append(np.asarray(g_obs))
        r_axes.append(x)
        kTs.append(registry_T_kelvin(entry) * units.kB)
        cell_lens.append(np.diag(np.asarray(system.get_cell())))
        rhos.append(system.get_number_of_atoms() / system.get_volume())
        rr = (entry["start"], entry["end"])
        if rdf_range is None:
            rdf_range = rr
        elif rdf_range != rr:
            raise ValueError(f"state points disagree on rdf range: "
                             f"{rdf_range} vs {rr} ({tag})")

    n_atoms = {s.get_number_of_atoms() for s in systems}
    if len(n_atoms) != 1:
        raise ValueError(f"state points disagree on atom count: {n_atoms}")

    # prototype = densest box: its k_max bounds every state's neighbor count
    proto = systems[int(np.argmax(rhos))]
    prior_int = PairPotentials(proto, prior, cutoff=cutoff)
    if sys_params.get("tpair_flag"):
        # per-state kT is grafted into the replicated params inside the
        # vmapped body (make_stack_multistate_fit kT_to_params) -- the
        # temperature-transferable model's fit IS a multi-temperature
        # fit, so it belongs on this path (VERDICT r3 weak #5)
        from ..interface import TPairPotentials
        nn_int = TPairPotentials(
            proto, net, registry_T_kelvin(registry[train_list[0]]),
            cutoff=cutoff, mode=sys_params.get("pair_mode", "table"),
            capacity_slack=float(sys_params.get("capacity_slack", 2.0)))
    elif sys_params.get("pair_flag"):
        nn_int = PairPotentials(proto, net, cutoff=cutoff)
    else:
        nn_int = GNNPotentials(
            proto, net, cutoff=cutoff, nbr_mode="table",
            capacity_slack=float(sys_params.get("capacity_slack", 2.0)))
    stack = Stack({"nn": nn_int, "pair": prior_int})
    dyn = WithDynamicCell(stack, cell_lens[int(np.argmax(rhos))])
    integ = NoseHooverChain(
        dyn, proto, T=registry_T_kelvin(registry[train_list[0]]),
        Q=50.0, num_chains=5, adjoint=True,
        topology_update_freq=sys_params.get("topology_update_freq", 1))

    return {"systems": systems, "targets": np.stack(targets),
            "r_axes": r_axes, "kTs": np.asarray(kTs),
            "cell_lens": np.stack(cell_lens), "rhos": np.asarray(rhos),
            "net": net, "prior": prior, "stack": stack, "integ": integ,
            "train_list": train_list, "registry": registry,
            "rdf_range": rdf_range}


def _states_finite(finals):
    """Host-side finiteness gate for the NaN-recovery path (module-level
    so tests can inject a transient failure without poisoning the jitted
    train_step)."""
    return bool(jnp.isfinite(finals.q).all())


def _rethermalize_stack(states, comps, rng):
    """Fresh MB momenta for every state in the stacked pytree: the
    recovery path's deterministic replay of a restored snapshot
    reproduces a STATE-driven blowup identically (the r4 3-temp tpair
    run died this way at epoch 185 -- md.integrators.rethermalize)."""
    from ..md import rethermalize
    per = [rethermalize(jax.tree_util.tree_map(lambda x: x[j], states),
                        float(comps["kTs"][j]),
                        comps["systems"][j].get_masses(), rng=rng,
                        dim=comps["systems"][j].dim)
           for j in range(len(comps["systems"]))]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per)


def fit_rdf_multistate(assignments, sys_params, model_path=None, log=print,
                       registry=None, rng=None, mesh=None):
    """Train one shared potential against every state point concurrently.

    Mirrors fit_rdf's training semantics (Adam + plateau on the learnable
    net, frozen prior, NaN bailout, JS diagnostic, checkpoint/resume,
    800-bin inference) with the per-epoch state-point loop replaced by
    one sharded program.  ``mesh=None`` auto-builds a dp mesh over all
    visible devices that divides the state count (dp=1 on a single chip:
    the stacked one-chip program)."""
    registry = exp_rdf_data_dict if registry is None else registry
    rng = np.random.default_rng(0) if rng is None else rng
    n_epochs = sys_params["n_epochs"]
    tau = assignments["opt_freq"]
    nbins = assignments["nbins"]
    frame_skip = sys_params.get("frame_skip", 20)

    comps = build_multistate(assignments, sys_params, registry, rng=rng)
    integ = comps["integ"]
    train_list = comps["train_list"]
    S = len(train_list)

    if mesh is None:
        devs = jax.devices()
        dp = 1
        for cand in range(min(S, len(devs)), 0, -1):
            if S % cand == 0:
                dp = cand
                break
        mesh = make_mesh({"dp": dp}, devices=devs[:dp])
    log(f"multistate fit: {S} states on mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    # TPairPotentials: graft each state's own kT into the replicated
    # params inside the vmapped body (the vmapped counterpart of
    # fit_rdf's serial kT_override; the kT leaf is frozen below)
    kT_to_params = None
    if sys_params.get("tpair_flag"):
        def kT_to_params(p, kT):
            return {**p, "nn": {**p["nn"], "kT": kT}}

    dt = sys_params["dt"] * _dt_scale(registry[train_list[0]])

    params = integ.init_params()

    # Boltzmann-inversion pretraining for pair/tpair MLPs (the serial
    # driver's protocol, reference fit_rdf_gnn.py:254-349)
    if sys_params.get("pair_flag") or sys_params.get("tpair_flag"):
        from .pretrain import boltzmann_inversion_pretrain
        T_list = [registry_T_kelvin(registry[t]) for t in train_list]
        rr_lo = min(registry[t]["start"] for t in train_list)
        rr_hi = max(registry[t]["end"] for t in train_list)
        pre_rrange = np.linspace(rr_lo + 0.5, rr_hi, 500)
        tflag = bool(sys_params.get("tpair_flag"))
        nn_params = params["nn"]["model"] if tflag else params["nn"]
        nn_params = boltzmann_inversion_pretrain(
            comps["net"], nn_params, comps["prior"], params["pair"],
            comps["r_axes"], [jnp.asarray(t) for t in comps["targets"]],
            T_list, rrange=pre_rrange,
            n_iters=sys_params.get("pretrain_iters", 1000),
            temperature_dependent=tflag)
        if tflag:
            params = {**params, "nn": {**params["nn"], "model": nn_params}}
        else:
            params = {**params, "nn": nn_params}

    if model_path:
        os.makedirs(model_path, exist_ok=True)
        with open(os.path.join(model_path, "assignments.json"), "w") as f:
            json.dump({k: str(v) for k, v in assignments.items()}, f)

    # Well-depth guard (pair/tpair families): the r4 tpair-multistate
    # fit walked its u(r, kT) well from the pretrained depth to -3.0 eV
    # (~117 kT) and became dynamically unstable at epoch ~186 -- an
    # unphysical region no NaN-recovery can mask (BENCH.md tpair
    # close-out).  With ``u_reg_weight`` > 0 the loss adds
    # relu(u_floor - min_r u)^2 per state kT, where u_floor =
    # ``u_floor_mult`` x the pretrained depth: deepening beyond the
    # floor is penalized, reshaping above it is free.
    u_reg_weight = float(sys_params.get("u_reg_weight", 0.0))
    depth_reg = None
    if u_reg_weight > 0 and (sys_params.get("pair_flag")
                             or sys_params.get("tpair_flag")):
        start_r, end_r = comps["rdf_range"]
        reg_grid = jnp.linspace(start_r + 0.3, assignments["cutoff"],
                                200)[:, None]
        tflag = bool(sys_params.get("tpair_flag"))
        net_f, prior_f = comps["net"], comps["prior"]
        kTs_j = jnp.asarray(comps["kTs"])

        def depth_of(params, kT):
            if tflag:
                u = net_f(params["nn"]["model"], reg_grid, kT)
            else:
                u = net_f(params["nn"], reg_grid)
            u = u.squeeze(-1) + prior_f(params["pair"],
                                        reg_grid).squeeze(-1)
            return u.min()

        d0 = jnp.asarray([depth_of(params, kT) for kT in kTs_j])
        u_floor = float(sys_params.get("u_floor_mult", 1.5)) \
            * jnp.minimum(d0, 0.0)
        log(f"depth guard: pretrained depths {np.asarray(d0).round(3)}"
            f", floors {np.asarray(u_floor).round(3)}")

        def depth_reg(params):
            d = jnp.stack([depth_of(params, kT) for kT in kTs_j])
            return (jax.nn.relu(u_floor - d) ** 2).sum()

    # optimizer: learnable net only (prior & any kT leaf frozen), Adam +
    # reduce-on-plateau -- same selection as fit_rdf
    def label(path, _):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if keys and keys[0] == "nn" and "kT" not in keys:
            return "train"
        return "frozen"

    labels = jax.tree_util.tree_map_with_path(label, params)
    # Plateau schedule: reduce_on_plateau compares against the GLOBAL
    # best loss, so a transient spike after a lucky low epoch keeps
    # firing forever -- the r5 tpair rerun spiked at epochs 100-125 and
    # the schedule collapsed the lr to min_scale=1e-4, freezing the fit
    # at a flat plateau for its last 150 epochs
    # (results/r5_logs/tpair_multi_r5.log).  Defend with (a) a cooldown
    # so consecutive firings are spaced, (b) accumulation over several
    # epochs so one noisy trajectory draw can't trigger or veto a
    # firing, and (c) a min_scale that keeps late-run learning alive.
    # lr_schedule='cosine' replaces the plateau with a deterministic
    # cosine decay to cosine_alpha x lr over the run -- the schedule
    # that killed fit_salt's late-run overshoot oscillation
    # (results/salt_r5).  Trajectory-fit losses are noisy single draws,
    # so a loss-reactive schedule can both misfire (the r5 tpair lr
    # collapse) and fail to temper late-run steps; a time-based decay
    # does the tempering unconditionally.
    lr_schedule = str(sys_params.get("lr_schedule", "plateau"))
    if lr_schedule == "cosine":
        train_tx = optax.chain(
            optax.clip_by_global_norm(assignments.get("grad_clip", 10.0)),
            optax.adam(optax.cosine_decay_schedule(
                assignments["lr"], decay_steps=max(int(n_epochs), 1),
                alpha=float(sys_params.get("cosine_alpha", 0.05)))))
    else:
        train_tx = optax.chain(
            optax.clip_by_global_norm(assignments.get("grad_clip", 10.0)),
            optax.adam(assignments["lr"]),
            optax.contrib.reduce_on_plateau(
                factor=0.5,
                patience=int(sys_params.get("plateau_patience", 30)),
                cooldown=int(sys_params.get("plateau_cooldown", 30)),
                accumulation_size=int(sys_params.get("plateau_accum", 5)),
                min_scale=float(sys_params.get("plateau_min_scale", 0.05)),
                atol=1e-5))
    opt = optax.multi_transform(
        {"train": train_tx, "frozen": optax.set_to_zero()}, labels)
    opt_state = opt.init(params)

    def build_train_step(dt_scale=1.0):
        # rebuilt after a capacity regrow: the table k_max is a static
        # shape baked into the traced program (model.aux_init runs INSIDE
        # the vmapped epoch body), so unlike fit_rdf -- where the aux is
        # a train_step ARGUMENT and a bigger table retraces by shape --
        # growing it here requires a fresh trace of the whole step.
        # ``dt_scale`` < 1 is the dt-backoff recovery mode: a rough
        # mid-training potential that cannot hold a tau-step trajectory
        # at full dt usually CAN at dt/2 -- the blowup mechanism is
        # integration error, which param rewinds alone do not address.
        loss_fn = make_stack_multistate_fit(
            integ, dt=dt * dt_scale, n_steps=max(int(tau) - 1, 1),
            nbins=nbins,
            rdf_range=comps["rdf_range"], mesh=mesh,
            frame_skip=frame_skip, loss_type="shell",
            kT_to_params=kT_to_params)

        def objective(params, states):
            loss, aux_out = loss_fn(
                params, states, comps["cell_lens"], comps["kTs"],
                comps["targets"], comps["rhos"])
            if depth_reg is not None:
                loss = loss + u_reg_weight * depth_reg(params)
            return loss, aux_out

        @jax.jit
        def train_step(params, opt_state, states, step_scale):
            (loss, (losses, gs, finals, overflow)), grads = \
                jax.value_and_grad(objective, has_aux=True)(params, states)
            updates, opt_state = opt.update(grads, opt_state, params,
                                            value=loss)
            # post-Adam update scale: halved by the NaN-recovery path
            # (Adam is invariant to grad scaling, so this is the lr knob)
            updates = jax.tree_util.tree_map(lambda u: u * step_scale,
                                             updates)
            params = optax.apply_updates(params, updates)
            return loss, params, opt_state, losses, gs, finals, overflow

        return train_step

    train_step = build_train_step()

    # stacked initial states (one MB draw per state)
    proto_state = integ.initial_state()
    q0 = jnp.asarray(np.stack([s.get_positions() for s in comps["systems"]]))
    v0 = jnp.asarray(np.stack([s.get_velocities()
                               for s in comps["systems"]]))
    states = jax.vmap(lambda q, v: proto_state._replace(q=q, v=v))(q0, v0)

    from .checkpoint import FitCheckpointer
    ckpt = FitCheckpointer(model_path, every=sys_params.get("ckpt_every", 10))
    resume = ckpt.restore()
    loss_log, js_log = [], []
    start_epoch = 0
    if resume is not None:
        params = jax.device_put(resume["params"])
        opt_state = jax.tree_util.tree_map(
            lambda _, new: jnp.asarray(new), opt_state, resume["opt_state"])
        states = jax.device_put(resume["md_states"])
        loss_log = list(resume["logs"].get("loss_log", []))
        js_log = list(resume["logs"].get("js_log", []))
        start_epoch = resume["epoch"] + 1
        log(f"resumed from checkpoint at epoch {resume['epoch']}")

    # overflow_policy (same contract as fit_rdf): 'warn' logs and
    # continues; 'skip' additionally drops the epoch's parameter update
    # (gradients from a neighbor-dropping trajectory are corrupt, not
    # merely noisy); 'regrow' grows the SHARED neighbor capacity
    # (interface.grow_capacity -- one prototype table serves all states),
    # restores the epoch's entry snapshot, rebuilds the jitted step (the
    # table shape is trace-static here) and RETRIES the epoch.  The r4
    # 3-temp tpair resume died at epoch 186-187 to exactly this: the
    # 368 K state densified past slack 2.0 and the corrupted forces
    # NaN'd through every step-halving retry (results/r4_logs/
    # tpair_multi3.log).
    overflow_policy = sys_params.get("overflow_policy", "warn")
    regrow_factor = float(sys_params.get("regrow_factor", 1.5))
    # NaN recovery (same pattern as train/difftre.py): keep a last-good
    # snapshot; on a non-finite epoch restore it, halve the update
    # scale and continue instead of abandoning the fit (the r4 3-temp
    # tpair run died this way at epoch 185 of 500, mid-descent)
    step_scale = 1.0
    last_good = (params, opt_state, states)
    bailed_at = None
    # Checkpoint-backtrack recovery (the r5 tpair_multi_r5b lesson,
    # BENCH.md queue-8 postmortem): when an epoch goes non-finite, the
    # last_good params ARE the params that are blowing up -- the update
    # that produced them landed at the end of the previous clean epoch,
    # and halving step_scale only shrinks the NEXT update.  Momenta
    # redraws alone cannot escape dynamically-unstable params, so after
    # ``backtrack_after`` failed retries at one epoch we revert params +
    # opt_state + states to a RING of older verified snapshots (entry
    # params of clean epochs, every ``backtrack_every`` epochs) and
    # resume training from there -- converting what used to be a hard
    # bailout into a walk-back.
    snap_every = max(int(sys_params.get("backtrack_every", 10)), 1)
    backtrack_after = int(sys_params.get("backtrack_after", 2))
    max_backtracks = int(sys_params.get("max_backtracks", 8))
    snaps = []          # ring of (epoch, params, opt_state, states)
    fails = 0           # consecutive non-finite retries at this epoch
    backtracks = 0
    # dt-backoff recovery (opt-in): when a backtrack fires, ALSO halve
    # the training integration dt for the next ``dt_hold`` clean epochs
    # -- the blowup is an integration failure of the current rough
    # potential, and halving dt doubles the stability margin where
    # momenta redraws and param rewinds only re-roll the dice.  Each
    # engage/restore retraces the step once (same precedent as regrow).
    # Best-iterate selection is gated to full-dt epochs so the EMA
    # compares like-for-like loss estimators.
    dt_backoff = bool(sys_params.get("dt_backoff", False))
    dt_hold = int(sys_params.get("dt_hold", 20))
    dt_scale_now = 1.0
    dt_clean = 0
    # LIVE best-iterate selection (VERDICT r4 item 2): trajectory fits
    # oscillate around their noise floor and can degrade late (the r4
    # tpair run's loss rose 5.86 -> 12.5 over its last 8 epochs, and
    # inference ran from the final iterate).  Track an EMA-smoothed loss
    # -- a single epoch's loss is one noisy trajectory draw; selecting
    # its raw minimum rewards estimator noise (the NPT lesson, VERDICT
    # r4 weak #7) -- and snapshot the ENTRY params (the iterate the loss
    # actually measured) plus that epoch's final MD states whenever the
    # EMA makes a new low.
    ema_alpha = float(sys_params.get("best_ema_alpha", 0.6))
    ema = None
    best = {"loss": float("inf"), "params": None, "states": None,
            "epoch": -1}
    epoch = start_epoch
    while epoch < n_epochs:
        entry = (params, opt_state, states)
        loss, new_params, new_opt_state, losses, gs, finals, overflow =             train_step(params, opt_state, states, step_scale)
        if not _states_finite(finals):
            fails += 1
            step_scale *= 0.5
            # two triggers: consecutive failures at one epoch, OR
            # step-scale erosion -- the r5d run thrashed fail/clean/
            # fail/clean for 12 epochs (fails reset on every lucky
            # clean epoch, x0.5 per failure beat x1.26 per clean) and
            # exhausted the scale budget with 29 backtracks unused
            if ((fails >= backtrack_after or step_scale < 0.1)
                    and snaps and backtracks < max_backtracks):
                sn_epoch, params, opt_state, states = snaps.pop()
                states = _rethermalize_stack(states, comps, rng)
                last_good = (params, opt_state, states)
                backtracks += 1
                # re-enter the hazardous region gently: 0.25 takes ~5
                # clean epochs of x1.26 grow-back to return to full
                # step size (the r5c run re-approached at 0.5 and blew
                # up within 2-6 epochs each time)
                step_scale, fails = 0.25, 0
                if dt_backoff and dt_scale_now == 1.0:
                    dt_scale_now, dt_clean = 0.5, 0
                    train_step = build_train_step(dt_scale_now)
                    log(f"epoch {epoch}: dt-backoff engaged -- training "
                        f"dt halved for the next {dt_hold} clean epochs "
                        "(recompiles once)")
                log(f"epoch {epoch}: non-finite persists; BACKTRACK to "
                    f"the epoch-{sn_epoch} snapshot (params + opt state "
                    f"reverted, momenta rethermalized; {len(snaps)} "
                    f"snapshots left, {max_backtracks - backtracks} "
                    "backtracks left)")
                continue
            if step_scale < 1 / 64:
                # exhausted: the CURRENT params are dynamically unstable
                # (momenta redraws + tiny updates all blow up -- the r4
                # tpair_multi4 run died this way at epoch 186 even with
                # overflow fixed).  Salvage: fall through to inference
                # with the last-good snapshot instead of returning
                # nothing (the trained 180+ epochs are still a model).
                log(f"NaN bailout at epoch {epoch} (step_scale "
                    "exhausted); salvaging inference from last-good")
                params, opt_state, states = last_good
                bailed_at = epoch
                break
            params, opt_state, states = last_good
            states = _rethermalize_stack(states, comps, rng)
            log(f"epoch {epoch}: non-finite state; restored last-good "
                f"+ rethermalized, step_scale -> {step_scale:g}")
            continue
        over_js = np.nonzero(np.asarray(overflow))[0].tolist()
        if over_js:
            log(f"WARNING: neighbor capacity overflow at epoch {epoch} "
                f"(states {over_js}) -- raise capacity_slack")
            if overflow_policy == "regrow":
                if integ.model.grow_capacity(regrow_factor):
                    params, opt_state, states = entry
                    train_step = build_train_step(dt_scale_now)
                    log(f"regrow: shared neighbor capacity grown; epoch "
                        f"{epoch} entry restored and retried "
                        "(recompiles once)")
                    continue
                log("regrow: already at maximum capacity -- overflow "
                    "is unrecoverable here")
            elif overflow_policy == "skip":
                log(f"epoch {epoch}: parameter update skipped "
                    "(overflow_policy='skip')")
                new_params, new_opt_state = params, opt_state
        ema = float(loss) if ema is None \
            else ema_alpha * ema + (1.0 - ema_alpha) * float(loss)
        if ema < best["loss"] and dt_scale_now == 1.0:
            best = {"loss": ema, "params": params, "states": finals,
                    "epoch": epoch}
            ckpt.save_best(epoch, ema, params)
        fails = 0
        if dt_scale_now < 1.0:
            dt_clean += 1
            if dt_clean >= dt_hold:
                dt_scale_now = 1.0
                train_step = build_train_step(1.0)
                log(f"epoch {epoch}: dt-backoff released -- full "
                    "training dt restored (recompiles once)")
        if epoch % snap_every == 0:
            # snapshot the ENTRY params/opt_state (just verified by this
            # finite epoch) with the epoch's final MD states
            snaps.append((epoch, params, opt_state,
                          jax.lax.stop_gradient(finals)))
            del snaps[:-3]
        params, opt_state = new_params, new_opt_state
        last_good = (params, opt_state, finals)
        # trust-region recovery: a rough patch halves step_scale, but a
        # permanently-shrunk scale starves every LATER retry budget (the
        # r4 tpair resume entered epoch 186 at 0.5 and had only three
        # halvings left) -- grow back slowly after each clean epoch
        step_scale = min(1.0, step_scale * 1.26)
        states = jax.lax.stop_gradient(finals)
        loss_log.append(float(loss))
        js_log.append([float(JS_rdf(jnp.asarray(comps['targets'][j]),
                                    gs[j])) for j in range(S)])
        log(f"epoch {epoch} | loss: {float(loss):.5f} | per-state: "
            + " ".join(f"{float(l):.4f}" for l in losses))
        ckpt.maybe_save(epoch, params, opt_state, states,
                        {"loss_log": loss_log, "js_log": js_log})
        epoch += 1

    # inference: per state point, standard single-system rollout at the
    # 800-bin resolution (same protocol as fit_rdf:420-457); val tags
    # (sys_params['val']) are held-out state points evaluated with the
    # trained params but never trained on -- the transferability check
    select = sys_params.get("select", "best")
    final_params, final_states = params, states
    if select == "best" and best["params"] is not None:
        fin = f"{loss_log[-1]:.5f}" if loss_log else "n/a"
        log(f"inference from LIVE-selected best iterate: epoch "
            f"{best['epoch']} (ema loss {best['loss']:.5f}); final-epoch "
            f"loss was {fin}")
        params, states = best["params"], best["states"]
    results = {"loss_log": loss_log, "js_log": js_log, "final": {},
               "params": params, "best_epoch": best["epoch"],
               "best_ema_loss": best["loss"],
               "selected": ("best" if (select == "best"
                                       and best["params"] is not None)
                            else "final")}
    if bailed_at is not None:
        results["nan_bailout"] = True
        results["bailout_epoch"] = bailed_at
    test_nbins = sys_params.get("test_nbins", 800)
    n_sim = sys_params.get("n_sim", 2)
    val_list = list(sys_params.get("val") or [])
    val_systems = {t: get_system(t, sys_params["size"], registry, rng=rng)
                   for t in val_list}
    cutoff = assignments["cutoff"]

    def infer_all(params, states):
        """Rollout inference for every tag with the given iterate.

        Returns (final, total, all_ok): per-tag results, the summed
        train-tag mse, and whether every tag produced at least one
        finite frame.  A tag whose rollouts ALL diverge gets mse=nan
        instead of crashing the driver (the r5 tpair rerun died in
        np.vstack on a zero-frame held-out state,
        results/r5_logs/tpair_multi_r5.log)."""
        final, total, all_ok = {}, 0.0, True
        for j, tag in enumerate(train_list + val_list):
            if tag in val_systems:
                system = val_systems[tag]
                state_j = None
            else:
                system = comps["systems"][j]
                state_j = jax.tree_util.tree_map(lambda x: x[j], states)
            prior_int = PairPotentials(system, comps["prior"],
                                       cutoff=cutoff)
            p_infer = params
            if sys_params.get("tpair_flag"):
                from ..interface import TPairPotentials
                nn_int = TPairPotentials(system, comps["net"],
                                         registry_T_kelvin(registry[tag]),
                                         cutoff=cutoff)
                # evaluate u(r, kT) at THIS tag's temperature (params
                # carry one shared kT leaf; training grafts per state,
                # so must inference)
                p_infer = {**params, "nn": {**params["nn"],
                                            "kT": jnp.asarray(nn_int.kT0)}}
            elif sys_params.get("pair_flag"):
                nn_int = PairPotentials(system, comps["net"],
                                        cutoff=cutoff)
            else:
                nn_int = GNNPotentials(system, comps["net"], cutoff=cutoff)
            stack_j = Stack({"nn": nn_int, "pair": prior_int})
            integ_j = NoseHooverChain(stack_j, system,
                                      T=registry_T_kelvin(registry[tag]),
                                      Q=50.0, num_chains=5, adjoint=False)
            sim = Simulation(system, integ_j, params=p_infer)
            if state_j is not None:
                sim.state = state_j
                sim.aux = integ_j.aux_init(state_j.q)
                frames = [np.asarray(state_j.q)]
            else:
                # held-out state: equilibrate from the lattice first,
                # and GATE on finiteness -- an unguarded divergent
                # equilibration poisons last_good, so every later
                # "restart from last good" restarts from NaN
                for attempt in range(3):
                    sim.simulate(steps=300, dt=dt, frequency=100)
                    if np.isfinite(np.asarray(sim.state.q)).all():
                        break
                    log(f"held-out equilibration diverged for {tag} "
                        f"(attempt {attempt}); rebuilding from the "
                        "lattice with fresh momenta")
                    system = get_system(tag, sys_params["size"],
                                        registry, rng=rng)
                    sim = Simulation(system, integ_j, params=p_infer)
                frames = []
            last_good = (sim.state, sim.aux)
            for _ in range(n_sim):
                traj = sim.simulate(steps=100, dt=dt, frequency=25)
                f = np.asarray(traj.q[-1])
                if np.isfinite(f).all():
                    frames.append(f)
                    last_good = (sim.state, sim.aux)
                else:
                    log(f"inference rollout diverged for {tag}; frame "
                        "skipped, restarting from last good state")
                    sim.state, sim.aux = last_good
            x, g_obs, obs = get_observer(system, tag, test_nbins,
                                         registry)
            g_obs = np.asarray(g_obs)
            if frames:
                g_sim = np.mean([np.asarray(obs(jnp.asarray(f))[2])
                                 for f in frames], axis=0)
                mse = float(((g_obs - g_sim) ** 2).mean())
            else:
                log(f"inference produced NO finite frames for {tag}; "
                    "mse recorded as nan")
                g_sim = np.full_like(g_obs, np.nan)
                mse = float("nan")
                all_ok = False
            final[tag] = {"r": x, "g_sim": g_sim, "g_obs": g_obs,
                          "mse": mse, "held_out": tag in val_systems}
            if tag not in val_systems:
                total += mse
        return final, total, all_ok

    final, total, all_ok = infer_all(params, states)
    if not all_ok and results["selected"] == "best":
        # the selected iterate cannot even be rolled out on some state:
        # fall back to the final-epoch iterate rather than reporting a
        # divergent model as the run's product
        log("selected best iterate diverged at inference; falling back "
            "to the final-epoch iterate")
        final_f, total_f, ok_f = infer_all(final_params, final_states)
        if ok_f:
            final, total = final_f, total_f
            results["selected"] = "final-fallback"
            results["params"] = final_params
        else:
            log("final-epoch iterate also diverged at inference; "
                "keeping the best-iterate results")
    results["final"] = final
    results["objective"] = total
    for tag, fin in final.items():
        if fin["held_out"]:
            results.setdefault("val_mse", {})[tag] = fin["mse"]
    if model_path:
        for tag, fin in final.items():
            np.savetxt(os.path.join(model_path, f"rdf_{tag}.csv"),
                       np.vstack([fin["r"], fin["g_sim"]]), delimiter=",")
        np.savetxt(os.path.join(model_path, "loss.csv"),
                   np.asarray(loss_log))
        from .plots import plot_rdfs, plot_loss
        plot_loss(loss_log, model_path)
        for tag, fin in final.items():
            plot_rdfs(fin["r"], fin["g_obs"], fin["g_sim"],
                      f"rdf_{tag}_final", model_path, pname="final")
    return results
