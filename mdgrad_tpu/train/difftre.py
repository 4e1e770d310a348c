"""Differentiable Trajectory Reweighting (DiffTRe) gradient engine.

Fits potential parameters to ensemble observables WITHOUT
differentiating through the MD trajectory (Thaler & Zavadlav,
"Learning neural network potentials from experimental data via
Differentiable Trajectory Reweighting", Nat. Commun. 12, 6884 (2021)).

Given F decorrelated states ``x_i`` sampled once from the canonical
ensemble of ``U_ref = U(theta_ref)``, any ensemble average under
perturbed parameters ``theta`` is the importance-weighted sum

    <O>_theta = sum_i w_i(theta) O_i,
    w_i = softmax_i( -(U_theta(x_i) - U_ref(x_i)) / kT ),

valid while the effective sample size stays close to F (the ``ess``
guard below).  Two kinds of observable compose:

* theta-INDEPENDENT per-frame values (RDF histograms): precomputed
  once; a gradient step then costs F *batched* energy evaluations --
  no adjoint, no sequential per-step MD work at all.  On TPU this
  replaces tau serially-dependent small kernels per gradient with a
  chunked scan of frame batches (lax.map batch_size=FRAME_CHUNK, each
  chunk checkpointed), which keeps the MXU fed while bounding HBM by
  one chunk -- the all-frames vmap variant compile-OOMed in round 3.
* theta-DEPENDENT per-frame values (the virial pressure): recomputed
  under the current theta and reweighted; still F-parallel.

Within one outer iteration the frames are FIXED, so the inner
optimization is deterministic -- no per-epoch trajectory/estimator
noise in the gradient.  That makes DiffTRe the right tool where
trajectory-gradient fits are estimator-noise-limited (the multi-state
LJ well-depth stall, BENCH.md round-3 log); the trade is that the
gradient is only trustworthy inside the overlap region of theta_ref
(the ESS guard triggers resampling).  The trajectory adjoint
(md/adjoint.py) remains the engine for dynamical observables (VACF)
and for driving the dynamics itself; the framework ships both.

The reference (torchmd/mdgrad) has no reweighting path anywhere --
every gradient there goes through the trajectory.

All per-outer arrays (frames, auxes, reference energies, per-frame
RDFs) travel as ARGUMENTS of one jitted value-and-grad built once per
fit, so resampling never recompiles (same F, N shapes).
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..md import rethermalize


# ---------------------------------------------------------------------------
# pure reweighting math (jit/vmap/grad-safe)
# ---------------------------------------------------------------------------

# Per-frame maps below are chunked scans (lax.map batch_size) with
# jax.checkpoint on the body: live intermediates are bounded by ONE
# chunk of frames, and the backward pass rematerializes per chunk.
# Round 3 ran these as all-frames vmap inside jit(value_and_grad) and
# compile-OOMed at workload scale (76.4 GB of f32[48,500,136,128]
# pairMLP temps vs 15.75 GB HBM, results/r3_logs/difftre_warm.log) --
# exactly the anti-pattern CLAUDE.md rule 7 forbids for grad-based
# per-frame observables.
FRAME_CHUNK = 8


def _map_frames(fn, frames, auxs, frame_chunk=FRAME_CHUNK):
    """lax.map of ``fn(q, aux)`` over the frame axis, chunked and
    checkpointed (CLAUDE.md rule 7)."""
    body = jax.checkpoint(lambda qa: fn(qa[0], qa[1]))
    return jax.lax.map(body, (frames, auxs),
                       batch_size=min(int(frame_chunk), frames.shape[0]))


def log_weights(interaction, kT, params, frames, auxs, u_ref,
                frame_chunk=FRAME_CHUNK):
    """Unnormalized log importance weights -(U_theta - U_ref)/kT."""
    u = _map_frames(lambda q, a: interaction.energy(params, q, a),
                    frames, auxs, frame_chunk)
    return -(u - u_ref) / kT


def ess_fraction(w):
    """Effective-sample-size fraction ESS/F = 1/(F sum w^2), in (0, 1]."""
    return 1.0 / (w.shape[0] * jnp.sum(w ** 2))


def config_pressures(interaction, kT, dim, cell_len, params, frames,
                     auxs, frame_chunk=FRAME_CHUNK):
    """Per-frame configurational pressure with the analytic kinetic
    part: P_i = (N_dof kT + W_i) / (dim V), W_i the strain-derivative
    virial (thermo.pressure with 2 KE -> its canonical average
    N_dof kT).  Differentiable in ``params``; the per-frame jvp-of-grad
    virial is the round-3 OOM culprit, so it rides the chunked
    checkpointed map."""
    cell_len = jnp.asarray(cell_len)
    volume = jnp.abs(jnp.prod(cell_len))
    n_dof = frames.shape[-2] * dim

    def virial(q, a):
        def scaled(eps):
            return interaction.energy(params, (1.0 + eps) * q, a,
                                      cell=(1.0 + eps) * cell_len)
        return -jax.grad(scaled)(0.0)

    w = _map_frames(virial, frames, auxs, frame_chunk)
    return (n_dof * kT + w) / (dim * volume)


# ---------------------------------------------------------------------------
# sampling + per-frame precompute
# ---------------------------------------------------------------------------

def sample_frames(sim, n_frames, steps_between, dt, equil_steps=0,
                  ctrl=None):
    """Run MD with the CURRENT ``sim.params`` and collect ``n_frames``
    decorrelated frames (one every ``steps_between`` steps).

    Plain host-loop sampling through ``Simulation.simulate`` (detached
    epochs, reference md.py:47-58 semantics) -- gradients never see this
    trajectory, so no adjoint machinery is involved.
    """
    if equil_steps:
        sim.simulate(steps=equil_steps, dt=dt, frequency=equil_steps,
                     ctrl=ctrl)
    frames = []
    for _ in range(int(n_frames)):
        traj = sim.simulate(steps=steps_between, dt=dt,
                            frequency=steps_between, ctrl=ctrl)
        frames.append(np.asarray(traj.q[-1]))
    return jnp.asarray(np.stack(frames))


def make_bundle(interaction, frames, params_ref, obs=None):
    """Precompute the per-outer arrays: stacked neighbor auxes, reference
    energies, and (optionally) per-frame RDFs.  Returns a dict pytree fit
    to pass through a jitted loss."""
    aux0 = interaction.aux_init(np.asarray(frames[0]))
    auxs = jax.jit(lambda fr: jax.lax.map(
        lambda q: interaction.aux_update(q, aux0), fr))(frames)
    u_ref = jax.jit(lambda fr, a: _map_frames(
        lambda q, ai: interaction.energy(params_ref, q, ai),
        fr, a))(frames, auxs)
    bundle = {"frames": frames, "auxs": auxs, "u_ref": u_ref}
    if obs is not None:
        bundle["g_frames"] = jax.jit(lambda fr: jax.lax.map(
            lambda q: obs(q)[2], fr))(frames)
    return bundle


class ReweightEstimator:
    """Convenience wrapper: one frame set, one interaction.

    ``weights(params)``/``frame_pressures(params)`` close over the
    precomputed bundle -- the simple API for single-state use and tests;
    the multi-state driver below uses the module-level functions with
    explicit bundle arguments instead (one compile per fit).
    """

    def __init__(self, interaction, frames, params_ref, kT, dim=3,
                 cell=None):
        self.interaction = interaction
        self.kT = float(kT)
        self.dim = int(dim)
        cell = None if cell is None else jnp.asarray(cell)
        self.cell_len = (None if cell is None
                         else (jnp.diag(cell) if cell.ndim == 2 else cell))
        b = make_bundle(interaction, frames, params_ref)
        self.frames, self.auxs, self.u_ref = (b["frames"], b["auxs"],
                                              b["u_ref"])

    def weights(self, params):
        lw = log_weights(self.interaction, self.kT, params, self.frames,
                         self.auxs, self.u_ref)
        w = jax.nn.softmax(lw)
        return w, ess_fraction(w)

    def frame_pressures(self, params):
        if self.cell_len is None:
            raise ValueError("pass cell= to ReweightEstimator for "
                             "pressure reweighting")
        return config_pressures(self.interaction, self.kT, self.dim,
                                self.cell_len, params, self.frames,
                                self.auxs)


def make_rdf_loss(est, g_frames, g_target, pressure_target=None,
                  pressure_weight=0.0):
    """Single-state reweighted loss over theta:
    ``loss(params) -> (scalar, dict(ess=..., g_hat=..., [p_hat=...]))``.
    MSE on the reweighted RDF plus optionally the reweighted
    configurational pressure (both share the weights)."""
    g_frames = jnp.asarray(g_frames)
    g_target = jnp.asarray(g_target)

    def loss_fn(params):
        w, ess = est.weights(params)
        g_hat = w @ g_frames
        loss = ((g_hat - g_target) ** 2).mean()
        out = {"ess": ess, "g_hat": g_hat}
        if pressure_weight and pressure_target is not None:
            p_hat = jnp.dot(w, est.frame_pressures(params))
            loss = loss + pressure_weight * (p_hat - pressure_target) ** 2
            out["p_hat"] = p_hat
        return loss, out

    return loss_fn


# ---------------------------------------------------------------------------
# multi-state outer/inner driver
# ---------------------------------------------------------------------------

def difftre_fit(sims, observers, targets, kTs, cells, opt, dt,
                n_outer=20, inner_steps=50, n_frames=40,
                steps_between=20, equil_steps=200, ess_min=0.9,
                pressure_targets=None, pressure_weight=0.0,
                dim=3, frame_chunk=FRAME_CHUNK, log=print,
                on_outer=None, on_best=None, rng=None):
    """Multi-state DiffTRe: sample with the current params, then take up
    to ``inner_steps`` deterministic gradient steps on the summed
    reweighted loss, resampling when any state's ESS fraction drops
    below ``ess_min``.

    sims/observers/targets/kTs/cells are per-state lists (the
    multi-state LJ layout of fit_rdf_pair).  Returns (params, history);
    history rows carry per-state reweighted RDF/pressure estimates of
    the final inner iterate.

    Best-model selection: each outer's uniform-weight loss (``loss0``,
    computed on FRESH frames sampled by that outer's entry params) is an
    unbiased estimate of the entry iterate's true loss -- the reweighted
    inner losses ride a collapsing effective sample and the FINAL
    iterate is whatever the last inner step left.  When ``on_best`` is
    given it is called as ``on_best(outer, loss0, entry_params)`` every
    time a new lowest ``loss0`` is seen, so drivers can checkpoint the
    best ITERATE rather than the last one.
    """
    import optax

    if inner_steps < 1:
        raise ValueError("inner_steps must be >= 1")
    interactions = [sim.integrator.model for sim in sims]
    kT_l = [float(k) for k in kTs]
    cell_l = [None if c is None else jnp.asarray(c) for c in cells]
    cl_l = [None if c is None
            else (jnp.diag(c) if c.ndim == 2 else c) for c in cell_l]
    tgt_l = [jnp.asarray(t) for t in targets]
    p_tgt = pressure_targets

    def total_loss(params, bundles):
        losses, esss, p_hats = [], [], []
        for i, b in enumerate(bundles):
            lw = log_weights(interactions[i], kT_l[i], params,
                             b["frames"], b["auxs"], b["u_ref"],
                             frame_chunk=frame_chunk)
            w = jax.nn.softmax(lw)
            esss.append(ess_fraction(w))
            g_hat = w @ b["g_frames"]
            loss = ((g_hat - tgt_l[i]) ** 2).mean()
            if pressure_weight and p_tgt is not None:
                p_i = config_pressures(interactions[i], kT_l[i], dim,
                                       cl_l[i], params, b["frames"],
                                       b["auxs"], frame_chunk=frame_chunk)
                p_hat = jnp.dot(w, p_i)
                p_hats.append(p_hat)
                loss = loss + pressure_weight * (p_hat - p_tgt[i]) ** 2
            losses.append(loss)
        aux = {"ess": jnp.min(jnp.asarray(esss)),
               "p_hat": (jnp.asarray(p_hats) if p_hats else None)}
        return jnp.sum(jnp.asarray(losses)), aux

    vg = jax.jit(jax.value_and_grad(total_loss, has_aux=True))

    params = sims[0].params
    opt_state = opt.init(params)
    history = []

    # Divergence guard.  One Adam step here moves the potential of EVERY
    # atom, so a too-aggressive step can walk the sampling MD into a
    # non-finite region (observed: r4 warm run, outer 4 -- and a NaN ESS
    # then bypassed the `ess < ess_min` comparison and poisoned the
    # params for the rest of the run).  On any non-finite sample/loss:
    # revert params, OPTIMIZER STATE and the per-sim MD states to the
    # last good snapshot, rethermalize (fresh MB momenta -- a replay of
    # the same snapshot is deterministic), halve the update scale
    # (applied to the POST-Adam updates -- Adam is invariant to grad
    # scaling) and re-equilibrate.  The r4 warm run (difftre_warm2.log)
    # showed why reverting params alone is not enough: `sim.state=None`
    # rebuilt from the LATTICE, which blows up under a deep learned
    # potential no matter the step scale (outers 4-10 failed
    # identically), and the un-reverted Adam momentum re-applied the
    # same bad direction.
    rng = np.random.default_rng(0) if rng is None else rng
    step_scale = 1.0
    step_scale_min = 1.0 / 64
    best_loss0 = float("inf")
    last_good = (params, opt_state, [None] * len(sims))
    need_equil = False

    def _revert(outer, why):
        nonlocal params, opt_state, step_scale, need_equil
        params, opt_state, good_states = last_good
        step_scale *= 0.5
        need_equil = True
        for i, (sim, st) in enumerate(zip(sims, good_states)):
            if st is None:
                # never sampled cleanly: lattice rebuild -- but with
                # FRESH MB momenta.  `sim.state = None` alone replays
                # the system's fixed initial velocities, so every retry
                # of an outer-0 sampling blowup fails identically (the
                # r4 warm5 run died this way: 5 reverts, all in
                # equilibration, before any parameter update existed)
                st, sim.aux = sim.initial_state()
            sim.state = rethermalize(
                st, kT_l[i], sim.system.get_masses(), rng=rng,
                dim=getattr(sim.system, "dim", 3))
        log(f"outer {outer:3d} | {why}; reverted params+opt, "
            f"rethermalized, step_scale -> {step_scale:g}")

    for outer in range(int(n_outer)):
        bundles = []
        bad = None
        for sim, obs in zip(sims, observers):
            sim.params = params
            frames = sample_frames(
                sim, n_frames, steps_between, dt,
                equil_steps if (outer == 0 or need_equil) else 0)
            if not np.all(np.isfinite(np.asarray(frames))):
                bad = "non-finite sampling"
                break
            bundles.append(make_bundle(sim.integrator.model, frames,
                                       params, obs=obs))
        if bad:
            _revert(outer, bad)
            if step_scale < step_scale_min:
                log("step_scale exhausted; stopping")
                break
            continue
        need_equil = False
        last_good = (params, opt_state, [sim.state for sim in sims])
        entry_params = params

        inner_done = 0
        loss = ess = loss0 = None
        for _ in range(int(inner_steps)):
            (loss, aux), grads = vg(params, bundles)
            ess = float(aux["ess"])
            if loss0 is None:
                # uniform-weight (ESS=1) loss at the sampling params --
                # the honest learning-curve value; later iterates'
                # reweighted losses ride a collapsing effective sample
                loss0 = float(loss)
            if not (np.isfinite(float(loss)) and np.isfinite(ess)):
                bad = f"non-finite loss ({float(loss)}) or ESS ({ess})"
                break
            if ess < ess_min:
                break
            updates, opt_state = opt.update(grads, opt_state, params)
            if step_scale != 1.0:
                updates = jax.tree_util.tree_map(
                    lambda u: u * step_scale, updates)
            params = optax.apply_updates(params, updates)
            inner_done += 1
        if bad:
            _revert(outer, bad)
            if step_scale < step_scale_min:
                log("step_scale exhausted; stopping")
                break
            continue
        # trust-region recovery: grow a halved step scale back slowly
        # after clean outers (same policy as fit_rdf/fit_rdf_multi)
        step_scale = min(1.0, step_scale * 1.26)
        if on_best is not None and loss0 < best_loss0:
            best_loss0 = loss0
            on_best(outer, loss0, entry_params)
        row = {"outer": outer, "loss": loss0, "loss_rw": float(loss),
               "ess": ess, "inner": inner_done, "step_scale": step_scale}
        if aux.get("p_hat") is not None:
            row["p_hat"] = np.asarray(aux["p_hat"]).tolist()
        history.append(row)
        log(f"outer {outer:3d} | loss {loss0:.6f} (rw {float(loss):.6f})"
            f" | min ESS/F {ess:.3f} | inner steps {inner_done}")
        if on_outer is not None:
            # per-outer checkpoint hook: a timeout/kill mid-fit must not
            # lose the run (each outer costs minutes of resampling MD)
            on_outer(outer, params, history)

    for sim in sims:
        sim.params = params
    return params, history
