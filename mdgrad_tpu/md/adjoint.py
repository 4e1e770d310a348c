"""Fixed-grid ODE integration with adjoint (O(activations)-free) backprop.

Parity target: /root/reference/torchmd/sovlers.py:196-324
(``OdeintAdjointMethod``) and tinydiffeq.py:56-76 (fixed-grid loop).  The
reference's "O(1) backprop" stores the *solution trajectory* (one state per
time point, sovlers.py:208) and, in backward, re-integrates each interval in
reverse while accumulating vjps of the EOM wrt (state, params)
(sovlers.py:221-286) -- including hand-derived adjoint branches of the
symplectic steppers (sovlers.py:42-101,129-164).

The TPU-native replacement keeps the same memory profile (per-step *states*
only, never per-step activations) but is simpler and exact:

  forward: ``jax.lax.scan`` of the step function, collecting the state (and
  the neighbor aux actually used) at every step;

  backward: a reversed ``lax.scan`` that, at step i, re-runs ``jax.vjp`` of
  the *step function itself* at the stored (state_i, aux_i).  Because the
  stored state is the exact forward state (not a reverse-time
  reconstruction), gradients equal direct backprop through the scan to
  roundoff, while memory stays O(T x state) with zero stored activations --
  each step's internals (SchNet activations, pair matrices) are recomputed
  inside the vjp.  This subsumes the reference's hand-written symplectic
  adjoints: differentiating the stepper *is* the discrete adjoint.

Neighbor state (``aux``) is threaded as data: cotangents do not flow through
list construction, matching the reference's detached neighbor lists
(interface.py:259-260).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _is_float(v):
    return jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating)


def _zero_cotangent(pytree):
    """Zero cotangents for a pytree that may hold int/bool leaves."""
    def z(v):
        if _is_float(v):
            return jnp.zeros_like(v)
        # python-scalar leaves (e.g. a NeighborTable built with the
        # default drift=False) have no .shape
        return np.zeros(np.shape(v), dtype=jax.dtypes.float0)
    return jax.tree_util.tree_map(z, pytree)


def _zero_accumulator(pytree):
    """Float-typed accumulator: int/bool leaves (e.g. a Langevin noise
    counter in ctrl) get dummy f32 zeros so the pytree can ride a scan
    carry; they are converted back to float0 on exit."""
    def z(v):
        if _is_float(v):
            return jnp.zeros_like(v)
        return jnp.zeros(np.shape(v), dtype=jnp.float32)
    return jax.tree_util.tree_map(z, pytree)


def _ct_add(acc, ct):
    """Accumulate a cotangent, ignoring float0 entries (int/bool leaves)."""
    if hasattr(ct, "dtype") and ct.dtype == jax.dtypes.float0:
        return acc
    return jnp.add(acc, ct)


def _finalize_ct(primal, acc):
    """Convert accumulator entries for non-float primals back to float0."""
    def f(p, a):
        if _is_float(p):
            return a
        return np.zeros(np.shape(p), dtype=jax.dtypes.float0)
    return jax.tree_util.tree_map(f, primal, acc)


def make_odeint(step_fn, aux_update_fn, n_steps, update_freq=1,
                adjoint=True, reverse_step_fn=None,
                skip_first_refresh=False, wrap_fn=None, unroll=1):
    """Build ``odeint(params, state0, aux0, ctrl) -> (traj, final_aux)``.

    step_fn:       (params, state, aux, ctrl, i) -> state   (one dt step)
    aux_update_fn: (state, aux) -> aux                      (topology refresh)
    n_steps:       static step count; traj has n_steps + 1 frames (frame 0 is
                   state0), matching the reference where ``frequency`` time
                   points mean frequency-1 steps (md.py:80-81).
    update_freq:   refresh aux every k-th step (reference
                   topology_update_freq, md.py:125-129).
    adjoint:       True -> custom-vjp trajectory replay (activation-free;
                   stores one state+aux per step);
                   False -> plain scan autodiff (stores step activations,
                   the reference's adjoint=False direct-backprop mode).
    reverse_step_fn: optional (params, state, aux, ctrl, i) -> state that
                   *undoes* step i (e.g. the same symplectic stepper with
                   -dt).  When given (and adjoint=True), backward
                   reconstructs states by reverse-time integration instead
                   of reading stored frames -- true O(1) memory in
                   n_steps, the reference's OdeintAdjointMethod strategy
                   (sovlers.py:253-286).  Exact for time-reversible
                   steppers up to float roundoff accumulation; the stored-
                   frame replay (default) is bitwise-stable and preferred
                   unless memory demands otherwise.
    skip_first_refresh: caller guarantees ``aux0`` is already fresh at
                   ``state0`` (e.g. prime_state refreshed it); with
                   update_freq > 1 the step-0 rebuild is skipped (the
                   refresh schedule becomes i > 0 and i % freq == 0).
                   With update_freq == 1 it is ignored: avoiding one
                   duplicate (deterministic, identical) build is not worth
                   inserting an XLA conditional into every scan step.
    wrap_fn:       optional ``(state, aux) -> state`` applying periodic
                   wrapping to positions (gradient-safe: implementations
                   shift by a ``stop_gradient`` lattice vector, so the
                   Jacobian is the identity).  The aux argument lets
                   dynamic-cell models read their per-state cell from the
                   aux pytree -- wrap_fn must NOT close over traced values
                   (it is captured by a ``custom_vjp``, where escaped
                   tracers are an error).  wrap_fn may only depend on aux
                   through entries CONSTANT within the epoch (e.g. the
                   WithDynamicCell cell): the backward replay re-applies
                   it with the stored post-refresh aux.  Applied at the
                   SAME cadence and predicate as
                   the topology refresh, immediately before it, so frozen
                   minimum-image offsets are always built from the wrapped
                   representative they are used with.  This keeps long
                   single-epoch scans inside the single-image convention
                   (offsets in {-1,0,1}): without it, unwrapped diffusion
                   past ~1.5 L silently corrupts every minimum-image
                   distance (the round-4 DiffTRe sampling failure).

    unroll:        lax.scan unroll factor for the epoch scans (forward
                   and backward).  Semantics-preserving (XLA unrolls the
                   loop body; numerics identical) -- buys cross-step
                   fusion for fusion-count-bound epochs (N <~ 1k) at the
                   cost of compile time and, in direct mode, activation
                   memory.

    Gradients flow to params, state0 and ctrl; not through aux.
    """
    if reverse_step_fn is not None and adjoint:
        return _make_odeint_reverse(step_fn, reverse_step_fn,
                                    aux_update_fn, n_steps, update_freq,
                                    wrap_fn=wrap_fn, unroll=unroll)

    def _advance(i, state, aux):
        """Wrap (optional) + topology refresh, sharing one predicate."""
        if update_freq == 1:
            if wrap_fn is not None:
                state = wrap_fn(state, aux)
            return state, aux_update_fn(state, aux)
        pred = i % update_freq == 0
        if skip_first_refresh:
            pred = pred & (i > 0)
        if wrap_fn is None:
            aux = jax.lax.cond(pred,
                               lambda: aux_update_fn(state, aux),
                               lambda: aux)
            return state, aux

        def _do():
            s = wrap_fn(state, aux)
            return s, aux_update_fn(s, aux)

        return jax.lax.cond(pred, _do, lambda: (state, aux))

    def _bwd_wrap(i, state, aux):
        """Replay the forward wrap so the backward vjp re-runs step_fn at
        the exact state the forward consumed (stored frames are pre-wrap)."""
        if wrap_fn is None:
            return state
        if update_freq == 1:
            return wrap_fn(state, aux)
        pred = i % update_freq == 0
        if skip_first_refresh:
            pred = pred & (i > 0)
        return jax.lax.cond(pred, lambda: wrap_fn(state, aux),
                            lambda: state)

    def _forward(params, state0, aux0, ctrl):
        def body(carry, i):
            state, aux = carry
            state, aux = _advance(i, state, aux)
            new_state = step_fn(params, state, aux, ctrl, i)
            return (new_state, aux), (new_state, aux)

        (final_state, final_aux), (traj, auxs) = jax.lax.scan(
            body, (state0, aux0), jnp.arange(n_steps), unroll=unroll)
        full_traj = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0),
            state0, traj)
        return full_traj, final_aux, auxs

    if not adjoint:
        def odeint_direct(params, state0, aux0, ctrl):
            traj, final_aux, _ = _forward(params, state0, aux0, ctrl)
            return traj, final_aux
        return odeint_direct

    @jax.custom_vjp
    def odeint(params, state0, aux0, ctrl):
        traj, final_aux, _ = _forward(params, state0, aux0, ctrl)
        return traj, final_aux

    def odeint_fwd(params, state0, aux0, ctrl):
        traj, final_aux, auxs = _forward(params, state0, aux0, ctrl)
        # residuals: all pre-step states (traj[:-1]) + the aux used per step
        states_in = jax.tree_util.tree_map(lambda x: x[:-1], traj)
        return (traj, final_aux), (params, states_in, auxs, ctrl, aux0)

    def odeint_bwd(res, cts):
        params, states_in, auxs, ctrl, aux0 = res
        ct_traj, _ct_aux = cts  # aux cotangents are structurally zero

        ct_last = jax.tree_util.tree_map(lambda x: x[-1], ct_traj)
        ct_rest = jax.tree_util.tree_map(lambda x: x[:-1], ct_traj)
        zero_params = _zero_accumulator(params)
        zero_ctrl = _zero_accumulator(ctrl)

        def body(carry, xs):
            adj, dparams, dctrl = carry
            state_i, aux_i, ct_i, i = xs
            _, vjp = jax.vjp(
                lambda p, s, c: step_fn(p, _bwd_wrap(i, s, aux_i),
                                        aux_i, c, i),
                params, state_i, ctrl)
            dp, ds, dc = vjp(adj)
            dparams = jax.tree_util.tree_map(_ct_add, dparams, dp)
            dctrl = jax.tree_util.tree_map(_ct_add, dctrl, dc)
            adj = jax.tree_util.tree_map(jnp.add, ds, ct_i)
            return (adj, dparams, dctrl), None

        idx = jnp.arange(n_steps - 1, -1, -1)
        rev = lambda t: jax.tree_util.tree_map(lambda x: x[::-1], t)
        (adj, dparams, dctrl), _ = jax.lax.scan(
            body, (ct_last, zero_params, zero_ctrl),
            (rev(states_in), rev(auxs), rev(ct_rest), idx),
            unroll=unroll)
        return (_finalize_ct(params, dparams), adj,
                _zero_cotangent(aux0), _finalize_ct(ctrl, dctrl))

    odeint.defvjp(odeint_fwd, odeint_bwd)
    return odeint


def _make_odeint_reverse(step_fn, reverse_step_fn, aux_update_fn, n_steps,
                         update_freq, wrap_fn=None, unroll=1):
    """True O(1)-memory adjoint: reverse-time state reconstruction.

    Forward stores NOTHING but the endpoints (returned traj = [state0,
    final]); backward re-integrates the trajectory backwards with
    ``reverse_step_fn`` (the symplectic stepper at -dt, exploiting time
    reversibility) and vjp's each forward step at the reconstructed state
    -- exactly the reference's OdeintAdjointMethod strategy
    (sovlers.py:253-286), including its caveats: reconstruction drifts at
    float-roundoff rate, and the topology used for the reverse step is
    refreshed from the *current* reconstructed state.  Use for very long
    epochs with losses on the final state; the stored-frame replay is
    exact and preferred otherwise.

    Requires update_freq == 1 (topology refresh is re-derived per
    reconstructed state).
    """
    if update_freq != 1:
        raise ValueError("reverse-time adjoint requires "
                         "topology_update_freq == 1")

    def _forward(params, state0, aux0, ctrl):
        def body(carry, i):
            state, aux = carry
            if wrap_fn is not None:
                state = wrap_fn(state, aux)
            aux = aux_update_fn(state, aux)
            return (step_fn(params, state, aux, ctrl, i), aux), None

        (final, aux), _ = jax.lax.scan(body, (state0, aux0),
                                       jnp.arange(n_steps), unroll=unroll)
        traj = jax.tree_util.tree_map(
            lambda a, b: jnp.stack([a, b]), state0, final)
        return traj, aux

    @jax.custom_vjp
    def odeint(params, state0, aux0, ctrl):
        return _forward(params, state0, aux0, ctrl)

    def odeint_fwd(params, state0, aux0, ctrl):
        traj, final_aux = _forward(params, state0, aux0, ctrl)
        final = jax.tree_util.tree_map(lambda x: x[1], traj)
        return (traj, final_aux), (params, final, aux0, ctrl)

    def odeint_bwd(res, cts):
        params, final, aux0, ctrl = res
        ct_traj, _ = cts
        adj = jax.tree_util.tree_map(lambda x: x[1], ct_traj)
        ct_first = jax.tree_util.tree_map(lambda x: x[0], ct_traj)
        zero_params = _zero_accumulator(params)
        zero_ctrl = _zero_accumulator(ctrl)

        def body(carry, i):
            cur, aux, adj, dparams, dctrl = carry
            # reconstruct s_i by undoing step i (aux from the current
            # state, like the reference's backward re-integration).  With
            # wrap_fn, s_i is the wrapped representative of the forward
            # state -- physically identical (per-atom lattice shifts) and
            # exactly what forward's step consumed, since wrap's Jacobian
            # is the identity and the potential is lattice-periodic.
            if wrap_fn is not None:
                cur = wrap_fn(cur, aux)
            aux = aux_update_fn(cur, aux)
            s_i = reverse_step_fn(params, cur, aux, ctrl, i)
            if wrap_fn is not None:
                s_i = wrap_fn(s_i, aux)
            aux_i = aux_update_fn(s_i, aux)
            _, vjp = jax.vjp(
                lambda p, s, c: step_fn(p, s, aux_i, c, i),
                params, s_i, ctrl)
            dp, ds, dc = vjp(adj)
            dparams = jax.tree_util.tree_map(_ct_add, dparams, dp)
            dctrl = jax.tree_util.tree_map(_ct_add, dctrl, dc)
            return (s_i, aux_i, ds, dparams, dctrl), None

        (s0, _, adj, dparams, dctrl), _ = jax.lax.scan(
            body, (final, aux0, adj, zero_params, zero_ctrl),
            jnp.arange(n_steps - 1, -1, -1), unroll=unroll)
        adj = jax.tree_util.tree_map(jnp.add, adj, ct_first)
        return (_finalize_ct(params, dparams), adj,
                _zero_cotangent(aux0), _finalize_ct(ctrl, dctrl))

    odeint.defvjp(odeint_fwd, odeint_bwd)
    return odeint
