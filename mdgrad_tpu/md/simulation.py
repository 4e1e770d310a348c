"""Simulation driver: epoch-chunked MD with logging and restarts.

Parity target: ``torchmd.md.Simulations`` (/root/reference/torchmd/md.py:14-96):
``simulate(steps, dt, frequency)`` chops the run into ``steps // frequency``
epochs; each epoch integrates ``frequency`` time points (frequency - 1
steps), logs the last frame, restarts from it (optionally wrapping
positions, md.py:63-67), and returns the trajectory of the *final* epoch.
Epoch boundaries truncate gradient flow exactly like the reference's
detached logs (md.py:47-58): each epoch is its own BPTT window.

TPU-native structure: the whole epoch is ONE jitted program (a
``lax.scan`` built by :func:`mdgrad_tpu.md.adjoint.make_odeint`), compiled
once per (dt, frequency, method) and reused across epochs -- versus the
reference's per-step Python loop dispatching hundreds of CUDA kernels.
Fitting drivers use :meth:`epoch_fn` directly to differentiate an epoch;
:meth:`simulate` is the host-side convenience for running MD.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .. import units


def _wrap_positions(q, cell):
    cell = jnp.asarray(cell)
    hp = jax.lax.Precision.HIGHEST
    frac = jnp.matmul(q, jnp.linalg.inv(cell), precision=hp)
    return jnp.matmul(frac % 1.0, cell, precision=hp)


class Simulation:

    def __init__(self, system, integrator, wrap=True, method=None,
                 params=None):
        self.system = system
        self.integrator = integrator
        self.wrap = wrap
        self.method = method or integrator.default_method
        self.keys = integrator.state_keys
        self.params = integrator.init_params() if params is None else params
        self.log = {k: [] for k in self.keys}
        self.state = None
        self.aux = None
        self._ode_cache = {}

    # -- functional surface for fitting drivers ------------------------------
    def epoch_fn(self, dt, frequency):
        """Jitted ``odeint(params, state0, aux0, ctrl) -> (traj, aux)``
        integrating one epoch of ``frequency - 1`` steps."""
        key = (float(dt), int(frequency), self.method,
               self.integrator.adjoint)
        if key not in self._ode_cache:
            integ = self.integrator
            can_prime = (getattr(integ, "force_cache", False)
                         and hasattr(integ, "prime_state")
                         and self.method in ("verlet", "NH_verlet",
                                             "langevin"))

            def step_fn(params, state, aux, ctrl, i):
                if can_prime:
                    return integ.step(params, state, aux, ctrl, i * dt,
                                      dt, method=self.method, primed=True)
                return integ.step(params, state, aux, ctrl, i * dt, dt,
                                  method=self.method)

            def aux_update(state, aux):
                # barostatted integrators carry the cell in the state and
                # rebuild topology against it (NPTBerendsenNHC)
                if hasattr(integ, "aux_update_state"):
                    return integ.aux_update_state(state, aux)
                return integ.aux_update(state.q, aux)

            reverse_step = None
            if integ.adjoint == "reverse":
                # time-reversed stepper: true O(1)-memory adjoint
                # (see adjoint._make_odeint_reverse)
                def reverse_step(params, state, aux, ctrl, i):
                    return integ.step(params, state, aux, ctrl, i * dt,
                                      -dt, method=self.method)

            ode = make_odeint_cached(step_fn, aux_update,
                                     n_steps=max(int(frequency) - 1, 1),
                                     update_freq=integ.topology_update_freq,
                                     adjoint=bool(integ.adjoint),
                                     reverse_step_fn=reverse_step,
                                     skip_first_refresh=can_prime)
            if can_prime:
                # refresh the force cache once at epoch entry: the
                # in-scan stepper then reads state.f unconditionally (no
                # XLA conditional inside the scan), and epoch-boundary
                # restarts never reuse a stale-params force.  prime_state
                # returns the refreshed aux; the scan's step-0 topology is
                # that same build (skip_first_refresh), so the cached force
                # and the in-scan neighbor list always agree
                raw_ode = ode

                def ode(params, state, aux, ctrl):
                    state, aux = integ.prime_state(params, state, aux)
                    return raw_ode(params, state, aux, ctrl)

            self._ode_cache[key] = jax.jit(ode)
        return self._ode_cache[key]

    def initial_state(self):
        state = self.integrator.initial_state(self.wrap)
        aux = self.integrator.aux_init(state.q)
        return state, aux

    # -- host driver (parity with reference Simulations) ---------------------
    def update_log(self, traj):
        for key, field in zip(self.keys, traj):
            self.log[key].append(np.asarray(field[-1]))

    def update_states(self):
        if "positions" in self.log:
            self.system.set_positions(self.log["positions"][-1])
        if "velocities" in self.log:
            self.system.set_velocities(self.log["velocities"][-1])

    def get_check_point(self):
        """Restart state from the log tail, wrapping positions if requested
        (parity: reference md.py:60-71)."""
        state = self.state
        if self.wrap:
            cell = (jnp.diag(state.cell) if hasattr(state, "cell")
                    else self.system.get_cell())
            q = _wrap_positions(state.q, cell)
            state = state._replace(q=q)
        return state

    def _check_overflow(self):
        """Surface neighbor-capacity overflow at epoch boundaries.

        Fixed-capacity lists (NeighborList/NeighborTable/CellList) drop
        neighbors silently past capacity; the aux carries an ``overflow``
        flag but nothing on the standalone MD path used to read it.  Warn
        once per Simulation -- results after the first overflow epoch are
        untrustworthy until k_max/capacity_slack is raised."""
        from .. import topology
        if getattr(self, "_overflow_warned", False):
            return
        if topology.aux_overflow(self.aux):
            import warnings
            self._overflow_warned = True
            warnings.warn(
                "neighbor capacity overflow during Simulation.simulate: "
                "neighbors were dropped and forces are incomplete -- "
                "raise k_max/capacity/capacity_slack on the interaction",
                stacklevel=3)

    def simulate(self, steps=1, dt=1.0 * units.fs, frequency=1, ctrl=None):
        """Run ``steps // frequency`` epochs; returns the final epoch's
        trajectory pytree (fields stacked over frequency frames)."""
        if self.state is None:
            self.state, self.aux = self.initial_state()
        else:
            self.state = self.get_check_point()

        ode = self.epoch_fn(dt, frequency)
        ctrl = self.integrator.default_ctrl() if ctrl is None else ctrl
        sim_epochs = max(int(steps // frequency), 1)

        traj = None
        for _ in range(sim_epochs):
            traj, self.aux = ode(self.params, self.state, self.aux, ctrl)
            self._check_overflow()
            if hasattr(self.integrator, "advance_ctrl"):
                ctrl = self.integrator.advance_ctrl(
                    ctrl, max(int(frequency) - 1, 1))
            last = jax.tree_util.tree_map(lambda x: x[-1], traj)
            # detach across epochs (truncated BPTT, reference md.py:47-58)
            self.state = jax.lax.stop_gradient(last)
            self.update_log(traj)
            self.update_states()
            self.state = self.get_check_point()
        return traj


# retained name for reference-API familiarity (torchmd.md.Simulations)
Simulations = Simulation


def make_odeint_cached(step_fn, aux_update, n_steps, update_freq, adjoint,
                       reverse_step_fn=None, skip_first_refresh=False):
    from .adjoint import make_odeint
    return make_odeint(step_fn, aux_update, n_steps,
                       update_freq=update_freq, adjoint=adjoint,
                       reverse_step_fn=reverse_step_fn,
                       skip_first_refresh=skip_first_refresh)
