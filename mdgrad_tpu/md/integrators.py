"""Equations of motion and symplectic/RK4 steppers (pure JAX).

Parity target: /root/reference/torchmd/md.py (NVE:98, NoseHooverChain:159)
and the stepper algebra in /root/reference/torchmd/sovlers.py
(verlet_update:21-40, NHverlet_update:106-127 forward branches) and
tinydiffeq.py (rk4_alt_step_func:97-103, the "3/8 rule").

TPU-native design: an integrator is a *static* object holding masses /
bath constants / the interaction; dynamics are pure functions

    ``derivs(params, state, aux, ctrl, t) -> dstate/dt``
    ``step(params, state, aux, ctrl, t, dt, method) -> state``

with ``state`` a NamedTuple pytree, ``aux`` the neighbor state (constant
within a step -- the reference likewise detaches its cached list,
interface.py:259-260) and ``ctrl`` a dict of *dynamic* controls (currently
``kT`` for thermostat annealing, reference md.py:207 ``update_T``) so
changing temperature never triggers recompilation.

Forces are ``-jax.grad(U)(q)`` (replacing compute_grad,
nff/utils/scatter.py:5-21); the loss later differentiates through this
grad, i.e. grad-of-grad through the scan, which JAX supports natively.
"""

import typing

import jax
import jax.numpy as jnp
import numpy as np

from .. import units
from ..system import check_system


class NVEState(typing.NamedTuple):
    v: jnp.ndarray
    q: jnp.ndarray


class NVTState(typing.NamedTuple):
    v: jnp.ndarray
    q: jnp.ndarray
    pv: jnp.ndarray  # Nose-Hoover chain bath momenta


class NVEStateF(typing.NamedTuple):
    """NVE state with a cached force (one potential eval per step)."""
    v: jnp.ndarray
    q: jnp.ndarray
    f: jnp.ndarray
    fv: jnp.ndarray  # force validity flag (0 before the first step)


class NVTStateF(typing.NamedTuple):
    v: jnp.ndarray
    q: jnp.ndarray
    pv: jnp.ndarray
    f: jnp.ndarray
    fv: jnp.ndarray


class NPTStateF(typing.NamedTuple):
    """NPT state: NHC thermostat + barostatted cell (diagonal lengths).
    The cell is a STATE variable, so gradients flow through the barostat
    (unlike aux, which is data)."""
    v: jnp.ndarray
    q: jnp.ndarray
    pv: jnp.ndarray
    cell: jnp.ndarray  # (3,) diagonal cell lengths
    f: jnp.ndarray
    fv: jnp.ndarray


class NPTMTKStateF(typing.NamedTuple):
    """MTK NPT state: NHC thermostat + barostat MOMENTUM ``peps``
    (log-volume conjugate) -- the extended-Lagrangian variable Berendsen
    weak coupling lacks; with it the sampled distribution is the true
    isothermal-isobaric ensemble."""
    v: jnp.ndarray
    q: jnp.ndarray
    pv: jnp.ndarray
    cell: jnp.ndarray  # (3,) diagonal cell lengths
    peps: jnp.ndarray  # () barostat momentum
    f: jnp.ndarray
    fv: jnp.ndarray


def rk4_step(derivs_fn, state, t, dt):
    """RK4 "3/8 rule" step on an arbitrary state pytree
    (parity: reference tinydiffeq.py:97-103)."""
    tm = jax.tree_util.tree_map
    k1 = derivs_fn(state, t)
    k2 = derivs_fn(tm(lambda y, k: y + dt * k / 3, state, k1), t + dt / 3)
    k3 = derivs_fn(tm(lambda y, a, b: y + dt * (-a / 3 + b), state, k1, k2),
                   t + dt * 2 / 3)
    k4 = derivs_fn(tm(lambda y, a, b, c: y + dt * (a - b + c),
                      state, k1, k2, k3), t + dt)
    return tm(lambda y, a, b, c, d: y + (a + 3 * b + 3 * c + d) * (dt / 8),
              state, k1, k2, k3, k4)


class _MDIntegrator:
    """Shared machinery for NVE / NoseHooverChain."""

    def __init__(self, potentials, system, adjoint=True,
                 topology_update_freq=1, force_cache=True, unroll=1):
        check_system(system)
        self.model = potentials
        self.system = system
        self.masses = jnp.asarray(system.get_masses())[:, None]
        self.dim = system.dim
        self.n_dof = system.get_number_of_atoms() * system.dim
        self.adjoint = adjoint
        self.topology_update_freq = topology_update_freq
        # lax.scan unroll factor for the epoch scans: the N<~1k epoch is
        # fusion-count bound (~20x above both rooflines), so unrolling
        # lets XLA fuse elementwise work across step boundaries at
        # identical numerics (bench_headline_r5.py 'unroll*' variants);
        # costs compile time and activation memory proportional to k
        self.unroll = int(unroll)
        # the end-of-step force equals the next step's start force; caching
        # it halves potential evaluations vs the reference's two EOM evals
        # per NH-verlet step (sovlers.py:110-127)
        self.force_cache = force_cache

    # -- functional surface --------------------------------------------------
    def init_params(self):
        return self.model.init_params()

    def aux_init(self, q):
        return self.model.aux_init(q)

    def aux_update(self, q, aux):
        return self.model.aux_update(q, aux)

    def default_ctrl(self):
        return {}

    def force(self, params, q, aux):
        # interactions may provide a direct (possibly custom-vjp fused)
        # force -- e.g. the Pallas pair kernel -- else autodiff the energy
        if hasattr(self.model, "force"):
            return self.model.force(params, q, aux)
        return -jax.grad(self.model.energy, argnums=1)(params, q, aux)

    def prime_state(self, params, state, aux, fresh_aux=False):
        """Fill the force cache with a fresh evaluation (used once at epoch
        entry so the in-scan stepper never branches on ``fv`` -- an XLA
        ``conditional`` inside the scan blocks fusion and costs ~20% of
        the whole fwd+bwd epoch on TPU, measured via jax.profiler).

        Returns ``(state, aux)`` with the refreshed aux so callers can run
        the epoch on the same topology the cached force was computed from
        (they agree by determinism even when the scan refreshes again at
        step 0, but returning it lets update_freq > 1 epochs skip that
        duplicate build -- see Simulation.epoch_fn).

        ``fresh_aux=True``: the caller just built ``aux`` at this exact
        ``state.q`` (e.g. parallel/multistate.py's per-state aux_init) --
        skip the redundant refresh."""
        if not (self.force_cache and hasattr(state, "fv")):
            return state, aux
        if not fresh_aux:
            aux = self.model.aux_update(state.q, aux)
        f = self.force(params, state.q, aux)
        return state._replace(f=f, fv=jnp.ones(())), aux

    def step(self, params, state, aux, ctrl, t, dt, method=None,
             primed=False):
        method = method or self.default_method
        if method in ("verlet", "NH_verlet"):
            # force caching needs the *F state variants; fall back to the
            # plain stepper for externally-built states without the cache
            if self.force_cache and hasattr(state, "fv"):
                return self._symplectic_step_cached(params, state, aux,
                                                    ctrl, t, dt, primed)
            return self._symplectic_step(params, state, aux, ctrl, t, dt)
        if method == "rk4":
            return rk4_step(
                lambda s, tt: self.derivs(params, s, aux, ctrl, tt),
                state, t, dt)
        raise ValueError(f"unknown method {method!r}")

    def _symplectic_step_cached(self, params, state, aux, ctrl, t, dt,
                                primed=False):
        """Velocity-Verlet-family step with ONE potential evaluation:
        the start-of-step force is the cached end-of-step force of the
        previous step.  ``primed=True`` (static) asserts the cache is
        valid -- set by epoch drivers after :meth:`prime_state` -- and
        removes the data-dependent branch from the compiled scan."""
        if primed:
            f0 = state.f
        else:
            f0 = jax.lax.cond(state.fv > 0, lambda: state.f,
                              lambda: self.force(params, state.q, aux))
        dv0, dbath0 = self.derivs_from_force(params, state, ctrl, f0)
        v_half = state.v + 0.5 * dt * dv0
        q_new = state.q + v_half * dt
        mid = state._replace(v=v_half, q=q_new)
        if dbath0 is not None:
            mid = mid._replace(pv=state.pv + 0.5 * dt * dbath0)
        f1 = self.force(params, q_new, aux)
        dv1, dbath1 = self.derivs_from_force(params, mid, ctrl, f1)
        new = mid._replace(v=v_half + 0.5 * dt * dv1, f=f1,
                           fv=jnp.ones(()))
        if dbath1 is not None:
            new = new._replace(pv=mid.pv + 0.5 * dt * dbath1)
        return new

    def _symplectic_step(self, params, state, aux, ctrl, t, dt):
        """Velocity-Verlet-family step: half-kick on all momentum-like
        variables, full drift in q, half-kick at the new point.  Exactly the
        forward branches of reference sovlers.py:25-40 and :110-127."""
        d0 = self.derivs(params, state, aux, ctrl, t)
        half = jax.tree_util.tree_map(lambda y, k: y + 0.5 * dt * k,
                                      state, d0)
        # drift uses the half-kicked velocity; q's own "half" entry from the
        # tree_map above is discarded
        q_new = state.q + half.v * dt
        mid = half._replace(q=q_new)
        d1 = self.derivs(params, mid, aux, ctrl, t)
        new = jax.tree_util.tree_map(lambda y, k: y + 0.5 * dt * k,
                                     mid, d1)
        return new._replace(q=q_new)


class NVE(_MDIntegrator):
    """Constant-energy EOM (parity: reference md.py:98-157)."""

    state_keys = ["velocities", "positions"]
    default_method = "verlet"

    def initial_state(self, wrap=True):
        v = jnp.asarray(self.system.get_velocities())
        q = jnp.asarray(self.system.get_positions(wrap=wrap))
        if self.force_cache and self.default_method != "rk4":
            return NVEStateF(v=v, q=q, f=jnp.zeros_like(q),
                             fv=jnp.zeros(()))
        return NVEState(v=v, q=q)

    def derivs_from_force(self, params, state, ctrl, f):
        return f / self.masses, None

    def derivs(self, params, state, aux, ctrl, t):
        f = self.force(params, state.q, aux)
        return type(state)(*([f / self.masses, state.v]
                             + ([jnp.zeros_like(state.f),
                                 jnp.zeros(())]
                                if hasattr(state, "f") else [])))


class Langevin(_MDIntegrator):
    """BAOAB Langevin thermostat.

    New TPU-native capability: the reference's non-differentiable MD path
    defaults to ``ase.md.langevin.Langevin`` (nff/md/TI.py:18-19,26) which
    has no analog in its differentiable core.  BAOAB splitting: half-kick,
    half-drift, Ornstein-Uhlenbeck velocity refresh, half-drift, half-kick.

    Noise is a *pure function of the global step index* --
    ``fold_in(PRNGKey(seed), noise_step0 + i)`` -- so the state stays an
    all-float pytree (adjoint-compatible) and trajectories are exactly
    reproducible; ``noise_step0`` advances per epoch via
    :meth:`advance_ctrl` so restarted epochs draw fresh noise.  Gradients
    flow through the deterministic map; noise is data.
    """

    state_keys = ["velocities", "positions"]
    default_method = "langevin"

    def __init__(self, potentials, system, T, friction=0.01, adjoint=True,
                 topology_update_freq=1, seed=0, force_cache=True,
                 unroll=1):
        super().__init__(potentials, system, adjoint, topology_update_freq,
                         force_cache=force_cache, unroll=unroll)
        self.T = T
        self.friction = friction
        self.base_key = jax.random.PRNGKey(seed)

    def default_ctrl(self):
        return {"kT": jnp.asarray(self.T * units.kB),
                "noise_step0": jnp.asarray(0, dtype=jnp.uint32)}

    def advance_ctrl(self, ctrl, n_steps):
        return {**ctrl,
                "noise_step0": ctrl["noise_step0"] + jnp.uint32(n_steps)}

    def update_T(self, T):
        self.T = T
        return self.default_ctrl()

    def initial_state(self, wrap=True):
        v = jnp.asarray(self.system.get_velocities())
        q = jnp.asarray(self.system.get_positions(wrap=wrap))
        if self.force_cache:
            return NVEStateF(v=v, q=q, f=jnp.zeros_like(q),
                             fv=jnp.zeros(()))
        return NVEState(v=v, q=q)

    def step(self, params, state, aux, ctrl, t, dt, method=None,
             primed=False):
        kT = ctrl["kT"]
        m = self.masses
        v, q = state.v, state.q
        # round, don't truncate: t = i*dt in f32 can land just below the
        # integer and the cast would reuse the previous step's noise key
        i = jnp.asarray(jnp.round(t / dt), dtype=jnp.uint32)
        sub = jax.random.fold_in(self.base_key, ctrl["noise_step0"] + i)
        if primed and self.force_cache and hasattr(state, "fv"):
            f0 = state.f
        elif self.force_cache and hasattr(state, "fv"):
            f0 = jax.lax.cond(state.fv > 0, lambda: state.f,
                              lambda: self.force(params, q, aux))
        else:
            f0 = self.force(params, q, aux)
        v = v + 0.5 * dt * f0 / m                      # B
        q = q + 0.5 * dt * v                           # A
        c1 = jnp.exp(-self.friction * dt)              # O
        c2 = jnp.sqrt(kT * (1 - c1 ** 2) / m)
        noise = jax.random.normal(sub, v.shape, dtype=v.dtype)
        v = c1 * v + c2 * noise
        q = q + 0.5 * dt * v                           # A
        f1 = self.force(params, q, aux)
        v = v + 0.5 * dt * f1 / m                      # B
        if self.force_cache and hasattr(state, "fv"):
            return NVEStateF(v=v, q=q, f=f1, fv=jnp.ones(()))
        return NVEState(v=v, q=q)


class NoseHooverChain(_MDIntegrator):
    """NVT via a Nose-Hoover chain (parity: reference md.py:159-249).

    T is in Kelvin (the reference takes it pre-multiplied by kB; we keep
    Kelvin at the API and convert internally, so drivers pass the same
    numbers as reference configs).  Q is the bath-mass scalar; the chain
    masses are [Q, Q/N, ..., Q/N] (reference md.py:191-193).

    Large-N caveat of that convention: the link masses Q/N are far below
    the thermal scale kT*tau^2 for any sensible tau, so a strong
    non-equilibrium transient (e.g. a melt, where T falls for tens of
    steps and pv0 swings many sigma) drives pv1^2/Q1 >> kT and the
    excess CASCADES down the chain, amplifying at every link -- observed
    as pv [3, .1, .1] -> [?, 524, -4261, 5525] -> inf within 6 steps in
    the size-8 a-Si anneal (N=4096; size 4 merely stays under the
    cascade threshold).  For large systems or violent transients pass
    ``tau`` instead of ``Q``: the canonical Martyna-Tuckerman-Klein
    masses Q0 = N_dof*kT*tau^2, Qk = kT*tau^2 (tau ~ 20-100 dt) keep
    every link's thermal scale N-invariant.
    """

    state_keys = ["velocities", "positions", "baths"]
    default_method = "NH_verlet"

    def __init__(self, potentials, system, T, num_chains=2, Q=1.0,
                 adjoint=True, topology_update_freq=1, force_cache=True,
                 tau=None, unroll=1):
        super().__init__(potentials, system, adjoint, topology_update_freq,
                         force_cache=force_cache, unroll=unroll)
        if num_chains < 2:
            raise ValueError("NoseHooverChain needs num_chains >= 2")
        self.T = T
        self.num_chains = num_chains
        n = system.get_number_of_atoms()
        if tau is not None:
            # MTK masses at the CONSTRUCTION temperature (annealing via
            # update_T does not re-derive them; tau drifts by
            # sqrt(T/T0), acceptable across anneal schedules)
            kT0 = T * units.kB
            self.Q = jnp.asarray([self.n_dof * kT0 * tau ** 2]
                                 + [kT0 * tau ** 2] * (num_chains - 1))
        else:
            self.Q = jnp.asarray([Q] + [Q / n] * (num_chains - 1))

    def update_T(self, T):
        """Annealing entry point (reference md.py:207-208): changes the
        default ctrl; pass the returned ctrl into the next epoch."""
        self.T = T
        return self.default_ctrl()

    def default_ctrl(self):
        return {"kT": jnp.asarray(self.T * units.kB)}

    def initial_state(self, wrap=True):
        v = jnp.asarray(self.system.get_velocities())
        q = jnp.asarray(self.system.get_positions(wrap=wrap))
        pv = jnp.zeros(self.num_chains)
        if self.force_cache and self.default_method != "rk4":
            return NVTStateF(v=v, q=q, pv=pv, f=jnp.zeros_like(q),
                             fv=jnp.zeros(()))
        return NVTState(v=v, q=q, pv=pv)

    def _bath_derivs(self, state, ctrl, f):
        """Chain EOM given the force (reference md.py:210-240)."""
        kT = ctrl["kT"]
        v, q, pv = state.v, state.q, state.pv
        m = self.masses
        p = v * m
        sys_ke = 0.5 * (p ** 2 / m).sum()
        coupled = pv[0] * p / self.Q[0]
        dvdt = (f - coupled) / m
        dpv0 = (2 * (sys_ke - kT * self.n_dof * 0.5)
                - pv[0] * pv[1] / self.Q[1])
        dpv_mid = ((pv[:-2] ** 2 / self.Q[:-2] - kT)
                   - pv[2:] * pv[1:-1] / self.Q[2:])
        dpv_last = pv[-2] ** 2 / self.Q[-2] - kT
        dpvdt = jnp.concatenate([dpv0[None], dpv_mid, dpv_last[None]])
        return dvdt, dpvdt

    def derivs_from_force(self, params, state, ctrl, f):
        return self._bath_derivs(state, ctrl, f)

    def derivs(self, params, state, aux, ctrl, t):
        f = self.force(params, state.q, aux)
        dvdt, dpvdt = self._bath_derivs(state, ctrl, f)
        if hasattr(state, "f"):
            return type(state)(v=dvdt, q=state.v, pv=dpvdt,
                               f=jnp.zeros_like(state.f),
                               fv=jnp.zeros(()))
        return NVTState(v=dvdt, q=state.v, pv=dpvdt)


class MTSNoseHooverChain(NoseHooverChain):
    """Multiple-time-stepping (impulse / r-RESPA) Nose-Hoover chain.

    Splits a :class:`~mdgrad_tpu.interface.Stack`'s interactions into
    SLOW (the expensive model -- e.g. the SchNet GNN) and FAST (cheap
    local priors) and integrates one outer step of size ``dt`` as the
    Trotter factorization

        e^{(L_bath+L_slow) dt/2} [e^{L_fast dt/k}]^k e^{(L_bath+L_slow) dt/2}

    (XI-RESPA: thermostat and slow impulse at the outer scale, Tuckerman
    / Berne / Martyna, J. Chem. Phys. 97, 1990 (1992)).  The slow force
    is evaluated ONCE per outer step (its end-of-step value is cached in
    ``state.f``, mirroring the single-rate force cache), the fast force
    ``k + 1`` times at ``dt/k``.  With a slow force that dominates
    per-step cost, wall-clock per simulated femtosecond approaches a
    k-fold reduction.

    This is a new capability vs the reference (torchmd/mdgrad has no MTS
    integrator anywhere); it composes unchanged with the trajectory
    machinery: one MTS outer step is one scan step, so the replay
    adjoint, epoch chunking and topology refresh cadence all apply at
    the outer scale.  The neighbor list stays valid across the inner
    loop for the same reason stale-table refresh cadences are exact at
    slack capacity (tests/test_integrators.py update_freq test).
    """

    def __init__(self, stack, system, T, fast_keys=("pair",), n_inner=2,
                 **kw):
        if not hasattr(stack, "models"):
            raise TypeError("MTSNoseHooverChain needs a Stack (the "
                            "slow/fast split is by stack key)")
        if kw.get("force_cache") is False:
            raise ValueError("MTSNoseHooverChain requires force_cache")
        super().__init__(stack, system, T, **kw)
        self.fast_keys = tuple(fast_keys)
        self.slow_keys = tuple(k for k in stack.models
                               if k not in self.fast_keys)
        missing = [k for k in self.fast_keys if k not in stack.models]
        if missing or not self.slow_keys:
            raise ValueError(f"bad fast_keys {fast_keys} for stack keys "
                             f"{list(stack.models)}")
        self.n_inner = int(n_inner)

    def _keys_energy(self, keys, params, q, aux):
        total = 0.0
        for k in keys:
            total = total + self.model.models[k].energy(params[k], q,
                                                        aux[k])
        return total

    def _keys_force(self, keys, params, q, aux):
        return -jax.grad(
            lambda q_: self._keys_energy(keys, params, q_, aux))(q)

    def prime_state(self, params, state, aux, fresh_aux=False):
        """The cache holds the SLOW force only (the fast force is
        re-evaluated inside the inner loop every outer step)."""
        if not hasattr(state, "fv"):
            return state, aux
        if not fresh_aux:
            aux = self.model.aux_update(state.q, aux)
        f = self._keys_force(self.slow_keys, params, state.q, aux)
        return state._replace(f=f, fv=jnp.ones(())), aux

    def step(self, params, state, aux, ctrl, t, dt, method=None,
             primed=False):
        if not hasattr(state, "fv"):
            raise ValueError("MTS stepper needs the cached (*F) state "
                             "from initial_state()")
        if primed:
            fs0 = state.f
        else:
            fs0 = jax.lax.cond(
                state.fv > 0, lambda: state.f,
                lambda: self._keys_force(self.slow_keys, params, state.q,
                                         aux))
        # outer half: slow impulse + chain coupling on v, bath half-kick
        dv0, dbath0 = self._bath_derivs(state, ctrl, fs0)
        v = state.v + 0.5 * dt * dv0
        pv = state.pv + 0.5 * dt * dbath0
        # inner loop: n_inner velocity-Verlet NVE steps on the fast force
        dti = dt / self.n_inner
        m = self.masses

        def inner(carry, _):
            q_c, v_c, ff_c = carry
            v1 = v_c + 0.5 * dti * ff_c / m
            q1 = q_c + dti * v1
            ff1 = self._keys_force(self.fast_keys, params, q1, aux)
            return (q1, v1 + 0.5 * dti * ff1 / m, ff1), None

        ff = self._keys_force(self.fast_keys, params, state.q, aux)
        (q, v, ff), _ = jax.lax.scan(inner, (state.q, v, ff), None,
                                     length=self.n_inner)
        # closing half: fresh slow force at the new positions
        fs1 = self._keys_force(self.slow_keys, params, q, aux)
        mid = state._replace(v=v, q=q, pv=pv)
        dv1, dbath1 = self._bath_derivs(mid, ctrl, fs1)
        return NVTStateF(v=v + 0.5 * dt * dv1, q=q,
                         pv=pv + 0.5 * dt * dbath1, f=fs1,
                         fv=jnp.ones(()))


class NPTBerendsenNHC(NoseHooverChain):
    """Constant-pressure MD: Nose-Hoover chain thermostat + Berendsen
    weak-coupling barostat (isotropic cell rescaling toward a target
    virial pressure).

    ENSEMBLE CAVEAT: weak coupling holds the MEAN pressure/density but
    famously suppresses volume fluctuations -- the sampled distribution
    is not the true isothermal-isobaric ensemble, so fluctuation-derived
    quantities (compressibility from Var(V)) come out wrong.  Use
    :class:`NPTMTKNHC` when the ensemble matters; Berendsen remains the
    robust choice for driving a box to its equilibrium density.

    New capability beyond the reference: torchmd/mdgrad has no
    constant-pressure path at all (its ``Pressure`` observable is broken
    and unused, /root/reference/torchmd/thermo.py:17-54, and the cell is
    frozen at construction, interface.py:56).  Here the diagonal cell is
    a STATE variable, so the whole barostatted trajectory -- including
    the equilibrium density it settles at -- is differentiable in the
    potential parameters.

    Mechanics per step (Berendsen et al., J. Chem. Phys. 81, 3684
    (1984), eq. 30):

    1. one standard NHC NH-verlet step at the current cell (the library
       stepper, force cache and all -- the cell enters through the
       ``interface.WithDynamicCell`` aux layout ``(cell, inner)``);
    2. instantaneous virial pressure P via ``thermo.pressure`` (strain
       derivative of the energy, one extra grad-eval per step);
    3. rescale ``q`` and ``cell`` by
       ``mu = (1 - dt*beta/tau_p * (P0 - P)) ** (1/dim)``, clipped to
       [1-max_rescale, 1+max_rescale] for startup stability.

    The cached end-of-step force is kept across the rescale (stale by
    O(mu-1) ~ 1e-5 per step, the standard weak-coupling approximation);
    the neighbor state refreshes at ``topology_update_freq`` against the
    CURRENT cell via the ``aux_update_state`` hook in
    ``Simulation.epoch_fn``.  ``P0`` (and ``kT``) ride ctrl, so pressure
    schedules never recompile.

    The wrapped interaction must accept the dynamic ``cell=`` override
    (PairPotentials dense/table modes, table-mode GNNPotentials, Stacks
    of those); a bare interaction is wrapped in ``WithDynamicCell``
    automatically.
    """

    state_keys = ["velocities", "positions", "baths", "cell"]

    def __init__(self, potentials, system, T, P, tau_p=None,
                 beta=1.0, max_rescale=0.002, **kw):
        from ..interface import WithDynamicCell
        if kw.get("force_cache") is False:
            raise ValueError("NPTBerendsenNHC requires force_cache")
        cell = np.asarray(system.get_cell())
        cell_len = np.diag(cell) if cell.ndim == 2 else cell
        if not isinstance(potentials, WithDynamicCell):
            potentials = WithDynamicCell(potentials, cell_len)
        super().__init__(potentials, system, T, **kw)
        self.P = P
        # tau_p=None -> 1000*dt at step time: instantaneous-P noise at
        # small N demands weak coupling regardless of the time unit.
        # Start from an EQUILIBRATED configuration: a cold crystal's
        # virial is far from the liquid EOS and the barostat will chase
        # it through the melt transient.
        self.tau_p = None if tau_p is None else float(tau_p)
        self.beta = float(beta)
        self.max_rescale = float(max_rescale)
        self.cell_len0 = jnp.asarray(cell_len, dtype=jnp.float32)
        # 2-D systems barostat the first `dim` axes only
        self._scale_mask = jnp.asarray(
            [1.0] * self.dim + [0.0] * (3 - self.dim))

    def default_ctrl(self):
        return {"kT": jnp.asarray(self.T * units.kB),
                "P0": jnp.asarray(self.P)}

    def update_P(self, P):
        """Pressure-schedule entry point (mirror of update_T)."""
        self.P = P
        return self.default_ctrl()

    def initial_state(self, wrap=True):
        v = jnp.asarray(self.system.get_velocities())
        q = jnp.asarray(self.system.get_positions(wrap=wrap))
        return NPTStateF(v=v, q=q, pv=jnp.zeros(self.num_chains),
                         cell=self.cell_len0, f=jnp.zeros_like(q),
                         fv=jnp.zeros(()))

    # cell-aware topology refresh (Simulation.epoch_fn prefers this hook)
    def aux_update_state(self, state, aux):
        return self.model.aux_update(state.q, aux, cell=state.cell)

    def prime_state(self, params, state, aux, fresh_aux=False):
        if not fresh_aux:
            aux = self.model.aux_update(state.q, aux, cell=state.cell)
        f = self.force(params, state.q, (state.cell, aux[1]))
        return state._replace(f=f, fv=jnp.ones(())), aux

    def step(self, params, state, aux, ctrl, t, dt, method=None,
             primed=False):
        method = method or self.default_method
        if method not in ("verlet", "NH_verlet"):
            raise ValueError("NPTBerendsenNHC supports the NH_verlet "
                             "stepper only")
        from .. import thermo
        # 1. NVT step at the current cell: the state's cell becomes the
        # effective aux cell (aux[0] is just the carrier default)
        aux_eff = (state.cell, aux[1])
        new = self._symplectic_step_cached(params, state, aux_eff, ctrl,
                                           t, dt, primed)
        # 2. instantaneous virial pressure at the post-step phase point
        p_inst = thermo.pressure(self.model, params, new.q,
                                 (state.cell, aux[1]), new.v, self.masses,
                                 state.cell, dim=self.dim)
        # 3. weak-coupling rescale toward P0
        tau_p = (1000.0 * dt) if self.tau_p is None else self.tau_p
        mu = (1.0 - dt * self.beta / tau_p
              * (ctrl["P0"] - p_inst)) ** (1.0 / self.dim)
        mu = jnp.clip(mu, 1.0 - self.max_rescale, 1.0 + self.max_rescale)
        scale = 1.0 + self._scale_mask * (mu - 1.0)
        return new._replace(q=new.q * scale, cell=state.cell * scale)


class NPTMTKNHC(NoseHooverChain):
    """Ensemble-correct constant-pressure MD: Martyna-Tobias-Klein
    barostat (J. Chem. Phys. 101, 4177 (1994), isotropic cell) coupled
    to the Nose-Hoover chain thermostat.

    Unlike :class:`NPTBerendsenNHC` (weak coupling: right mean density,
    suppressed volume fluctuations), the MTK barostat carries an
    extended-system MOMENTUM ``peps`` conjugate to the log-volume, so
    the stationary distribution is the true isothermal-isobaric
    ensemble -- Var(V) = kT V kappa_T holds
    (tests/test_npt.py::test_mtk_ideal_gas_volume_fluctuations uses the
    analytic ideal-gas kappa_T = 1/P as the oracle).  The natural
    companion of the MTK thermostat masses (``tau=`` on the NHC): the
    barostat mass is W = (N_dof + dim) kT tau_p^2.

    EOM (isotropic; alpha = 1 + dim/N_dof; barostat drag and KE feed
    ride the FIRST thermostat link):

        dq/dt    = v + (peps/W) q
        dcell/dt = (peps/W) cell
        dv/dt    = f/m - (alpha peps/W + pv0/Q0) v
        dpeps/dt = dim V (P_int - P0) + (dim/N_dof) 2 KE - (pv0/Q0) peps
        dpv0/dt  = (2KE - N_dof kT) + (peps^2/W - kT) - pv0 pv1/Q1
        (chain links 1.. as in the plain NHC)

    P_int is the instantaneous virial pressure (thermo.pressure: strain
    derivative of the energy through the dynamic ``cell=`` override) --
    one extra grad-eval per half-kick.  Integration is the library's
    half-kick / drift / half-kick pattern with an exponential volume
    drift ``s = exp((peps/W) dt)`` applied to q and cell; the
    end-of-step force is cached like every other stepper.  The whole
    barostatted trajectory (including the equilibrium density) stays
    differentiable in the potential parameters.

    New capability vs the reference: torchmd/mdgrad has no
    constant-pressure path at all (its ``Pressure`` observable is broken
    and unused, /root/reference/torchmd/thermo.py:17-54).
    """

    state_keys = ["velocities", "positions", "baths", "cell", "peps"]

    def __init__(self, potentials, system, T, P, tau_p=None, **kw):
        from ..interface import WithDynamicCell
        if kw.get("force_cache") is False:
            raise ValueError("NPTMTKNHC requires force_cache")
        cell = np.asarray(system.get_cell())
        cell_len = np.diag(cell) if cell.ndim == 2 else cell
        if not isinstance(potentials, WithDynamicCell):
            potentials = WithDynamicCell(potentials, cell_len)
        super().__init__(potentials, system, T, **kw)
        self.P = P
        kT0 = T * units.kB
        # barostat time constant: ~1000 dt unless given (same guidance
        # as Berendsen tau_p; resolved at step time when None)
        self.tau_p = None if tau_p is None else float(tau_p)
        self.cell_len0 = jnp.asarray(cell_len, dtype=jnp.float32)
        self._kT0 = kT0
        self._scale_mask = jnp.asarray(
            [1.0] * self.dim + [0.0] * (3 - self.dim))

    def default_ctrl(self):
        return {"kT": jnp.asarray(self.T * units.kB),
                "P0": jnp.asarray(self.P)}

    def update_P(self, P):
        self.P = P
        return self.default_ctrl()

    def initial_state(self, wrap=True):
        v = jnp.asarray(self.system.get_velocities())
        q = jnp.asarray(self.system.get_positions(wrap=wrap))
        return NPTMTKStateF(v=v, q=q, pv=jnp.zeros(self.num_chains),
                            cell=self.cell_len0, peps=jnp.zeros(()),
                            f=jnp.zeros_like(q), fv=jnp.zeros(()))

    def aux_update_state(self, state, aux):
        return self.model.aux_update(state.q, aux, cell=state.cell)

    def prime_state(self, params, state, aux, fresh_aux=False):
        if not fresh_aux:
            aux = self.model.aux_update(state.q, aux, cell=state.cell)
        f = self.force(params, state.q, (state.cell, aux[1]))
        return state._replace(f=f, fv=jnp.ones(())), aux

    def _W(self, dt):
        tau_p = (1000.0 * dt) if self.tau_p is None else self.tau_p
        return (self.n_dof + self.dim) * self._kT0 * tau_p ** 2

    def step(self, params, state, aux, ctrl, t, dt, method=None,
             primed=False):
        method = method or self.default_method
        if method not in ("verlet", "NH_verlet"):
            raise ValueError("NPTMTKNHC supports the NH_verlet stepper "
                             "only")
        from .. import thermo
        kT, P0 = ctrl["kT"], ctrl["P0"]
        m = self.masses
        d = self.dim
        W = self._W(dt)
        alpha = 1.0 + d / self.n_dof
        aux_in = aux[1]

        def derivs(s, f):
            # self.masses is already (N, 1)
            ke2 = (s.v ** 2 * m).sum()
            vol = jnp.abs(jnp.prod(jnp.where(self._scale_mask > 0.0,
                                             s.cell, 1.0)))
            p_int = thermo.pressure(self.model, params, s.q,
                                    (s.cell, aux_in), s.v, m, s.cell,
                                    dim=d)
            dv = (f / m
                  - (alpha * s.peps / W + s.pv[0] / self.Q[0]) * s.v)
            dpeps = (d * vol * (p_int - P0) + (d / self.n_dof) * ke2
                     - s.pv[0] / self.Q[0] * s.peps)
            pv = s.pv
            dpv0 = ((ke2 - self.n_dof * kT) + (s.peps ** 2 / W - kT)
                    - pv[0] * pv[1] / self.Q[1])
            dpv_mid = ((pv[:-2] ** 2 / self.Q[:-2] - kT)
                       - pv[2:] * pv[1:-1] / self.Q[2:])
            dpv_last = pv[-2] ** 2 / self.Q[-2] - kT
            dpv = jnp.concatenate([dpv0[None], dpv_mid, dpv_last[None]])
            return dv, dpv, dpeps

        if primed:
            f0 = state.f
        else:
            f0 = jax.lax.cond(
                state.fv > 0, lambda: state.f,
                lambda: self.force(params, state.q,
                                   (state.cell, aux_in)))
        dv0, dpv0, dpeps0 = derivs(state, f0)
        v_half = state.v + 0.5 * dt * dv0
        pv_half = state.pv + 0.5 * dt * dpv0
        peps_half = state.peps + 0.5 * dt * dpeps0
        # exponential volume drift + position drift
        s_fac = jnp.exp((peps_half / W) * dt)
        scale = 1.0 + self._scale_mask * (s_fac - 1.0)
        q_new = state.q * scale + v_half * dt
        cell_new = state.cell * scale
        mid = state._replace(v=v_half, q=q_new, pv=pv_half,
                             peps=peps_half, cell=cell_new)
        f1 = self.force(params, q_new, (cell_new, aux_in))
        dv1, dpv1, dpeps1 = derivs(mid, f1)
        return NPTMTKStateF(v=v_half + 0.5 * dt * dv1, q=q_new,
                            pv=pv_half + 0.5 * dt * dpv1,
                            cell=cell_new,
                            peps=peps_half + 0.5 * dt * dpeps1,
                            f=f1, fv=jnp.ones(()))


def rethermalize(state, kT, masses, rng=None, dim=3):
    """NaN-recovery rescue: fresh Maxwell-Boltzmann momenta for a
    finite-position state whose onward trajectory blew up.

    The fitting drivers' recovery path restores a last-good
    (params, state) snapshot and retries with a smaller update -- but an
    NHC trajectory is deterministic, so if the blowup is STATE-driven
    (a hot/near-overlap configuration rather than a bad parameter step)
    the replay reproduces the identical NaN until the step budget is
    exhausted (observed: the r4 3-temp tpair multistate run, epoch 185,
    results/r4_logs/tpair_multi2.log -- four identical failures at
    step_scale 0.5..0.0625).  Redrawing velocities at the target kT and
    zeroing the bath momenta (and any cached-force validity flag) keeps
    the finite positions but makes the retry a genuinely different,
    cooled trajectory.
    """
    from ..system import maxwell_boltzmann_velocities
    v = maxwell_boltzmann_velocities(np.asarray(masses), float(kT),
                                     rng=rng)
    if dim < 3:
        v[:, dim:] = 0.0
    upd = {"v": jnp.asarray(v, dtype=state.v.dtype)}
    if hasattr(state, "pv"):
        upd["pv"] = jnp.zeros_like(state.pv)
    if hasattr(state, "fv"):
        upd["fv"] = jnp.zeros_like(state.fv)
    if hasattr(state, "peps"):
        upd["peps"] = jnp.zeros_like(state.peps)
    return state._replace(**upd)
