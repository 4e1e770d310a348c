"""Thermodynamic integration: lambda-ramped GNN aggregation weights.

Parity target: ``nff.md.TI`` (/root/reference/nff/md/TI.py:29-99): a
``GraphConvIntegration`` force field whose per-atom ``aggr_wgt`` weights
interpolate linearly from ``init_aggr`` to ``final_aggr`` over the run
(e.g. switching one atom's interactions off), integrated with a Langevin
thermostat, with thermo logging and trajectory dumps.

TPU-native: each ramp segment (``update_freq`` steps at fixed lambda) is
one jitted scan; ``aggr_wgt`` enters through ``ctrl`` so the ramp never
recompiles.  Additionally, dU/dlambda is accumulated per segment -- the
actual TI integrand, which the reference never computes.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .. import topology
from .adjoint import make_odeint
from .integrators import Langevin
from .utils import NeuralMDLogger, write_xyz


class AggrGNNInteraction:
    """GNNPotentials variant whose energy takes ``aggr_wgt`` from ctrl."""

    def __init__(self, system, gnn, cutoff, capacity=None):
        from ..interface import GNNPotentials
        self._inner = GNNPotentials(system, gnn, cutoff, capacity=capacity)
        self.gnn = gnn
        self.aggr_wgt = None  # set per-call via ctrl

    def init_params(self):
        return self._inner.init_params()

    def aux_init(self, xyz):
        return self._inner.aux_init(xyz)

    def aux_update(self, xyz, aux):
        return self._inner.aux_update(xyz, aux)

    def energy(self, params, xyz, aux, aggr_wgt=None):
        nbrs = aux
        if self._inner.nbr_mode == "table":
            if self._inner.store_offsets:
                off = jnp.matmul(nbrs.offsets, self._inner.cell,
                                 precision=jax.lax.Precision.HIGHEST)
            else:
                off = None  # offsets-free table: min image in the GNN
            return self.gnn.energy(params, self._inner.z, xyz, nbrs.table,
                                   off, nbrs.mask, aggr_wgt,
                                   edge_format="table",
                                   cell_len=self._inner.cell_len)
        off = jnp.matmul(nbrs.offsets, self._inner.cell,
                         precision=jax.lax.Precision.HIGHEST)
        return self.gnn.energy(params, self._inner.z, xyz, nbrs.idx, off,
                               nbrs.mask, aggr_wgt)


class TI:
    """Run MD while ramping aggr_wgt; collect dU/dlambda.

    Args mirror the reference's DEFAULTNVEPARAMS (TI.py:16-26).
    """

    def __init__(self, system, gnn, init_aggr, final_aggr, params=None,
                 T_init=120.0, friction=0.002, dt=0.5 * 0.0982269,
                 cutoff=5.0, steps=3000, nbr_list_update_freq=20,
                 thermo_filename=None, traj_filename=None, seed=0):
        self.system = system
        self.interaction = AggrGNNInteraction(system, gnn, cutoff)
        self.params = params if params is not None \
            else self.interaction.init_params()
        self.init_aggr = jnp.asarray(init_aggr)
        self.final_aggr = jnp.asarray(final_aggr)
        self.steps = steps
        self.update_freq = nbr_list_update_freq
        self.dt = dt
        self.thermo_filename = thermo_filename
        self.traj_filename = traj_filename

        # TI writes its own aggr_wgt-aware BAOAB step below; keep the
        # plain (uncached) state layout for it
        self.integrator = Langevin(self.interaction, system, T=T_init,
                                   friction=friction, adjoint=False,
                                   seed=seed, force_cache=False)
        # patch energy to read aggr_wgt from ctrl: wrap step fn directly
        integ = self.integrator

        def step_fn(p, state, aux, ctrl, i):
            inter = self.interaction

            def force(q):
                return -jax.grad(
                    lambda qq: inter.energy(p, qq, aux,
                                            ctrl["aggr_wgt"]))(q)
            # BAOAB with ctrl-provided aggr weights
            kT = ctrl["kT"]
            m = integ.masses
            v, q = state
            sub = jax.random.fold_in(integ.base_key,
                                     ctrl["noise_step0"]
                                     + i.astype(jnp.uint32))
            v = v + 0.5 * self.dt * force(q) / m
            q = q + 0.5 * self.dt * v
            c1 = jnp.exp(-integ.friction * self.dt)
            c2 = jnp.sqrt(kT * (1 - c1 ** 2) / m)
            v = c1 * v + c2 * jax.random.normal(sub, v.shape, v.dtype)
            q = q + 0.5 * self.dt * v
            v = v + 0.5 * self.dt * force(q) / m
            return type(state)(v=v, q=q)

        self._ode = jax.jit(make_odeint(
            step_fn, lambda s, a: integ.aux_update(s.q, a),
            n_steps=self.update_freq, update_freq=1, adjoint=False))

        # dU/dlambda at fixed configuration: U is linear in aggr only if
        # the model is; compute it exactly via jvp along the ramp direction
        def du_dlambda(p, q, aux, aggr, direction):
            f = lambda a: self.interaction.energy(p, q, aux, a)
            _, jvp = jax.jvp(f, (aggr,), (direction,))
            return jvp
        self._du = jax.jit(du_dlambda)

    def run(self, log=print):
        epochs = int(self.steps // self.update_freq)
        dlam = (self.final_aggr - self.init_aggr) / max(epochs, 1)
        aggr = self.init_aggr

        state = self.integrator.initial_state()
        aux = self.integrator.aux_init(state.q)
        ctrl = self.integrator.default_ctrl()
        logger = NeuralMDLogger(self.system,
                                logfile=self.thermo_filename)
        du_dlam = []
        frames = []
        for ep in range(epochs):
            ctrl_ep = {**ctrl, "aggr_wgt": aggr}
            traj, aux = self._ode(self.params, state, aux, ctrl_ep)
            state = jax.tree_util.tree_map(lambda x: x[-1], traj)
            ctrl = self.integrator.advance_ctrl(ctrl, self.update_freq)
            u = float(self.interaction.energy(self.params, state.q, aux,
                                              aggr))
            logger((ep + 1) * self.update_freq * self.dt / 0.0982269,
                   state.v, u)
            du_dlam.append(float(self._du(self.params, state.q, aux, aggr,
                                          self.final_aggr
                                          - self.init_aggr)))
            frames.append(np.asarray(state.q))
            aggr = aggr + dlam
        if self.traj_filename:
            write_xyz(self.traj_filename, np.stack(frames),
                      numbers=self.system.get_atomic_numbers())
        # trapezoidal TI estimate of the free-energy difference
        delta_f = float(np.trapezoid(du_dlam, dx=1.0 / max(epochs - 1, 1))) \
            if len(du_dlam) > 1 else float(du_dlam[0])
        return {"du_dlambda": np.asarray(du_dlam), "delta_f": delta_f,
                "thermo": logger.rows, "final_state": state}
