"""Multi-replica + spatially sharded MD: the framework's scaling path.

New capability over the reference (which runs one system per GPU and loops
state points serially, fit_rdf_gnn.py:388): simulate R replicas of an
N-atom system across a 2-D device mesh

    dp (data/replica parallel):  replicas sharded; gradients psum over dp
    sp (spatial/atom parallel):  atoms of each replica sharded; positions
                                 all-gathered once per energy evaluation,
                                 each device computes its row-block of the
                                 O(N^2) pair sum, energies psum over sp

All collectives are XLA-native (all_gather / psum) and ride ICI.  Gradients
flow through the collectives (all_gather transposes to reduce_scatter
automatically), so the same sharded program serves forward MD and
observable-fitting backprop.

Layout notes (TPU): the atom axis is the *sharded* axis and the xyz axis is
minor; the per-device row block (N/sp, N, 3) keeps the N dimension on lanes.
"""

import typing

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from .. import topology, units
from ..md.integrators import NVTState


def spatial_pair_energy(pair_model, params, xyz_local, cell, cutoff,
                        axis="sp"):
    """Pair energy of one replica with atoms sharded over ``axis``.

    ``xyz_local``: (N/sp, 3) this device's atom block.  All-gathers the full
    coordinate set (one ICI collective), evaluates the local row-block of
    the masked minimum-image pair matrix, psums the scalar.
    """
    n_shards = jax.lax.axis_size(axis)
    k = jax.lax.axis_index(axis)
    blk = xyz_local.shape[0]
    xyz_full = jax.lax.all_gather(xyz_local, axis, tiled=True)
    n = xyz_full.shape[0]

    disp = xyz_full[None, :, :] - xyz_local[:, None, :]
    disp, _ = topology.min_image(disp, cell)
    dist_sq = (disp ** 2).sum(-1)

    row_ids = k * blk + jnp.arange(blk)[:, None]
    col_ids = jnp.arange(n)[None, :]
    mask = (col_ids > row_ids) & (dist_sq < cutoff ** 2)
    safe = jnp.where(mask, jnp.sqrt(jnp.where(mask, dist_sq, 1.0)), 1.0)
    u = pair_model(params, safe[..., None]).squeeze(-1)
    return jax.lax.psum(jnp.where(mask, u, 0.0).sum(), axis)


def _soft_rdf_counts(xyz_local, cell, smear_offsets, smear_widths,
                     cutoff, axis="sp"):
    """Soft-histogram RDF counts for one replica, atoms sharded."""
    k = jax.lax.axis_index(axis)
    blk = xyz_local.shape[0]
    xyz_full = jax.lax.all_gather(xyz_local, axis, tiled=True)
    n = xyz_full.shape[0]
    disp = xyz_full[None, :, :] - xyz_local[:, None, :]
    disp, _ = topology.min_image(disp, cell)
    dist_sq = (disp ** 2).sum(-1)
    row_ids = k * blk + jnp.arange(blk)[:, None]
    col_ids = jnp.arange(n)[None, :]
    mask = (col_ids > row_ids) & (dist_sq < cutoff ** 2)
    dist = jnp.sqrt(jnp.where(mask, dist_sq, 1.0))
    g = jnp.exp(-0.5 * ((dist[..., None] - smear_offsets)
                        / smear_widths) ** 2)
    return jax.lax.psum((g * mask[..., None]).sum((0, 1)), axis)


class ShardedMDConfig(typing.NamedTuple):
    cell: typing.Any
    cutoff: float
    masses: typing.Any            # (N/sp after sharding,) handled via spec
    dt: float
    n_steps: int
    kT: float
    Q: typing.Any                 # NHC bath masses (C,)
    n_dof: int


def make_sharded_epoch(pair_model, cfg, mesh, rdf_range=None, nbins=64):
    """Build the dp x sp sharded epoch runner and RDF-loss objective.

    Returns ``(epoch_fn, loss_fn)`` where

      epoch_fn(params, states) -> states'     (one NHC epoch per replica)
      loss_fn(params, states, g_target) -> (scalar loss, states')

    ``states``: NVTState with v, q of shape (R, N, 3) and pv (R, C);
    sharded P('dp', 'sp') on (replica, atom) axes.  params replicated.
    """
    cell = jnp.asarray(cfg.cell)
    start, end = rdf_range or (0.5, cfg.cutoff)
    offsets = jnp.linspace(start, end, nbins)
    widths = jnp.full(nbins, offsets[1] - offsets[0])
    from ..observables import generate_vol_bins
    V, vol_bins, _ = generate_vol_bins(start, end, nbins, dim=3)

    def local_force(params, q_local):
        e = lambda q: spatial_pair_energy(pair_model, params, q, cell,
                                          cfg.cutoff)
        return -jax.grad(e)(q_local)

    def nhc_derivs(params, s, masses_local, kT):
        # per-replica NHC EOM with atoms sharded: kinetic energy psums
        # over 'sp' (parity with md.py:210-240 physics); kT is a dynamic
        # argument (CLAUDE.md: runtime knobs never ride closures)
        v, q, pv = s
        p = v * masses_local[:, None]
        sys_ke = jax.lax.psum(0.5 * (p ** 2 / masses_local[:, None]).sum(),
                              "sp")
        f = local_force(params, q)
        coupled = pv[0] * p / cfg.Q[0]
        dvdt = (f - coupled) / masses_local[:, None]
        dpv0 = 2 * (sys_ke - kT * cfg.n_dof * 0.5) \
            - pv[0] * pv[1] / cfg.Q[1]
        dpv_mid = (pv[:-2] ** 2 / cfg.Q[:-2] - kT) \
            - pv[2:] * pv[1:-1] / cfg.Q[2:]
        dpv_last = pv[-2] ** 2 / cfg.Q[-2] - kT
        dpvdt = jnp.concatenate([dpv0[None], dpv_mid, dpv_last[None]])
        return NVTState(v=dvdt, q=v, pv=dpvdt)

    def step(params, s, masses_local, kT):
        d0 = nhc_derivs(params, s, masses_local, kT)
        half = jax.tree_util.tree_map(
            lambda y, k_: y + 0.5 * cfg.dt * k_, s, d0)
        q_new = s.q + half.v * cfg.dt
        mid = half._replace(q=q_new)
        d1 = nhc_derivs(params, mid, masses_local, kT)
        new = jax.tree_util.tree_map(
            lambda y, k_: y + 0.5 * cfg.dt * k_, mid, d1)
        return new._replace(q=q_new)

    def shard_body(params, states, masses_local, g_target, kT):
        # states: (R/dp, N/sp, ...) local block; vmap over local replicas
        def one_replica(s):
            def scan_f(carry, _):
                return step(params, carry, masses_local, kT), None
            final, _ = jax.lax.scan(scan_f, s, None, length=cfg.n_steps)
            return final

        finals = jax.vmap(one_replica)(states)

        def replica_rdf(q_local):
            counts = _soft_rdf_counts(q_local, cell, offsets, widths,
                                      end + 0.5)
            counts = counts / counts.sum()
            return counts / (vol_bins / V)

        g = jax.vmap(replica_rdf)(finals.q)       # (R/dp, nbins)
        loss_local = ((g - g_target) ** 2).mean(-1).sum()
        loss = jax.lax.psum(loss_local, "dp")
        return loss, finals

    state_spec = NVTState(v=P("dp", "sp"), q=P("dp", "sp"), pv=P("dp"))
    body = shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(), state_spec, P("sp"), P(), P()),
        out_specs=(P(), state_spec))

    def loss_fn(params, states, masses, g_target, kT=None):
        kT_val = jnp.asarray(cfg.kT if kT is None else kT)
        loss, finals = body(params, states, masses, g_target, kT_val)
        return loss, finals

    return body, loss_fn


def make_sharded_fit_step(pair_model, cfg, mesh, g_target, rdf_range=None,
                          nbins=64, lr=1e-3):
    """One full dp x sp-sharded training step:
    value_and_grad(epoch RDF loss) + SGD update.  Returns jitted
    ``train_step(params, states, masses) -> (loss, params', states')``.
    """
    _, loss_fn = make_sharded_epoch(pair_model, cfg, mesh, rdf_range, nbins)
    g_t = jnp.asarray(g_target)

    def train_step(params, states, masses):
        (loss, finals), grads = jax.value_and_grad(
            lambda p: loss_fn(p, states, masses, g_t), has_aux=True)(params)
        new_params = jax.tree_util.tree_map(
            lambda p, g: p - lr * g, params, grads)
        return loss, new_params, finals

    return jax.jit(train_step)
