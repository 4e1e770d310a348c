"""Pallas TPU kernel: fused minimum-image LJ-family pair energy + forces.

The reference's hot inner op is the dense O(N^2) displacement matrix plus
pair-potential evaluation plus an autograd force pass, rebuilt from HBM
every step (torchmd/topology.py:30-73 + md.py:227-228).  The XLA dense path
in :mod:`mdgrad_tpu.interface` already fuses well for N <~ 1k; this kernel
is the large-N path: it tiles the pair matrix over (row-block x
column-block) entirely in VMEM, computes analytic forces *inside* the
kernel (no autodiff pass, no (N, N, 3) intermediate in HBM), and
accumulates per-row force vectors and a per-tile energy partial.

Memory: O(TILE_R x TILE_C) scratch instead of O(N^2); HBM traffic is one
read of xyz per column tile + one (N, 3) force write.

Scope: forward MD / sampling (NVE, Langevin, target generation, the
inference phase of fit drivers).  The *differentiable* fitting path keeps
the XLA dense/sparse forms (grad-of-grad through a hand-written kernel
needs bespoke second-order kernels -- planned follow-up).
Supports diagonal (orthorhombic) cells, the only kind the reference's
workloads use.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 256
TILE_C = 512


def _pair_kernel(rep_pow, attr_pow, n_col_tiles, n_real,
                 xyz_row_ref, xyz_full_ref, cell_ref, params_ref,
                 energy_ref, force_ref):
    """One row-block: loop column tiles, accumulate energy + force rows.

    xyz layout is (3, N) -- coordinate-major, so the atom axis (the long
    one) sits on TPU lanes.
    """
    sigma = params_ref[0]
    epsilon = params_ref[1]
    cutoff_sq = params_ref[2] ** 2
    lx = cell_ref[0]
    ly = cell_ref[1]
    lz = cell_ref[2]

    i0 = pl.program_id(0) * TILE_R
    rows = xyz_row_ref[:, :]                 # (3, TILE_R)
    row_ids = i0 + jax.lax.broadcasted_iota(
        jnp.int32, (TILE_R, TILE_C), 0)

    def col_body(c, carry):
        e_acc, f_acc = carry
        cols = xyz_full_ref[:, pl.ds(c * TILE_C, TILE_C)]  # (3, TILE_C)
        col_ids = c * TILE_C + jax.lax.broadcasted_iota(
            jnp.int32, (TILE_R, TILE_C), 1)

        def min_img(dr, L):
            return dr - jnp.round(dr / L) * L

        dx = min_img(rows[0][:, None] - cols[0][None, :], lx)
        dy = min_img(rows[1][:, None] - cols[1][None, :], ly)
        dz = min_img(rows[2][:, None] - cols[2][None, :], lz)
        r_sq = dx * dx + dy * dy + dz * dz

        valid = ((col_ids != row_ids) & (r_sq < cutoff_sq)
                 & (col_ids < n_real) & (row_ids < n_real))
        r_sq = jnp.where(valid, r_sq, 1.0)
        inv_r2 = 1.0 / r_sq
        inv_r = jnp.sqrt(inv_r2)
        sr = sigma * inv_r
        sr_a = sr ** attr_pow
        sr_r = sr ** rep_pow
        u = 4.0 * epsilon * (sr_r - sr_a)
        # du/dr * (1/r): f_vec = -(du/dr) * d_vec / r
        dudr_over_r = (4.0 * epsilon
                       * (-rep_pow * sr_r + attr_pow * sr_a) * inv_r2)
        u = jnp.where(valid, u, 0.0)
        g = jnp.where(valid, dudr_over_r, 0.0)

        e_acc = e_acc + 0.5 * jnp.sum(u)
        fx = -jnp.sum(g * dx, axis=1)
        fy = -jnp.sum(g * dy, axis=1)
        fz = -jnp.sum(g * dz, axis=1)
        f_acc = f_acc + jnp.stack([fx, fy, fz], axis=0)
        return e_acc, f_acc

    e, f = jax.lax.fori_loop(
        0, n_col_tiles, col_body,
        (jnp.zeros((), jnp.float32), jnp.zeros((3, TILE_R), jnp.float32)))
    ri = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    energy_ref[:, :] = jnp.where((ri == 0) & (ci == 0), e, 0.0)
    force_ref[:, :] = f


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("rep_pow", "attr_pow",
                                             "interpret"))
def lj_energy_forces(xyz, cell_len, cutoff, sigma, epsilon, rep_pow=12,
                     attr_pow=6, interpret=False):
    """(total energy, forces (N, 3)) under minimum image, fused on TPU.

    xyz: (N, 3); cell_len: (3,) diagonal cell lengths; sigma/epsilon/cutoff
    may be traced scalars (changing them does not recompile).
    """
    n = xyz.shape[0]
    n_pad = _round_up(max(n, TILE_R), TILE_R)
    n_pad = _round_up(n_pad, TILE_C)
    xyz_t = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(
        jnp.asarray(xyz, jnp.float32).T)
    params = jnp.stack([jnp.asarray(sigma, jnp.float32),
                        jnp.asarray(epsilon, jnp.float32),
                        jnp.asarray(cutoff, jnp.float32)])
    cell = jnp.asarray(cell_len, jnp.float32)

    grid = n_pad // TILE_R
    n_col_tiles = n_pad // TILE_C
    kernel = functools.partial(_pair_kernel, rep_pow, attr_pow,
                               n_col_tiles, n)

    energy_parts, forces_t = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((3, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid * 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
        ],
        interpret=interpret,
    )(xyz_t, xyz_t, cell, params)

    return energy_parts.sum(), forces_t[:, :n].T


class PallasLJPair:
    """Interaction-protocol adapter over the fused kernel (sampling path).

    Drop-in for PairPotentials with an LJ-family model when running
    adjoint=False MD at scale; ``energy``/``force`` bypass autodiff.
    """

    def __init__(self, system, cutoff, sigma=1.0, epsilon=1.0, rep_pow=12,
                 attr_pow=6):
        from ..system import check_system
        check_system(system)
        self.cell_len = jnp.asarray(np.diag(system.get_cell()),
                                    jnp.float32)
        self.cutoff = cutoff
        self.sigma, self.epsilon = sigma, epsilon
        self.rep_pow, self.attr_pow = rep_pow, attr_pow

    def init_params(self):
        return {"sigma": jnp.asarray(self.sigma),
                "epsilon": jnp.asarray(self.epsilon)}

    def aux_init(self, xyz):
        return ()

    def aux_update(self, xyz, aux):
        return ()

    def energy(self, params, xyz, aux):
        e, _ = lj_energy_forces(xyz, self.cell_len, self.cutoff,
                                params["sigma"], params["epsilon"],
                                self.rep_pow, self.attr_pow)
        return e

    def force(self, params, xyz, aux):
        _, f = lj_energy_forces(xyz, self.cell_len, self.cutoff,
                                params["sigma"], params["epsilon"],
                                self.rep_pow, self.attr_pow)
        return f
