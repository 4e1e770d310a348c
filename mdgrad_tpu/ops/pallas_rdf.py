"""Pallas TPU kernels: differentiable soft-histogram RDF counts.

The RDF loss head expands every pair distance on a Gaussian basis
(reference observable.py:70); the XLA dense form materializes an
(N, N, G) tensor -- 28M floats per 512-atom frame at G=109, the single
largest memory consumer of the fitting loss.  These kernels stream
(row-tile x column-tile) distance blocks through VMEM and accumulate the
G-vector of soft counts in place, O(TILE^2 + G) memory.

Differentiability: a ``jax.custom_vjp`` pair -- the backward kernel
replays the tiles and contracts the incoming bin cotangent against
d(gauss)/d(distance), emitting dL/dxyz directly (same structure as the
fused pair-force kernel).  Gradients flow to positions only (bin centers/
widths are frozen in the observable use, reference observable.py:50-56).

Diagonal (orthorhombic) cells; pairs are counted once (i < j) via the
0.5-factor full-matrix trick.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 256
TILE_C = 512


def _dist_tile(rows, cols, cell, row_ids, col_ids, cutoff_sq, n_real):
    def min_img(dr, L):
        return dr - jnp.round(dr / L) * L
    dx = min_img(rows[0][:, None] - cols[0][None, :], cell[0])
    dy = min_img(rows[1][:, None] - cols[1][None, :], cell[1])
    dz = min_img(rows[2][:, None] - cols[2][None, :], cell[2])
    r_sq = dx * dx + dy * dy + dz * dz
    valid = ((col_ids != row_ids) & (r_sq < cutoff_sq)
             & (col_ids < n_real) & (row_ids < n_real))
    r = jnp.sqrt(jnp.where(valid, r_sq, 1.0))
    return r, valid, (dx, dy, dz)


def _fwd_kernel(n_col_tiles, n_real, n_bins,
                xyz_row_ref, xyz_full_ref, cell_ref, cutoff_ref,
                mu_ref, coeff_ref, counts_ref, row_axis=0, frames=False):
    cutoff_sq = cutoff_ref[0] ** 2
    cell = (cell_ref[0], cell_ref[1], cell_ref[2])
    i0 = pl.program_id(row_axis) * TILE_R
    # frame-batched blocks carry a leading size-1 frame dim; index it at
    # read time (a `.at[0]` ref transform crashes the Mosaic compiler)
    rows = xyz_row_ref[0] if frames else xyz_row_ref[:, :]
    row_ids = i0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 0)

    g_pad = mu_ref.shape[0]
    acc_row = jax.lax.broadcasted_iota(jnp.int32, (8, g_pad), 0)
    acc_col = jax.lax.broadcasted_iota(jnp.int32, (8, g_pad), 1)

    def col_body(c, acc):
        cols = (xyz_full_ref[0, :, pl.ds(c * TILE_C, TILE_C)] if frames
                else xyz_full_ref[:, pl.ds(c * TILE_C, TILE_C)])
        col_ids = c * TILE_C + jax.lax.broadcasted_iota(
            jnp.int32, (TILE_R, TILE_C), 1)
        r, valid, _ = _dist_tile(rows, cols, cell, row_ids, col_ids,
                                 cutoff_sq, n_real)
        vmask = valid.astype(jnp.float32)

        def bin_body(g, acc_in):
            s = 0.5 * jnp.sum(jnp.exp(coeff_ref[g] * (r - mu_ref[g]) ** 2)
                              * vmask)
            return acc_in + jnp.where((acc_row == 0) & (acc_col == g),
                                      s, 0.0)

        return jax.lax.fori_loop(0, n_bins, bin_body, acc)

    acc0 = jnp.zeros((8, g_pad), jnp.float32)
    acc = jax.lax.fori_loop(0, n_col_tiles, col_body, acc0)
    counts_ref[:, :] = acc


def _bwd_kernel(n_col_tiles, n_real, n_bins,
                xyz_row_ref, xyz_full_ref, cell_ref, cutoff_ref,
                mu_ref, coeff_ref, ct_ref, dxyz_ref, row_axis=0,
                frames=False):
    cutoff_sq = cutoff_ref[0] ** 2
    cell = (cell_ref[0], cell_ref[1], cell_ref[2])
    i0 = pl.program_id(row_axis) * TILE_R
    rows = xyz_row_ref[0] if frames else xyz_row_ref[:, :]
    row_ids = i0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 0)

    def col_body(c, f_acc):
        cols = (xyz_full_ref[0, :, pl.ds(c * TILE_C, TILE_C)] if frames
                else xyz_full_ref[:, pl.ds(c * TILE_C, TILE_C)])
        col_ids = c * TILE_C + jax.lax.broadcasted_iota(
            jnp.int32, (TILE_R, TILE_C), 1)
        r, valid, (dx, dy, dz) = _dist_tile(rows, cols, cell, row_ids,
                                            col_ids, cutoff_sq, n_real)
        vmask = valid.astype(jnp.float32)

        # w(r) = sum_g ct_g * d gauss_g / d r
        def bin_body(g, w):
            diff = r - mu_ref[g]
            return w + ct_ref[g] * jnp.exp(coeff_ref[g] * diff ** 2) \
                * 2.0 * coeff_ref[g] * diff

        w = jax.lax.fori_loop(0, n_bins, bin_body,
                              jnp.zeros((TILE_R, TILE_C), jnp.float32))
        # both (i, j) and (j, i) appearances contribute the same dL/dx_i
        # term, cancelling the forward's 0.5 factor: dL/dx_i =
        # sum_j w_ij * (x_i - x_j)/r
        w = w * vmask / r
        fx = jnp.sum(w * dx, axis=1)
        fy = jnp.sum(w * dy, axis=1)
        fz = jnp.sum(w * dz, axis=1)
        return f_acc + jnp.stack([fx, fy, fz], axis=0)

    f = jax.lax.fori_loop(0, n_col_tiles, col_body,
                          jnp.zeros((3, TILE_R), jnp.float32))
    if frames:
        dxyz_ref[0] = f
    else:
        dxyz_ref[:, :] = f


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _fwd_kernel_frames(n_col_tiles, n_real, n_bins,
                       xyz_row_ref, xyz_full_ref, cell_ref, cutoff_ref,
                       mu_ref, coeff_ref, counts_ref):
    """Frame-batched forward: same body, refs carry a leading frame dim
    selected by the grid (the round-1 caller unrolled a Python loop over
    frames -- F separate pallas_calls; this is ONE call with grid
    (F, row_tiles), so the grid pipeline streams frames back-to-back)."""
    _fwd_kernel(n_col_tiles, n_real, n_bins,
                xyz_row_ref, xyz_full_ref, cell_ref,
                cutoff_ref, mu_ref, coeff_ref, counts_ref,
                row_axis=1, frames=True)


def _bwd_kernel_frames(n_col_tiles, n_real, n_bins,
                       xyz_row_ref, xyz_full_ref, cell_ref, cutoff_ref,
                       mu_ref, coeff_ref, ct_ref, dxyz_ref):
    _bwd_kernel(n_col_tiles, n_real, n_bins,
                xyz_row_ref, xyz_full_ref, cell_ref,
                cutoff_ref, mu_ref, coeff_ref, ct_ref, dxyz_ref,
                row_axis=1, frames=True)


def make_pallas_rdf(cell_len, mu, widths, cutoff, interpret=False):
    """Build a differentiable ``counts(xyz) -> (G,)`` soft-histogram op."""
    cell = jnp.asarray(cell_len, jnp.float32).reshape(3)
    g_real = len(np.asarray(mu))
    g_pad = _round_up(g_real, 128)
    mu_p = jnp.zeros((g_pad,), jnp.float32).at[:g_real].set(
        jnp.asarray(mu, jnp.float32))
    coeff_p = jnp.full((g_pad,), -0.5, jnp.float32).at[:g_real].set(
        -0.5 / jnp.asarray(widths, jnp.float32) ** 2)
    cutoff_arr = jnp.asarray([cutoff], jnp.float32)

    def _pad(xyz):
        n = xyz.shape[0]
        n_pad = _round_up(max(n, TILE_R), TILE_C)
        return (jnp.zeros((3, n_pad), jnp.float32)
                .at[:, :n].set(jnp.asarray(xyz, jnp.float32).T), n, n_pad)

    def _fwd_call(xyz):
        xyz_t, n, n_pad = _pad(xyz)
        grid = n_pad // TILE_R
        kernel = functools.partial(_fwd_kernel, n_pad // TILE_C, n, g_real)
        parts = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((3, TILE_R), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, xyz_t.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((8, g_pad), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid * 8, g_pad), jnp.float32),
            interpret=interpret,
        )(xyz_t, xyz_t, cell, cutoff_arr, mu_p, coeff_p)
        return parts.sum(0)[:g_real]

    @jax.custom_vjp
    def counts(xyz):
        return _fwd_call(xyz)

    def counts_fwd(xyz):
        return _fwd_call(xyz), xyz

    def counts_bwd(xyz, ct):
        xyz_t, n, n_pad = _pad(xyz)
        grid = n_pad // TILE_R
        ct_p = jnp.zeros((g_pad,), jnp.float32).at[:g_real].set(
            jnp.asarray(ct, jnp.float32))
        kernel = functools.partial(_bwd_kernel, n_pad // TILE_C, n, g_real)
        dxyz_t = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((3, TILE_R), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, xyz_t.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((3, TILE_R), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, xyz_t.shape[1]),
                                           jnp.float32),
            interpret=interpret,
        )(xyz_t, xyz_t, cell, cutoff_arr, mu_p, coeff_p, ct_p)
        return (dxyz_t[:, :xyz.shape[0]].T.astype(xyz.dtype),)

    counts.defvjp(counts_fwd, counts_bwd)

    # ---- frame-batched variant: ONE pallas_call, grid (F, row_tiles) ----
    def _pad_frames(xyzs):
        f, n = xyzs.shape[0], xyzs.shape[1]
        n_pad = _round_up(max(n, TILE_R), TILE_C)
        xt = jnp.zeros((f, 3, n_pad), jnp.float32).at[:, :, :n].set(
            jnp.swapaxes(jnp.asarray(xyzs, jnp.float32), 1, 2))
        return xt, n, n_pad

    def _fwd_frames_call(xyzs):
        xt, n, n_pad = _pad_frames(xyzs)
        f = xt.shape[0]
        grid_r = n_pad // TILE_R
        kernel = functools.partial(_fwd_kernel_frames, n_pad // TILE_C,
                                   n, g_real)
        parts = pl.pallas_call(
            kernel,
            grid=(f, grid_r),
            in_specs=[
                pl.BlockSpec((1, 3, TILE_R), lambda fi, i: (fi, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, n_pad), lambda fi, i: (fi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (8, g_pad), lambda fi, i: (fi * grid_r + i, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((f * grid_r * 8, g_pad),
                                           jnp.float32),
            interpret=interpret,
        )(xt, xt, cell, cutoff_arr, mu_p, coeff_p)
        return parts.sum(0)[:g_real]      # summed over frames

    @jax.custom_vjp
    def counts_frames(xyzs):
        return _fwd_frames_call(xyzs)

    def counts_frames_fwd(xyzs):
        return _fwd_frames_call(xyzs), xyzs

    def counts_frames_bwd(xyzs, ct):
        xt, n, n_pad = _pad_frames(xyzs)
        f = xt.shape[0]
        grid_r = n_pad // TILE_R
        ct_p = jnp.zeros((g_pad,), jnp.float32).at[:g_real].set(
            jnp.asarray(ct, jnp.float32))
        kernel = functools.partial(_bwd_kernel_frames, n_pad // TILE_C,
                                   n, g_real)
        dx = pl.pallas_call(
            kernel,
            grid=(f, grid_r),
            in_specs=[
                pl.BlockSpec((1, 3, TILE_R), lambda fi, i: (fi, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, n_pad), lambda fi, i: (fi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, 3, TILE_R),
                                   lambda fi, i: (fi, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((f, 3, n_pad), jnp.float32),
            interpret=interpret,
        )(xt, xt, cell, cutoff_arr, mu_p, coeff_p, ct_p)
        return (jnp.swapaxes(dx[:, :, :xyzs.shape[1]], 1, 2)
                .astype(xyzs.dtype),)

    counts_frames.defvjp(counts_frames_fwd, counts_frames_bwd)
    counts.frames = counts_frames
    return counts
