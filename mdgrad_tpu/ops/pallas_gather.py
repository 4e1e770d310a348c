"""Pallas TPU kernels: neighbor-table gather/scatter as in-VMEM one-hot
matmuls.

SchNet's table aggregation gathers sender features ``rf[idx]`` for an
(N, K) neighbor table.  The XLA fast path (``gather_mode='onehot'``,
nn/schnet.py) expresses the gather as a ``(N*K, N) @ (N, F)`` one-hot
matmul so every adjoint -- including the force's grad-of-grad -- stays on
the MXU.  But XLA *materializes* the (N*K, N) one-hot operand in HBM
(~21 MB bf16 at the 512-atom/K=40 headline) and re-reads it for every
matmul and every transpose; at v5e bandwidth that is ~26 us per use, and
the aggregation appears ~4-6 times per MD step across the energy, force,
and adjoint-replay passes.

These kernels build the one-hot tile-by-tile *inside VMEM* (an iota
compare -- never touches HBM) and contract it against the resident
feature table, so HBM traffic drops to the features and the (E, F)
result only:

  * :func:`table_gather`  -- out[e] = values[idx[e]]  (zero row for the
    padding sentinel ``idx[e] >= n``), an (E, Npad) x (Npad, F) matmul
    per edge tile.
  * :func:`table_scatter` -- out[i] = sum_{e: idx[e]=i} g[e], the exact
    transpose, accumulated over edge tiles.

Both are *linear*, and each one's custom-vjp backward IS the other, so
reverse-mode AD composes to any order (the force's grad-of-grad and the
trajectory adjoint reverse-over-reverse both stay inside the pair) --
the same pattern as ops/pallas_pair.make_lj_force's analytic-HVP
backward.

Exactness: a bf16 hi/lo split of the features (one-hot entries are 0/1,
exact in bf16) gives ~f32-gather accuracy from two bf16 MXU passes --
identical to the XLA path's ``_split_matmul`` (nn/schnet.py:65).  For
bf16 features ``split=False`` does one pass.

Reference parity note: the reference aggregates with serialized CUDA
``scatter_add`` (nff/utils/scatter.py:18-19, nff/nn/graphconv.py:48-51);
there is no TPU analogue of that op worth building -- the matmul form IS
the TPU-native design, this module just stops paying HBM for it.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_E = 512          # edges per grid step
_LANE = 128
_SUBLANE = 8


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _onehot_tile(idx_tile, n_pad, dtype):
    """(TILE_E, n_pad) one-hot from an (TILE_E, 1) int32 index block.

    Sentinel / padding indices (>= n_pad after masking, or the explicit
    sentinel n) simply match no column -> all-zero row, which makes the
    gather return 0 and the scatter drop the edge, with no extra mask.
    """
    cols = jax.lax.broadcasted_iota(jnp.int32, (idx_tile.shape[0], n_pad), 1)
    return (idx_tile == cols).astype(dtype)


def _gather_kernel(split, idx_ref, val_ref, out_ref):
    oh = _onehot_tile(idx_ref[:, :], val_ref.shape[0], jnp.bfloat16)
    vals = val_ref[:, :]
    if split:
        hi = vals.astype(jnp.bfloat16)
        lo = (vals - hi.astype(vals.dtype)).astype(jnp.bfloat16)
        out = jnp.dot(oh, hi, preferred_element_type=jnp.float32)
        out = out + jnp.dot(oh, lo, preferred_element_type=jnp.float32)
    else:
        out = jnp.dot(oh, vals.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    out_ref[:, :] = out.astype(out_ref.dtype)


def _scatter_kernel(split, idx_ref, g_ref, out_ref):
    oh = _onehot_tile(idx_ref[:, :], out_ref.shape[0], jnp.bfloat16)
    g = g_ref[:, :]
    # contract the edge axis: (E_t, Npad)^T @ (E_t, F) -> (Npad, F)
    dims = (((0,), (0,)), ((), ()))
    if split:
        hi = g.astype(jnp.bfloat16)
        lo = (g - hi.astype(g.dtype)).astype(jnp.bfloat16)
        upd = jax.lax.dot_general(oh, hi, dims,
                                  preferred_element_type=jnp.float32)
        upd = upd + jax.lax.dot_general(oh, lo, dims,
                                        preferred_element_type=jnp.float32)
    else:
        upd = jax.lax.dot_general(oh, g.astype(jnp.bfloat16), dims,
                                  preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    out_ref[:, :] += upd.astype(out_ref.dtype)


def _pad_inputs(idx, e, f):
    e_pad = _round_up(max(e, TILE_E), TILE_E)
    f_pad = _round_up(max(f, _LANE), _LANE)
    idx2 = jnp.full((e_pad, 1), jnp.iinfo(jnp.int32).max, jnp.int32)
    idx2 = idx2.at[:e, 0].set(jnp.asarray(idx, jnp.int32))
    return idx2, e_pad, f_pad


@functools.partial(jax.jit,
                   static_argnames=("split", "interpret"))
def _gather_impl(values, idx, split=True, interpret=False):
    n, f = values.shape
    e = idx.shape[0]
    n_pad = _round_up(max(n, _SUBLANE), _SUBLANE)
    idx2, e_pad, f_pad = _pad_inputs(idx, e, f)
    vals = jnp.zeros((n_pad, f_pad), values.dtype)
    vals = vals.at[:n, :f].set(values)
    # indices >= n hit zero-padded rows (n..n_pad-1) or no row at all --
    # either way the output row is exactly 0
    out = pl.pallas_call(
        functools.partial(_gather_kernel, split),
        grid=(e_pad // TILE_E,),
        in_specs=[
            pl.BlockSpec((TILE_E, 1), lambda i: (i, 0)),
            pl.BlockSpec((n_pad, f_pad), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_E, f_pad), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((e_pad, f_pad), values.dtype),
        interpret=interpret,
    )(idx2, vals)
    return out[:e, :f]


@functools.partial(jax.jit,
                   static_argnames=("n", "split", "interpret"))
def _scatter_impl(g, idx, n, split=True, interpret=False):
    e, f = g.shape
    n_pad = _round_up(max(n, _SUBLANE), _SUBLANE)
    idx2, e_pad, f_pad = _pad_inputs(idx, e, f)
    g2 = jnp.zeros((e_pad, f_pad), g.dtype)
    g2 = g2.at[:e, :f].set(g)
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, split),
        grid=(e_pad // TILE_E,),
        in_specs=[
            pl.BlockSpec((TILE_E, 1), lambda i: (i, 0)),
            pl.BlockSpec((TILE_E, f_pad), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((n_pad, f_pad), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, f_pad), g.dtype),
        interpret=interpret,
    )(idx2, g2)
    return out[:n, :f]


_F0 = jax.dtypes.float0


def _int_zero(idx):
    return np.zeros(idx.shape, _F0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def table_gather(values, idx, split=True, interpret=False):
    """``values[idx]`` with a zero row for out-of-range (sentinel) indices.

    values: (N, F) float; idx: (E,) int32 in [0, N] (N = padding sentinel).
    Returns (E, F) in values.dtype.  Linear in ``values``; its vjp is
    :func:`table_scatter` and vice versa, so any grad order works.
    """
    return _gather_impl(values, idx, split=split, interpret=interpret)


def _gather_fwd(values, idx, split, interpret):
    return table_gather(values, idx, split, interpret), (idx, values.shape[0])


def _gather_bwd(split, interpret, res, g):
    idx, n = res
    return (table_scatter(g, idx, n, split, interpret), _int_zero(idx))


table_gather.defvjp(_gather_fwd, _gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def table_scatter(g, idx, n, split=True, interpret=False):
    """Transpose of :func:`table_gather`: out[i] = sum over e with
    idx[e] == i of g[e]; out-of-range indices are dropped.

    g: (E, F); idx: (E,) int32; returns (n, F) in g.dtype.
    """
    return _scatter_impl(g, idx, n, split=split, interpret=interpret)


def _scatter_fwd(g, idx, n, split, interpret):
    return table_scatter(g, idx, n, split, interpret), idx


def _scatter_bwd(n, split, interpret, idx, ct):
    return (table_gather(ct, idx, split, interpret), _int_zero(idx))


table_scatter.defvjp(_scatter_fwd, _scatter_bwd)


# ---------------------------------------------------------------------------
# fused gather * weight -> K-reduction (the whole SchNet table aggregation)
# ---------------------------------------------------------------------------

_TN = 16  # atoms per grid step in the fused kernel


def _gmr_kernel(split, k, idx_ref, w_ref, val_ref, out_ref):
    oh = _onehot_tile(idx_ref[:, :], val_ref.shape[0], jnp.bfloat16)
    vals = val_ref[:, :]
    if split:
        hi = vals.astype(jnp.bfloat16)
        lo = (vals - hi.astype(vals.dtype)).astype(jnp.bfloat16)
        g = jnp.dot(oh, hi, preferred_element_type=jnp.float32)
        g = g + jnp.dot(oh, lo, preferred_element_type=jnp.float32)
    else:
        g = jnp.dot(oh, vals.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    prod = g * w_ref[:, :].astype(jnp.float32)       # (TN*K, F)
    f = prod.shape[-1]
    agg = prod.reshape(_TN, k, f).sum(1)             # (TN, F)
    out_ref[:, :] = agg.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("k", "split", "interpret"))
def _gmr_impl(values, w, idx, k, split=True, interpret=False):
    n_out = idx.shape[0] // k
    n, f = values.shape
    n_pad = _round_up(max(n, _SUBLANE), _SUBLANE)
    f_pad = _round_up(max(f, _LANE), _LANE)
    tile_e = _TN * k
    n_out_pad = _round_up(max(n_out, _TN), _TN)
    e_pad = n_out_pad * k
    idx2 = jnp.full((e_pad, 1), jnp.iinfo(jnp.int32).max, jnp.int32)
    idx2 = idx2.at[:idx.shape[0], 0].set(jnp.asarray(idx, jnp.int32))
    w2 = jnp.zeros((e_pad, f_pad), w.dtype).at[:w.shape[0], :f].set(w)
    vals = jnp.zeros((n_pad, f_pad), values.dtype).at[:n, :f].set(values)
    out = pl.pallas_call(
        functools.partial(_gmr_kernel, split, k),
        grid=(e_pad // tile_e,),
        in_specs=[
            pl.BlockSpec((tile_e, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile_e, f_pad), lambda i: (i, 0)),
            pl.BlockSpec((n_pad, f_pad), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_TN, f_pad), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_out_pad, f_pad), w.dtype),
        interpret=interpret,
    )(idx2, w2, vals)
    return out[:n_out, :f]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def gather_mul_reduce(values, w, idx, k, split=True, interpret=False):
    """``out[i] = sum_k values[idx[i*K+k]] * w[i*K+k]`` -- the SchNet table
    aggregation (sender-feature gather x edge filter, reduced over the
    K neighbor slots) in ONE kernel pass: the gathered (E, F) tensor
    never exists in HBM.

    values: (N, F); w: (E, F) with E = n_out * k, atom-major edge order
    (= ``idx.reshape(-1)`` of an (n_out, K) table), masked/padded edges
    carried by the sentinel index (>= N -> zero row) or zero weight.
    Returns (E // k, F) in w.dtype.

    Bilinear in (values, w); the custom-vjp backward is built from
    :func:`table_gather` / :func:`table_scatter` + elementwise ops, so
    reverse-mode composes to any order (force grad-of-grad included).
    """
    return _gmr_impl(values, w, idx, k, split=split, interpret=interpret)


def _gmr_fwd(values, w, idx, k, split, interpret):
    return (gather_mul_reduce(values, w, idx, k, split, interpret),
            (values, w, idx))


def _gmr_bwd(k, split, interpret, res, ct):
    values, w, idx = res
    f = values.shape[1]
    ct_e = jnp.repeat(ct, k, axis=0).astype(jnp.float32)   # (E, F)
    gathered = table_gather(values, idx, split, interpret).astype(
        jnp.float32)
    d_w = (gathered * ct_e).astype(w.dtype)
    d_vals = table_scatter((w.astype(jnp.float32) * ct_e), idx,
                           values.shape[0], split,
                           interpret).astype(values.dtype)
    return d_vals, d_w, _int_zero(idx)


gather_mul_reduce.defvjp(_gmr_fwd, _gmr_bwd)
