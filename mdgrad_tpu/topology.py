"""Periodic-boundary geometry kernels: minimum image, neighbor lists, angles.

Parity target: /root/reference/torchmd/topology.py.  The reference builds a
dense O(N^2) displacement matrix on GPU every step and extracts a *dynamic*
(i, j) pair list with ``torch.nonzero`` (topology.py:30-73).  Dynamic shapes
do not compile on TPU/XLA, so this module provides two static-shape designs:

  1. **Dense mode** -- skip the pair list entirely: evaluate pair quantities
     on the full (masked) NxN minimum-image distance matrix.  On TPU this is
     usually *faster* than list-building for N <~ 2k: it is one fused
     elementwise pipeline with no gather/scatter, recomputed exactly every
     step (so no stale-topology error, no rebuild scheduling).

  2. **Padded sparse mode** -- a fixed-capacity :class:`NeighborList`
     (idx, offsets, mask, overflow) built with ``jnp.nonzero(size=...)``,
     needed where per-edge features exist (SchNet message passing) or N is
     large.  Overflow is detected, never silent.

Conventions match the reference: minimum-image offsets live in {-1, 0, 1}
(fractional, times the cell) for general triclinic cells
(topology.py:59-64); pair lists are upper-triangular (i < j)
(topology.py:66-68); ``compute_dis`` recomputes distances differentiably
from positions given frozen integer offsets (topology.py:5-12).
"""

import typing

import jax
import jax.numpy as jnp
import numpy as np


class NeighborList(typing.NamedTuple):
    """Fixed-capacity padded pair list (a JAX pytree).

    idx:      (P, 2) int32, padded entries point at the out-of-range index N
    offsets:  (P, 3) float, minimum-image fractional offsets in {-1,0,1}
    mask:     (P,) bool, True for real pairs
    count:    () int32, number of real pairs
    overflow: () bool, True if capacity was exceeded (results invalid)
    drift:    () bool, True if positions sat outside single-image
              minimum-image validity at build time (:func:`image_drift`)
    """
    idx: jnp.ndarray
    offsets: jnp.ndarray
    mask: jnp.ndarray
    count: jnp.ndarray
    overflow: jnp.ndarray
    drift: typing.Any = False

    @property
    def capacity(self):
        return self.idx.shape[0]


def _mm(a, b):
    """Matmul at HIGHEST precision.

    Geometry projections (disp @ cell^-1, offsets @ cell) are tiny 3x3
    contractions; on TPU the default matmul precision routes them through
    bf16 MXU passes, which injects ~1e-3 relative error into *positions* --
    catastrophic for minimum-image decisions near cell boundaries.  Forcing
    HIGHEST keeps them in f32 on the VPU at negligible cost.
    """
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _is_diagonal(cell):
    """Trace-time check: concrete cells with zero off-diagonals take the
    cheap elementwise minimum-image path."""
    try:
        c = np.asarray(cell)
    except Exception:
        return False
    return c.ndim == 2 and not np.any(c - np.diag(np.diag(c)))


def min_image(disp, cell):
    """Apply the minimum-image convention to displacement vectors.

    General triclinic: project on the (not necessarily orthonormal) cell
    basis and shift fractional components outside [-0.5, 0.5] by +-1
    (parity: reference topology.py:55-64).  Orthorhombic (diagonal) cells
    -- every in-repo workload -- skip the two 3x3 projections: on TPU
    those HIGHEST-precision matmuls over (..., N, N, 3) dominate the whole
    distance-matrix cost.

    A 1-D ``cell`` argument means diagonal lengths (L,) and always takes
    the elementwise path -- including when it is a *traced* value (per-
    state cells in the sharded multi-state fit, parallel/multistate.py).

    Returns (wrapped displacement, fractional offsets in {-1,0,1}).
    """
    cell = jnp.asarray(cell)
    if cell.ndim == 1 or _is_diagonal(cell):
        L = cell if cell.ndim == 1 else jnp.diag(cell)
        offsets = (-(disp > 0.5 * L).astype(disp.dtype)
                   + (disp < -0.5 * L).astype(disp.dtype))
        return disp + offsets * L, offsets
    reduced = _mm(disp, jnp.linalg.inv(cell))
    offsets = (-(reduced > 0.5).astype(disp.dtype)
               + (reduced < -0.5).astype(disp.dtype))
    return disp + _mm(offsets, cell), offsets


def image_drift(xyz, cell):
    """Traced bool: positions sit outside single-image min-image validity.

    Every minimum-image path in the library takes offsets from
    ``(d > 0.5 L)`` comparisons -- offsets in {-1,0,1} -- which is correct
    only while every pair separation component stays below 1.5 L.  A
    SUFFICIENT position-space condition is that every (fractional)
    coordinate lies in [-0.25, 1.25]: then no pair can exceed 1.5 L.  This
    flags the complement: unwrapped drift has carried some atom far enough
    that minimum-image distances MAY be silently wrong (the round-4
    DiffTRe failure mode: 3000-6000-step single-epoch scans integrated
    unwrapped, crossed ~1.5 L, and forces went wrong without any NaN).
    O(N) -- cheap enough to ride every neighbor build.
    """
    cell = jnp.asarray(cell)
    if cell.ndim == 1 or _is_diagonal(cell):
        L = cell if cell.ndim == 1 else jnp.diag(cell)
        frac = xyz / L
    else:
        frac = _mm(xyz, jnp.linalg.inv(cell))
    return jnp.any((frac < -0.25) | (frac > 1.25))


def displacement_matrix(xyz, cell):
    """Dense minimum-image displacement matrix.

    d[i, j] = xyz[j] - xyz[i] (min-imaged), matching the reference's
    ``dis_mat`` orientation (topology.py:35).
    """
    disp = xyz[..., None, :, :] - xyz[..., :, None, :]
    return min_image(disp, cell)


def _disp_planes(xyz, cell):
    """Coordinate-major displacement planes: (3, N, N) d and offsets.

    TPU layout note: the naive (N, N, 3) tensor puts the xyz axis on the
    128-wide lane dimension (3 lanes used, 125 wasted); coordinate-major
    planes keep N on lanes and are several times faster.  Only the
    diagonal-cell path benefits; triclinic falls back to the vector form.
    """
    cell = jnp.asarray(cell)
    if cell.ndim == 1 or _is_diagonal(cell):
        L = cell if cell.ndim == 1 else jnp.diag(cell)
        xt = jnp.moveaxis(xyz, -1, -2)               # (..., 3, N)
        d = xt[..., None, :] - xt[..., :, None]      # d[c, i, j] = xj - xi
        Lc = L[:, None, None]
        offsets = (-(d > 0.5 * Lc).astype(d.dtype)
                   + (d < -0.5 * Lc).astype(d.dtype))
        return d + offsets * Lc, offsets
    d, off = displacement_matrix(xyz, cell)
    return jnp.moveaxis(d, -1, 0), jnp.moveaxis(off, -1, 0)


def distance_matrix(xyz, cell):
    """Dense minimum-image distances with a safe diagonal.

    Returns (dist (N,N), valid (N,N) bool) where valid excludes self-pairs.
    The diagonal distance is clamped to 1 so downstream r**-12 terms stay
    finite; callers must apply ``valid``.
    """
    d, _ = _disp_planes(xyz, cell)
    dist_sq = (d ** 2).sum(0)
    n = xyz.shape[-2]
    eye = jnp.eye(n, dtype=bool)
    safe = jnp.where(eye, 1.0, dist_sq)
    return jnp.sqrt(safe), ~eye


def pair_index_mask(n, index_tuple=None, ex_pairs=None):
    """Host-side (numpy) NxN boolean selection mask.

    ``index_tuple=(idx_a, idx_b)`` restricts to species-pair interactions
    (reference topology.py:15-27, used for partial RDFs / mixtures);
    ``ex_pairs`` (E, 2) removes bonded exclusions (topology.py:44-53).
    Returns None when no restriction applies (the common case).
    """
    if index_tuple is None and ex_pairs is None:
        return None
    if index_tuple is not None:
        mask = np.zeros((n, n), dtype=bool)
        a = np.asarray(index_tuple[0]).reshape(-1)
        b = np.asarray(index_tuple[1]).reshape(-1)
        mask[np.ix_(a, b)] = True
        mask[np.ix_(b, a)] = True
    else:
        mask = np.ones((n, n), dtype=bool)
    if ex_pairs is not None:
        ex = np.asarray(ex_pairs)
        mask[ex[:, 0], ex[:, 1]] = False
        mask[ex[:, 1], ex[:, 0]] = False
    return jnp.asarray(mask)


def _cutoff_mask(xyz, cell, cutoff, select_mask):
    d, offsets = _disp_planes(xyz, cell)             # (3, N, N)
    dist_sq = (d ** 2).sum(0)
    n = xyz.shape[-2]
    iu = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
    mask = iu & (dist_sq < cutoff ** 2)
    if select_mask is not None:
        mask = mask & select_mask
    return mask, offsets, dist_sq


def generate_nbr_list(xyz, cutoff, cell, capacity, select_mask=None):
    """Build a padded :class:`NeighborList` (jit-compatible, static shapes).

    Parity: reference ``generate_nbr_list`` (topology.py:30-73) -- upper
    triangular (i<j) pairs within ``cutoff`` under minimum image -- but with
    a fixed ``capacity`` so XLA shapes stay static.  Gradients do not flow
    through list construction (indices/offsets are data), matching the
    reference which detaches the list (interface.py:259-260); distances are
    recomputed differentiably by :func:`compute_dis`.
    """
    xyz = jax.lax.stop_gradient(xyz)
    mask, offsets, _ = _cutoff_mask(xyz, cell, cutoff, select_mask)
    n = xyz.shape[-2]
    count = mask.sum(dtype=jnp.int32)
    i, j = jnp.nonzero(mask, size=capacity, fill_value=n)
    idx = jnp.stack([i, j], axis=-1).astype(jnp.int32)
    pair_mask = i < n
    off = jnp.where(pair_mask[:, None],
                    offsets[:, jnp.minimum(i, n - 1),
                            jnp.minimum(j, n - 1)].T,
                    0.0)
    return NeighborList(idx=idx, offsets=off, mask=pair_mask, count=count,
                        overflow=count > capacity,
                        drift=image_drift(xyz, cell))


def generate_nbr_list_topk(xyz, cutoff, cell, k_max, select_mask=None,
                           directed=False):
    """top_k-based padded :class:`NeighborList` -- the TPU fast path.

    ``jnp.nonzero(size=...)`` lowers to an O(N^2 log N^2) sort on TPU and
    dominates per-step cost (measured ~4x the SchNet forward at N=512).
    This builder instead takes each atom's ``k_max`` nearest in-cutoff
    neighbors with ``lax.top_k`` over the dense distance matrix and emits
    a padded pair list of capacity N*k_max.  Exact whenever no atom has
    more than ``k_max`` neighbors (overflow is flagged otherwise).

    directed=False: emit the (i < j) half (drop-in for generate_nbr_list;
    ~half the slots are padding).  directed=True: emit ALL
    (receiver, sender) rows -- every real slot used -- for consumers that
    aggregate one direction per edge (SchNet's directed mode).
    """
    xyz = jax.lax.stop_gradient(xyz)
    d, offsets = _disp_planes(xyz, cell)
    dist_sq = (d ** 2).sum(0)
    n = xyz.shape[-2]
    eye = jnp.eye(n, dtype=bool)
    within = (dist_sq < cutoff ** 2) & ~eye
    if select_mask is not None:
        within = within & select_mask
    score = jnp.where(within, dist_sq, jnp.inf)
    neg_top, cols = jax.lax.top_k(-score, k_max)          # (N, K)
    valid = neg_top > -jnp.inf
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], (n, k_max))
    if directed:
        keep = valid
    else:
        # undirected (i < j) representation, like generate_nbr_list
        keep = valid & (rows < cols)
    i = jnp.where(keep, rows, n).reshape(-1)
    j = jnp.where(keep, cols, n).reshape(-1)
    idx = jnp.stack([i, j], axis=-1).astype(jnp.int32)
    off = jnp.where(keep.reshape(-1)[:, None],
                    offsets[:, jnp.minimum(rows, n - 1),
                            jnp.minimum(cols, n - 1)].reshape(3, -1).T,
                    0.0)
    count = keep.sum(dtype=jnp.int32)
    # overflow: some atom has more in-cutoff neighbors than k_max
    overflow = (within.sum(-1) > k_max).any()
    return NeighborList(idx=idx, offsets=off, mask=i < n, count=count,
                        overflow=overflow, drift=image_drift(xyz, cell))


class NeighborTable(typing.NamedTuple):
    """Per-atom fixed-width neighbor table (a JAX pytree).

    table:    (N, K) int32 neighbor indices, padded with N
    offsets:  (N, K, 3) fractional minimum-image offsets of each edge, or
              () when the consumer re-derives minimum image on the fly
              (diagonal cells; see ``store_offsets=False``)
    mask:     (N, K) bool
    overflow: () bool -- some atom exceeded K in-cutoff neighbors
    drift:    () bool -- positions outside single-image validity at build
    """
    table: jnp.ndarray
    offsets: jnp.ndarray
    mask: jnp.ndarray
    overflow: jnp.ndarray
    drift: typing.Any = False


def generate_neighbor_table(xyz, cutoff, cell, k_max, select_mask=None,
                            store_offsets=True):
    """(N, K) neighbor table -- the gather-only edge format.

    Message passing over a table needs NO scatter: agg[i] =
    sum_k f(r[table[i, k]]), a gather + K-axis reduction, which maps to
    the TPU far better than segment-sum scatters over flat edge lists.

    The K-nearest selection uses ``lax.approx_min_k`` at
    ``recall_target=1.0`` -- exact results through the TPU's PartialReduce
    op, measurably faster than the sort-based ``lax.top_k`` lowering.

    ``store_offsets=False`` (diagonal cells only) skips materializing the
    (N, K, 3) offsets: consumers recompute minimum image elementwise from
    the gathered positions, which removes the (3, N, N) -> (N, K) offset
    gather that dominates the build.
    """
    xyz = jax.lax.stop_gradient(xyz)
    d, offsets = _disp_planes(xyz, cell)
    dist_sq = (d ** 2).sum(0)
    n = xyz.shape[-2]
    eye = jnp.eye(n, dtype=bool)
    within = (dist_sq < cutoff ** 2) & ~eye
    if select_mask is not None:
        within = within & select_mask
    score = jnp.where(within, dist_sq, jnp.inf)
    vals, cols = jax.lax.approx_min_k(score, k_max, recall_target=1.0)
    valid = vals < jnp.inf
    table = jnp.where(valid, cols, n).astype(jnp.int32)
    overflow = (within.sum(-1) > k_max).any()
    if not store_offsets:
        if not (jnp.asarray(cell).ndim == 1 or _is_diagonal(cell)):
            raise ValueError("store_offsets=False requires a diagonal cell")
        return NeighborTable(table=table, offsets=(), mask=valid,
                             overflow=overflow,
                             drift=image_drift(xyz, cell))
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], (n, k_max))
    off = jnp.where(valid[..., None],
                    jnp.moveaxis(offsets[:, rows, cols], 0, -1), 0.0)
    return NeighborTable(table=table, offsets=off, mask=valid,
                         overflow=overflow, drift=image_drift(xyz, cell))


def count_pairs(xyz, cutoff, cell, select_mask=None):
    """Number of (i<j) pairs within cutoff -- for capacity estimation."""
    mask, _, _ = _cutoff_mask(jnp.asarray(xyz), cell, cutoff, select_mask)
    return int(mask.sum())


def estimate_capacity(xyz, cutoff, cell, select_mask=None, slack=1.35,
                      multiple=128):
    """Host-side capacity heuristic: current pair count x slack, rounded up
    to a lane-friendly multiple of 128."""
    c = count_pairs(xyz, cutoff, cell, select_mask)
    cap = int(np.ceil(max(c, 1) * slack / multiple) * multiple)
    return cap


def compute_dis(xyz, nbr_idx, offsets, cell):
    """Differentiable pair distances for a (padded) neighbor list.

    Parity: reference ``compute_dis`` (topology.py:5-12):
    ``|xyz[i] - xyz[j] - offsets @ cell|``.  Padded rows (index N) are
    gathered against a sentinel row so the result is finite; apply the
    list's mask downstream.
    """
    cell = jnp.asarray(cell)
    n = xyz.shape[-2]
    ext = jnp.concatenate([xyz, jnp.zeros_like(xyz[:1])], axis=-2)
    off_real = (offsets * cell if cell.ndim == 1
                else _mm(offsets, cell))
    d = ext[nbr_idx[:, 0]] - ext[nbr_idx[:, 1]] - off_real
    # padded rows (index n) must yield a *safe* distance BEFORE any
    # potential sees it: u'(r->0) = inf and 0 * inf = NaN in the force
    # (grad) pass even under masking -- the classic where-gradient trap.
    valid = nbr_idx[:, 0] < n
    dist_sq = jnp.where(valid, (d ** 2).sum(-1), 1.0)
    return jnp.sqrt(dist_sq)[:, None]


def aux_overflow(aux):
    """True if any neighbor structure in an aux pytree overflowed.

    Works for a bare NeighborList/NeighborTable/CellList-style NamedTuple
    (anything with an ``overflow`` leaf), a Stack's dict of child auxes,
    or arbitrary nesting of those.  Host-side helper (forces a sync);
    drivers poll it at epoch boundaries -- overflow means neighbors were
    silently dropped and results are invalid until capacity is raised.
    """
    if aux is None or (isinstance(aux, tuple) and len(aux) == 0):
        return False
    if isinstance(aux, dict):
        return any(aux_overflow(a) for a in aux.values())
    if isinstance(aux, (list, tuple)) and not hasattr(aux, "_fields"):
        return any(aux_overflow(a) for a in aux)
    ov = getattr(aux, "overflow", None)
    if ov is None:
        return False
    return bool(np.any(np.asarray(ov)))


def aux_drift(aux):
    """True if any neighbor structure in an aux pytree was built from
    positions outside single-image minimum-image validity (see
    :func:`image_drift`).  Same traversal/usage pattern as
    :func:`aux_overflow`: drivers poll at epoch boundaries.  Drift means
    positions must be (re)wrapped -- distances may already be silently
    wrong -- whereas overflow means capacity must be raised."""
    if aux is None or (isinstance(aux, tuple) and len(aux) == 0):
        return False
    if isinstance(aux, dict):
        return any(aux_drift(a) for a in aux.values())
    if isinstance(aux, (list, tuple)) and not hasattr(aux, "_fields"):
        return any(aux_drift(a) for a in aux)
    dr = getattr(aux, "drift", None)
    if dr is None:
        return False
    return bool(np.any(np.asarray(dr)))


def aux_overflow_traced(aux):
    """Traced counterpart of :func:`aux_overflow`: returns a jnp bool
    scalar (ORs every ``overflow`` leaf), usable inside jit/vmap -- the
    sharded multi-state fit returns it per state so drivers can poll
    overflow without a host-side pytree walk."""
    flag = jnp.asarray(False)
    if aux is None or (isinstance(aux, tuple) and len(aux) == 0):
        return flag
    if isinstance(aux, dict):
        vals = aux.values()
    elif isinstance(aux, (list, tuple)) and not hasattr(aux, "_fields"):
        vals = aux
    else:
        ov = getattr(aux, "overflow", None)
        return flag if ov is None else jnp.any(jnp.asarray(ov))
    for a in vals:
        flag = jnp.logical_or(flag, aux_overflow_traced(a))
    return flag


def get_offsets(vecs, cell_len):
    """Re-wrap bond vectors for a diagonal cell (reference topology.py:75-80).

    Returns offsets in {-1,0,1} * cell_len convention: the reference
    multiplies these by the *diagonal* cell elementwise.
    """
    cell_len = jnp.asarray(cell_len)
    return (-(vecs >= 0.5 * cell_len).astype(vecs.dtype)
            + (vecs < -0.5 * cell_len).astype(vecs.dtype))


def wrap_bond_vectors(vecs, cell_len):
    """Minimum-image bond vectors for a diagonal cell."""
    return vecs + get_offsets(vecs, cell_len) * cell_len


# ---------------------------------------------------------------------------
# per-atom neighbor table and angle triples (TPU-friendly angle observables)
# ---------------------------------------------------------------------------

def neighbors_per_atom(xyz, cutoff, cell, k_max):
    """(N, K) per-atom neighbor table, padded with index N.

    The reference builds angle triples by joining a flat pair list
    (topology.py:83-105), which is quadratic in the *edge* count.  On TPU a
    per-atom table is the natural static-shape layout: row i holds up to
    ``k_max`` neighbors of atom i (both directions), padded with N.
    """
    xyz = jax.lax.stop_gradient(xyz)
    d, _ = displacement_matrix(xyz, cell)
    dist_sq = (d ** 2).sum(-1)
    n = xyz.shape[-2]
    eye = jnp.eye(n, dtype=bool)
    within = (dist_sq < cutoff ** 2) & ~eye
    # top-k by "is a neighbor" then by index: take the k_max smallest
    # distances among valid entries
    score = jnp.where(within, dist_sq, jnp.inf)
    k_max = min(k_max, n)
    neg_top, idx = jax.lax.top_k(-score, k_max)
    valid = jnp.isfinite(-neg_top)
    idx = jnp.where(valid, idx, n)
    count = within.sum(-1)
    return idx, valid, jnp.max(count)


def angle_triples(nbr_table, nbr_valid):
    """All (j, i, k) angle triples with i the apex, from a per-atom table.

    Returns idx (N, K, K, 3) and mask (N, K, K); j != k enforced.  The apex
    convention matches reference ``compute_angle`` (observable.py:166-179)
    where bond vectors point from the center atom to each neighbor.
    """
    n, k = nbr_table.shape
    centers = jnp.broadcast_to(
        jnp.arange(n)[:, None, None], (n, k, k))
    j = jnp.broadcast_to(nbr_table[:, :, None], (n, k, k))
    kk = jnp.broadcast_to(nbr_table[:, None, :], (n, k, k))
    mask = (nbr_valid[:, :, None] & nbr_valid[:, None, :]
            & (j < kk))  # j < k: count each angle once
    return jnp.stack([j, centers, kk], axis=-1), mask
