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
    """
    idx: jnp.ndarray
    offsets: jnp.ndarray
    mask: jnp.ndarray
    count: jnp.ndarray
    overflow: jnp.ndarray

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


def min_image(disp, cell):
    """Apply the minimum-image convention to displacement vectors.

    General triclinic: project on the (not necessarily orthonormal) cell
    basis and shift fractional components outside [-0.5, 0.5] by +-1
    (parity: reference topology.py:55-64).

    Returns (wrapped displacement, fractional offsets in {-1,0,1}).
    """
    cell = jnp.asarray(cell)
    if cell.ndim == 1:
        cell = jnp.diag(cell)
    reduced = _mm(disp, jnp.linalg.inv(cell))
    offsets = (-(reduced > 0.5).astype(disp.dtype)
               + (reduced < -0.5).astype(disp.dtype))
    return disp + _mm(offsets, cell), offsets


def displacement_matrix(xyz, cell):
    """Dense minimum-image displacement matrix.

    d[i, j] = xyz[j] - xyz[i] (min-imaged), matching the reference's
    ``dis_mat`` orientation (topology.py:35).
    """
    disp = xyz[..., None, :, :] - xyz[..., :, None, :]
    return min_image(disp, cell)


def distance_matrix(xyz, cell):
    """Dense minimum-image distances with a safe diagonal.

    Returns (dist (N,N), valid (N,N) bool) where valid excludes self-pairs.
    The diagonal distance is clamped to 1 so downstream r**-12 terms stay
    finite; callers must apply ``valid``.
    """
    d, _ = displacement_matrix(xyz, cell)
    dist_sq = (d ** 2).sum(-1)
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
    d, offsets = displacement_matrix(xyz, cell)
    dist_sq = (d ** 2).sum(-1)
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
                    offsets[jnp.minimum(i, n - 1), jnp.minimum(j, n - 1)],
                    0.0)
    return NeighborList(idx=idx, offsets=off, mask=pair_mask, count=count,
                        overflow=count > capacity)


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
    if cell.ndim == 1:
        cell = jnp.diag(cell)
    n = xyz.shape[-2]
    ext = jnp.concatenate([xyz, jnp.zeros_like(xyz[:1])], axis=-2)
    d = ext[nbr_idx[:, 0]] - ext[nbr_idx[:, 1]] - _mm(offsets, cell)
    # padded rows (index n) must yield a *safe* distance BEFORE any
    # potential sees it: u'(r->0) = inf and 0 * inf = NaN in the force
    # (grad) pass even under masking -- the classic where-gradient trap.
    valid = nbr_idx[:, 0] < n
    dist_sq = jnp.where(valid, (d ** 2).sum(-1), 1.0)
    return jnp.sqrt(dist_sq)[:, None]


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
