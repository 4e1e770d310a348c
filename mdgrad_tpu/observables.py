"""Differentiable observables: RDF, VACF, angle distributions, dihedrals.

Parity target: /root/reference/torchmd/observable.py.  These are the loss
heads of the framework: gradients of g(r) / VACF / p(theta) flow back
through the MD trajectory into potential parameters.

TPU-native design notes:

  * The RDF soft histogram (Gaussian smearing of pair distances,
    reference observable.py:70) is evaluated **densely**: per frame we form
    the masked NxN minimum-image distance matrix and contract it against the
    Gaussian basis -- one fused elementwise+reduction pipeline, vmapped over
    frames, no dynamic pair extraction (the reference rebuilds a dynamic
    neighbor list per call, observable.py:64-68).
  * Shell-volume normalization ``generate_vol_bins`` supports dim=3 and
    dim=2 exactly as reference observable.py:10-21.
  * Angle distributions use a per-atom fixed-capacity neighbor table
    (:func:`mdgrad_tpu.topology.neighbors_per_atom`) instead of the
    reference's quadratic edge-list join (topology.py:83-105).
"""

import numpy as np
import jax
import jax.numpy as jnp

from . import topology
from .nn.layers import GaussianSmearing
from .system import check_system


def generate_vol_bins(start, end, nbins, dim):
    """Shell volumes + bin edges (reference observable.py:10-21)."""
    bins = np.linspace(start, end, nbins + 1)
    if dim == 3:
        vol_bins = 4 * np.pi / 3 * (bins[1:] ** 3 - bins[:-1] ** 3)
        V = (4 / 3) * np.pi * end ** 3
    elif dim == 2:
        vol_bins = np.pi * (bins[1:] ** 2 - bins[:-1] ** 2)
        V = np.pi * end ** 2
    else:
        raise ValueError("dim must be 2 or 3")
    return V, jnp.asarray(vol_bins), jnp.asarray(bins)


class rdf:
    """Soft-histogram radial distribution function
    (parity: reference observable.py:33-76, incl. ``index_tuple`` partial
    RDFs for mixtures).  Call with xyz of shape (N, 3) or (F, N, 3);
    returns (count, bins, g_r), all differentiable in xyz.
    """

    def __init__(self, system, nbins, r_range, index_tuple=None, width=None,
                 backend="xla"):
        check_system(system)
        start, end = r_range
        self.V, self.vol_bins, self.bins = generate_vol_bins(
            start, end, nbins, dim=system.dim)
        self.smear = GaussianSmearing(start=start, stop=float(self.bins[-1]),
                                      n_gaussians=nbins, width=width)
        self.nbins = nbins
        self.cell = jnp.asarray(system.get_cell())
        self.cutoff_boundary = end + 0.5
        self.select_mask = topology.pair_index_mask(
            system.get_number_of_atoms(), index_tuple, None)
        self.r_axis = np.linspace(start, end, nbins)
        self.backend = backend
        if backend == "pallas":
            # streaming soft-histogram kernel: O(tile) memory instead of
            # the (N, N, G) XLA intermediate (see ops/pallas_rdf.py);
            # diagonal cells, no index_tuple selection
            if index_tuple is not None:
                raise ValueError("pallas rdf backend does not support "
                                 "index_tuple")
            from .ops.pallas_rdf import make_pallas_rdf
            try:
                on_cpu = jax.default_backend() == "cpu"
            except Exception:  # pragma: no cover - no devices
                on_cpu = True
            self._pallas_counts = make_pallas_rdf(
                np.diag(np.asarray(system.get_cell())),
                np.asarray(self.smear.offsets),
                np.asarray(self.smear.widths), self.cutoff_boundary,
                interpret=on_cpu)

    def _frame_counts(self, xyz):
        dist, valid = topology.distance_matrix(xyz, self.cell)
        n = dist.shape[-1]
        mask = valid & jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
        mask = mask & (dist < self.cutoff_boundary)
        if self.select_mask is not None:
            mask = mask & self.select_mask
        # (N, N, G) gaussian expansion contracted over masked pairs
        g = self.smear(dist[..., None])
        return (g * mask[..., None]).sum((0, 1))

    def __call__(self, xyz):
        xyz = jnp.asarray(xyz)
        frame_fn = (self._pallas_counts if self.backend == "pallas"
                    else self._frame_counts)
        if xyz.ndim == 2:
            count = frame_fn(xyz)
        elif self.backend == "pallas":
            # frame-batched kernel: one pallas_call with grid
            # (F, row_tiles) -- frames stream through the grid pipeline
            # (round 1 unrolled a Python loop of F separate calls)
            count = self._pallas_counts.frames(xyz)
        else:
            count = jax.vmap(self._frame_counts)(xyz).sum(0)
        count = count / count.sum()
        g_r = count / (self.vol_bins / self.V)
        return count, self.bins, g_r


class vacf:
    """Velocity autocorrelation over lag windows
    (parity: reference observable.py:153-163).  Input: (T, N, 3) velocity
    trajectory; output: (t_range,) correlation, differentiable.

    TPU design: one (T, T) gram matmul over the flattened (N*3) axis on
    the MXU, then a diagonal-band gather -- constant-size jaxpr in
    ``t_range`` (the reference, and our round-1 version, unrolled a Python
    loop over lags: t_range jaxpr copies and a compile-time trap)."""

    def __init__(self, system, t_range):
        check_system(system)
        self.t_range = t_range

    def __call__(self, vel):
        vel = jnp.asarray(vel)
        T = vel.shape[0]
        tr = self.t_range
        S = vel.reshape(T, -1)
        # gram[i, j] = v_i . v_j ; lag-t correlation = mean of the t-th
        # superdiagonal band.  HIGHEST precision: correlation decays to
        # ~1e-3 of C(0) and bf16 accumulation would swamp the tail.
        gram = jnp.matmul(S, S.T, precision=jax.lax.Precision.HIGHEST)
        padded = jnp.pad(gram, ((0, 0), (0, tr)))
        rows = jnp.arange(T)[:, None]
        band = padded[rows, rows + jnp.arange(tr)[None, :]]  # (T, t_range)
        valid = rows + jnp.arange(tr)[None, :] < T
        denom = valid.sum(0) * S.shape[1]
        return (band * valid).sum(0) / denom


def compute_angle(xyz, angle_list, cell, N):
    """cos(theta) for (frame, j, i, k) angle triples
    (parity: reference observable.py:166-179; apex is the middle index)."""
    xyz = xyz.reshape(-1, N, 3)
    cell_len = jnp.diag(jnp.asarray(cell)) if jnp.asarray(cell).ndim == 2 \
        else jnp.asarray(cell)
    v1 = xyz[angle_list[:, 0], angle_list[:, 1]] \
        - xyz[angle_list[:, 0], angle_list[:, 2]]
    v2 = xyz[angle_list[:, 0], angle_list[:, 3]] \
        - xyz[angle_list[:, 0], angle_list[:, 2]]
    v1 = topology.wrap_bond_vectors(v1, cell_len)
    v2 = topology.wrap_bond_vectors(v2, cell_len)
    dot = (v1 * v2).sum(-1)
    norm = jnp.sqrt((v1 ** 2).sum(-1) * (v2 ** 2).sum(-1))
    return dot / norm


class angle_distribution:
    """Soft histogram of bond angles within a cutoff
    (parity: reference observable.py:112-151)."""

    def __init__(self, system, nbins, angle_range, cutoff=3.0, width=None,
                 k_max=16):
        check_system(system)
        start, end = angle_range
        self.bins = jnp.linspace(start, end, nbins + 1)
        self.smear = GaussianSmearing(start=start, stop=end,
                                      n_gaussians=nbins, width=width)
        self.cutoff = cutoff
        self.cell = jnp.asarray(system.get_cell())
        self.natoms = system.get_number_of_atoms()
        self.k_max = k_max
        self.cell_len = jnp.asarray(np.diag(system.get_cell()))

    def _frame_angles(self, xyz):
        table, valid, max_count = topology.neighbors_per_atom(
            xyz, self.cutoff, self.cell, self.k_max)
        overflow = max_count > self.k_max
        triples, mask = topology.angle_triples(table, valid)
        n = self.natoms
        ext = jnp.concatenate([xyz, jnp.zeros_like(xyz[:1])], axis=0)
        j, i, k = triples[..., 0], triples[..., 1], triples[..., 2]
        v1 = ext[j] - ext[i]
        v2 = ext[k] - ext[i]
        v1 = topology.wrap_bond_vectors(v1, self.cell_len)
        v2 = topology.wrap_bond_vectors(v2, self.cell_len)
        dot = (v1 * v2).sum(-1)
        norm = jnp.sqrt((v1 ** 2).sum(-1) * (v2 ** 2).sum(-1) + 1e-20)
        cos = jnp.clip(dot / norm, -0.999999, 0.999999)
        angles = jnp.arccos(cos)
        counts = (self.smear(angles[..., None]) * mask[..., None]).sum((0, 1, 2))
        return counts, angles, mask, overflow

    def __call__(self, xyz):
        """Returns (bins, count, (angles, mask, overflow)); ``overflow``
        is True when some atom had more than k_max in-cutoff neighbors --
        triples were then DROPPED and the distribution is biased; raise
        k_max accordingly (dense liquids at wide cutoffs need k_max of
        order the coordination number)."""
        xyz = jnp.asarray(xyz).reshape(-1, self.natoms, 3)
        counts, angles, mask, overflow = jax.vmap(self._frame_angles)(xyz)
        count = counts.sum(0)
        count = count / count.sum()
        return self.bins, count, (angles, mask, overflow.any())


class Angles:
    """Raw cos(angle) observable over dynamically detected triples
    (parity: reference observable.py:78-110; angle_distribution wraps the
    same machinery with a soft histogram)."""

    def __init__(self, system, nbins=None, angle_range=None, cutoff=3.0,
                 k_max=16):
        check_system(system)
        self._dist = angle_distribution(
            system, nbins or 64, angle_range or (0.5, np.pi),
            cutoff=cutoff, k_max=k_max)

    def __call__(self, xyz):
        _, _, (angles, mask, _overflow) = self._dist(xyz)
        return jnp.cos(angles), mask


def compute_dihe(xyz, dihes):
    """cos(phi) of dihedrals (parity: reference observable.py:181-197)."""
    assert xyz.ndim == 3
    d = xyz[:, None, :, :] - xyz[:, :, None, :]
    vec1 = d[:, dihes[:, 1], dihes[:, 0]]
    vec2 = d[:, dihes[:, 1], dihes[:, 2]]
    vec3 = d[:, dihes[:, 2], dihes[:, 1]]
    vec4 = d[:, dihes[:, 2], dihes[:, 3]]
    cross1 = jnp.cross(vec1, vec2)
    cross2 = jnp.cross(vec3, vec4)
    norm = jnp.sqrt((cross1 ** 2).sum(-1) * (cross2 ** 2).sum(-1) + 1e-20)
    return (cross1 * cross2).sum(-1) / norm


def signed_dihedrals(xyz, quads):
    """Signed dihedral angles phi in (-pi, pi] for (a, b, c, d) quads.

    atan2 formulation (no arccos branch ambiguity, grad-safe at phi=0):
    b1 = b-a, b2 = c-b, b3 = d-c; phi = atan2((n1 x n2) . b2_hat, n1 . n2)
    with n1 = b1 x b2, n2 = b2 x b3.  The sign convention matches
    ``train/fold.py compute_intcoord``'s chain dihedrals (tested against
    it), so fold losses and this observable are interchangeable; the
    reference only exports the unsigned cos(phi) (``compute_dihe``,
    observable.py:181-198).
    """
    xyz = jnp.asarray(xyz)
    a = xyz[..., quads[:, 0], :]
    b = xyz[..., quads[:, 1], :]
    c = xyz[..., quads[:, 2], :]
    d = xyz[..., quads[:, 3], :]
    b1, b2, b3 = b - a, c - b, d - c
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    b2n = b2 / jnp.sqrt((b2 ** 2).sum(-1, keepdims=True) + 1e-20)
    # sign flipped to match fold.py's compute_intcoord convention (it
    # builds bond vectors tail-to-head reversed: xyz[:-1] - xyz[1:])
    y = -(jnp.cross(n1, n2) * b2n).sum(-1)
    x = (n1 * n2).sum(-1)
    return jnp.arctan2(y, x)


def chain_quads(n_atoms):
    """Consecutive (i, i+1, i+2, i+3) dihedral quads of a linear chain
    (the polymer-folding topology, train/fold.py)."""
    i = np.arange(n_atoms - 3)
    return np.stack([i, i + 1, i + 2, i + 3], axis=-1)


class dihedral_distribution:
    """Soft histogram of signed dihedral angles over fixed quads.

    The reference's trajectory-observable API exports raw per-frame
    cos(phi) only (``compute_dihe``); this provides the distribution form
    matching :class:`rdf` / :class:`angle_distribution`: returns
    ``(bins, normalized counts, phi)`` with the same Gaussian smearing,
    differentiable in xyz.  ``quads=None`` uses the linear-chain topology
    (every consecutive quadruple) -- the polymer-folding workload's
    dihedrals (reference scripts/fold.py:57-71).
    """

    def __init__(self, n_atoms, nbins=64, angle_range=(-np.pi, np.pi),
                 quads=None, width=None):
        start, end = angle_range
        self.n_atoms = int(n_atoms)
        self.bins = jnp.linspace(start, end, nbins + 1)
        self.smear = GaussianSmearing(start=start, stop=end,
                                      n_gaussians=nbins, width=width)
        self.quads = jnp.asarray(chain_quads(n_atoms) if quads is None
                                 else quads)

    def __call__(self, xyz):
        xyz = jnp.asarray(xyz).reshape(-1, self.n_atoms, 3)
        phi = signed_dihedrals(xyz, self.quads)          # (F, Q)
        counts = self.smear(phi[..., None]).sum((0, 1))
        counts = counts / counts.sum()
        return self.bins, counts, phi
