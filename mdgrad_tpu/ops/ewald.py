"""Ewald summation for long-range electrostatics (TPU-native).

The reference's only electrostatics is a bare cutoff-Coulomb sum
(/root/reference/torchmd/interface.py:303-361) -- divergent-by-truncation
for condensed phases and carrying a q1*q1 bug besides.  This module goes
beyond parity: the full Ewald split

    U = U_real + U_recip + U_self + U_background

with every term differentiable in positions, charges AND the (diagonal)
cell, so it composes with the NPT integrators and the multistate
dynamic-cell machinery.

TPU mapping
-----------
The reciprocal sum is the hot term and it is *one matmul*: the structure
factor S(k) = sum_j q_j exp(i k.r_j) needs the (N, Nk) phase matrix
``2*pi * frac @ n.T`` -- an (N,3)x(3,Nk) contraction the MXU eats, followed
by elementwise cos/sin and a reduction.  No scatters, no sorts, static
shapes throughout (the k-point set is fixed at construction).  Fractional
coordinates are wrapped to [0,1) before the phase matmul so float32 holds
full phase precision at any box size; the wrap offset is piecewise
constant (zero gradient) and the energy is exactly lattice-periodic, so
forces are untouched.  The phase matmul runs at precision=HIGHEST --
CLAUDE.md rule 1: small-geometry contractions are correctness-critical
and contribute no meaningful FLOPs.

The real-space term reuses the dense masked minimum-image distance matrix
(topology.distance_matrix) with erfc screening; with the standard
parameter choice alpha = acc / r_cut it converges inside the same cutoff
a plain LJ uses.

Conventions: charges in units of e, lengths in Angstrom, energies in eV;
the Coulomb constant k_e = 14.399645 eV*Angstrom/e^2 matches the cutoff
Electrostatics conversion (interface.py) and ase.units.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .. import topology

# k_e = 1/(4 pi eps0) in eV * Angstrom / e^2 (CODATA 2014, ASE-compatible)
COULOMB = 14.399645478425668


def ewald_params(r_cut, accuracy=3.2):
    """Splitting parameter + reciprocal cutoff from a real-space cutoff.

    ``accuracy`` s sets both truncation errors to ~erfc(s):
    erfc(3.2) ~ 6e-6.  alpha = s / r_cut makes the real sum converge at
    r_cut; k_cut = 2 * alpha * s makes exp(-k^2 / 4 alpha^2) ~ exp(-s^2).
    """
    alpha = accuracy / r_cut
    k_cut = 2.0 * alpha * accuracy
    return alpha, k_cut


def _as_matrix(cell):
    cell = jnp.asarray(cell)
    return jnp.diag(cell) if cell.ndim == 1 else cell


def build_kvectors(cell, k_cut):
    """Integer reciprocal-lattice triples n (Nk, 3) covering the HALF space
    with |k(n)| <= k_cut, where k(n) = 2 pi n @ inv(cell) (rows of cell =
    lattice vectors; reduces to 2 pi n / L for diagonal cells).  k and -k
    give identical |S(k)|^2, so the full sum is 2x the half sum.  Static:
    evaluated once at construction with numpy; the traced cell only
    enters through k(n) at evaluation time.
    """
    cell = np.asarray(cell, dtype=np.float64)
    cell = np.diag(cell) if cell.ndim == 1 else cell
    # k(n) = 2 pi n @ inv(cell)^T (so that k . a_i = 2 pi n_i); the
    # exact search bound follows from |n_i| = |k . a_i| / 2pi
    # <= k_cut |a_i| / 2pi
    recip_t = 2 * np.pi * np.linalg.inv(cell).T
    a_norm = np.linalg.norm(cell, axis=1)
    nmax = np.maximum(1, np.ceil(k_cut * a_norm / (2 * np.pi)).astype(int))
    rng = [np.arange(-m, m + 1) for m in nmax]
    n = np.stack(np.meshgrid(*rng, indexing="ij"), axis=-1).reshape(-1, 3)
    k2 = ((n @ recip_t) ** 2).sum(-1)
    keep = (k2 > 0) & (k2 <= k_cut ** 2)
    # half space: first nonzero component positive
    first = np.where(n[:, 0] != 0, n[:, 0],
                     np.where(n[:, 1] != 0, n[:, 1], n[:, 2]))
    keep &= first > 0
    return jnp.asarray(n[keep].astype(np.float32))


def reciprocal_energy(q, xyz, cell, nvecs, alpha):
    """U_recip = k_e * (2 pi / V) * 2 * sum_half exp(-k^2/4a^2)/k^2 |S(k)|^2.

    One (N,3)x(3,Nk) matmul + cos/sin + reductions; O(N * Nk) on the MXU.
    General (triclinic) cells: rows of ``cell`` are the lattice vectors.
    """
    cm = _as_matrix(cell)
    V = jnp.abs(jnp.linalg.det(cm))
    # fractional coords: xyz = frac @ cell  ->  frac = xyz @ inv(cell);
    # phases are exactly periodic in frac, so wrap to [0, 1) for f32
    # precision (the wrap offset is piecewise constant: zero gradient)
    frac = jnp.matmul(xyz, jnp.linalg.inv(cm),
                      precision=jax.lax.Precision.HIGHEST)
    frac = frac - jnp.floor(jax.lax.stop_gradient(frac))
    phase = 2 * jnp.pi * jnp.matmul(
        frac, nvecs.T, precision=jax.lax.Precision.HIGHEST)
    c = jnp.cos(phase)
    s = jnp.sin(phase)
    re = (q[:, None] * c).sum(0)           # (Nk,)
    im = (q[:, None] * s).sum(0)
    k = 2 * jnp.pi * jnp.matmul(nvecs, jnp.linalg.inv(cm).T,
                                precision=jax.lax.Precision.HIGHEST)
    k2 = (k ** 2).sum(-1)
    coeff = jnp.exp(-k2 / (4 * alpha ** 2)) / k2
    return COULOMB * (4 * jnp.pi / V) * (coeff * (re ** 2 + im ** 2)).sum()


def real_energy(q, xyz, cell, alpha, r_cut, extra_mask=None):
    """Dense masked erfc-screened pair sum (minimum image)."""
    dist, valid = topology.distance_matrix(xyz, cell)
    n = dist.shape[-1]
    mask = valid & jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
    mask = mask & (dist < r_cut)
    if extra_mask is not None:
        mask = mask & extra_mask
    qq = q[:, None] * q[None, :]
    safe = jnp.where(mask, dist, 1.0)
    u = COULOMB * qq * jax.scipy.special.erfc(alpha * safe) / safe
    return jnp.where(mask, u, 0.0).sum()


def real_energy_table(q, xyz, cell, alpha, r_cut, nbrs):
    """erfc-screened pair sum over an (N, K) neighbor table.

    The dense path re-pays an O(N^2) distance matrix on top of whatever
    the short-range potential already computes; the table gathers only
    the K in-cutoff neighbors per atom (CLAUDE.md rule 4: gather +
    K-axis reduction beats dense/scatter once N is large).  Diagonal
    cells only (elementwise minimum image, offset-free tables).  Each
    pair appears in both atoms' rows -> 0.5x.  Exclusions are handled
    at table BUILD time (select_mask), not here.
    """
    cl = jnp.diag(cell) if jnp.asarray(cell).ndim == 2 else jnp.asarray(cell)
    ext = jnp.concatenate([xyz, jnp.zeros_like(xyz[:1])], axis=0)
    d_raw = xyz[:, None, :] - ext[nbrs.table]
    # piecewise-constant image choice: stop_gradient keeps forces exact
    off = jax.lax.stop_gradient(
        -(d_raw > 0.5 * cl).astype(d_raw.dtype)
        + (d_raw < -0.5 * cl).astype(d_raw.dtype))
    d = d_raw + off * cl
    dist_sq = (d ** 2).sum(-1)
    mask = nbrs.mask & (dist_sq < r_cut ** 2)
    safe = jnp.sqrt(jnp.where(mask, dist_sq, 1.0))
    q_ext = jnp.concatenate([q, jnp.zeros_like(q[:1])])
    qq = q[:, None] * q_ext[nbrs.table]
    u = COULOMB * qq * jax.scipy.special.erfc(alpha * safe) / safe
    return 0.5 * jnp.where(mask, u, 0.0).sum()


def self_energy(q, alpha):
    return -COULOMB * alpha / jnp.sqrt(jnp.pi) * (q ** 2).sum()


def background_energy(q, cell, alpha):
    """Neutralizing-background correction: keeps U alpha-invariant for
    net-charged cells (the k=0 term omitted from the reciprocal sum)."""
    V = jnp.abs(jnp.linalg.det(_as_matrix(cell)))
    return -COULOMB * jnp.pi / (2 * V * alpha ** 2) * q.sum() ** 2


def exclusion_correction(q, xyz, cell, alpha, pairs):
    """Subtract the reciprocal-space (erf) contribution of excluded pairs.

    The reciprocal sum covers ALL pairs; bonded exclusions therefore need
    -k_e q_i q_j erf(alpha r)/r removed per excluded (i, j).  ``pairs`` is
    a static (P, 2) int array.  Diagonal cells only (the bond re-wrap is
    elementwise); bonded molecular systems use orthorhombic boxes here.
    """
    cl = jnp.diag(cell) if jnp.asarray(cell).ndim == 2 else jnp.asarray(cell)
    vec = xyz[pairs[:, 0]] - xyz[pairs[:, 1]]
    vec = topology.wrap_bond_vectors(vec, cl)
    r = jnp.sqrt((vec ** 2).sum(-1))
    qq = q[pairs[:, 0]] * q[pairs[:, 1]]
    return -(COULOMB * qq * jax.scipy.special.erf(alpha * r) / r).sum()


def ewald_energy(q, xyz, cell, nvecs, alpha, r_cut,
                 extra_mask=None, ex_pairs=None, nbrs=None):
    """Total Ewald electrostatic energy (eV).  ``cell`` is (3,) diagonal
    lengths or a (3, 3) triclinic matrix (rows = lattice vectors).
    ``nbrs`` (an (N, K) NeighborTable) switches the real-space term to
    the gather path; exclusions must then be baked into the table's
    select_mask (extra_mask is ignored for the real term)."""
    cell = jnp.asarray(cell)
    if nbrs is not None:
        u_real = real_energy_table(q, xyz, cell, alpha, r_cut, nbrs)
    else:
        u_real = real_energy(q, xyz, cell, alpha, r_cut, extra_mask)
    u = (u_real
         + reciprocal_energy(q, xyz, cell, nvecs, alpha)
         + self_energy(q, alpha)
         + background_energy(q, cell, alpha))
    if ex_pairs is not None:
        u = u + exclusion_correction(q, xyz, cell, alpha, ex_pairs)
    return u
