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

Scope: `lj_energy_forces` / `PallasLJPair` serve forward MD / sampling
(NVE, Langevin, target generation, inference rollouts).  The
*differentiable* fitting path is `make_lj_force`: a custom_vjp force
whose backward runs the bespoke analytic Hessian-vector-product kernel
(`_force_hvp_kernel`), so the force can sit inside MD steps that the
trajectory adjoint differentiates -- second-order d/d(sigma, epsilon)
through the fitting loss matches the XLA dense path (BENCH.md
"Differentiable Pallas pair path": 2.3x at N=1372, 4.0x at N=4000 over
XLA dense on a full LJ fit epoch;
tests/test_pallas.py::test_make_lj_force_custom_vjp_matches_dense).
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
    """Interaction-protocol adapter over the fused kernels.

    ``force`` is the custom-vjp kernel (make_lj_force) whose backward is
    an analytic Hessian-vector-product kernel: usable INSIDE the fitting
    adjoint (gradients of trajectory losses reach sigma/epsilon and
    positions through the force).  ``energy`` uses the plain fused kernel
    (observables/logging; not meant for grad-of-grad chains -- MD steps
    consume ``force`` directly via the integrator dispatch).
    """

    def __init__(self, system, cutoff, sigma=1.0, epsilon=1.0, rep_pow=12,
                 attr_pow=6, interpret=False):
        from ..system import check_system
        check_system(system)
        self.cell_len = jnp.asarray(np.diag(system.get_cell()),
                                    jnp.float32)
        self.cutoff = cutoff
        self.sigma, self.epsilon = sigma, epsilon
        self.rep_pow, self.attr_pow = rep_pow, attr_pow
        self.interpret = interpret
        self._force = make_lj_force(self.cell_len, cutoff, rep_pow,
                                    attr_pow, interpret=interpret)

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
                                self.rep_pow, self.attr_pow,
                                interpret=self.interpret)
        return e

    def force(self, params, xyz, aux):
        return self._force(xyz, params["sigma"], params["epsilon"])


# ---------------------------------------------------------------------------
# differentiable force path: custom-vjp force with an analytic HVP kernel
# ---------------------------------------------------------------------------

def _force_param_kernel(rep_pow, attr_pow, n_col_tiles, n_real,
                        xyz_row_ref, xyz_full_ref, cell_ref, params_ref,
                        force_ref, dsig_ref, ueps_ref):
    """Forces + per-row-block d(U)/dsigma and U/epsilon partials (the
    latter two feed parameter cotangents)."""
    sigma = params_ref[0]
    epsilon = params_ref[1]
    cutoff_sq = params_ref[2] ** 2
    cell = (cell_ref[0], cell_ref[1], cell_ref[2])
    i0 = pl.program_id(0) * TILE_R
    rows = xyz_row_ref[:, :]
    row_ids = i0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 0)

    def min_img(dr, L):
        return dr - jnp.round(dr / L) * L

    def col_body(c, carry):
        f_acc, ds_acc, ue_acc = carry
        cols = xyz_full_ref[:, pl.ds(c * TILE_C, TILE_C)]
        col_ids = c * TILE_C + jax.lax.broadcasted_iota(
            jnp.int32, (TILE_R, TILE_C), 1)
        dx = min_img(rows[0][:, None] - cols[0][None, :], cell[0])
        dy = min_img(rows[1][:, None] - cols[1][None, :], cell[1])
        dz = min_img(rows[2][:, None] - cols[2][None, :], cell[2])
        r_sq = dx * dx + dy * dy + dz * dz
        valid = ((col_ids != row_ids) & (r_sq < cutoff_sq)
                 & (col_ids < n_real) & (row_ids < n_real))
        r_sq = jnp.where(valid, r_sq, 1.0)
        inv_r2 = 1.0 / r_sq
        sr = sigma * jnp.sqrt(inv_r2)
        sr_a = sr ** attr_pow
        sr_r = sr ** rep_pow
        vm = valid.astype(jnp.float32)
        # g = u'(r)/r
        g = 4.0 * epsilon * (-rep_pow * sr_r + attr_pow * sr_a) \
            * inv_r2 * vm
        fx = -jnp.sum(g * dx, axis=1)
        fy = -jnp.sum(g * dy, axis=1)
        fz = -jnp.sum(g * dz, axis=1)
        f_acc = f_acc + jnp.stack([fx, fy, fz], axis=0)
        # dU/dsigma partial (pairs counted half)
        ds_acc = ds_acc + 0.5 * jnp.sum(
            4.0 * epsilon * (rep_pow * sr_r - attr_pow * sr_a)
            / sigma * vm)
        # U/epsilon partial
        ue_acc = ue_acc + 0.5 * jnp.sum(4.0 * (sr_r - sr_a) * vm)
        return f_acc, ds_acc, ue_acc

    f, ds, ue = jax.lax.fori_loop(
        0, n_col_tiles, col_body,
        (jnp.zeros((3, TILE_R), jnp.float32), jnp.zeros((), jnp.float32),
         jnp.zeros((), jnp.float32)))
    force_ref[:, :] = f
    ri = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    dsig_ref[:, :] = jnp.where((ri == 0) & (ci == 0), ds, 0.0)
    ueps_ref[:, :] = jnp.where((ri == 0) & (ci == 0), ue, 0.0)


def _force_only_kernel(rep_pow, attr_pow, n_col_tiles, n_real,
                       xyz_row_ref, xyz_full_ref, cell_ref, params_ref,
                       force_ref):
    """Forces only -- the per-step hot path (no dead param partials)."""
    sigma = params_ref[0]
    epsilon = params_ref[1]
    cutoff_sq = params_ref[2] ** 2
    cell = (cell_ref[0], cell_ref[1], cell_ref[2])
    i0 = pl.program_id(0) * TILE_R
    rows = xyz_row_ref[:, :]
    row_ids = i0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 0)

    def min_img(dr, L):
        return dr - jnp.round(dr / L) * L

    def col_body(c, f_acc):
        cols = xyz_full_ref[:, pl.ds(c * TILE_C, TILE_C)]
        col_ids = c * TILE_C + jax.lax.broadcasted_iota(
            jnp.int32, (TILE_R, TILE_C), 1)
        dx = min_img(rows[0][:, None] - cols[0][None, :], cell[0])
        dy = min_img(rows[1][:, None] - cols[1][None, :], cell[1])
        dz = min_img(rows[2][:, None] - cols[2][None, :], cell[2])
        r_sq = dx * dx + dy * dy + dz * dz
        valid = ((col_ids != row_ids) & (r_sq < cutoff_sq)
                 & (col_ids < n_real) & (row_ids < n_real))
        r_sq = jnp.where(valid, r_sq, 1.0)
        inv_r2 = 1.0 / r_sq
        sr = sigma * jnp.sqrt(inv_r2)
        g = 4.0 * epsilon * (-rep_pow * sr ** rep_pow
                             + attr_pow * sr ** attr_pow) * inv_r2 \
            * valid.astype(jnp.float32)
        fx = -jnp.sum(g * dx, axis=1)
        fy = -jnp.sum(g * dy, axis=1)
        fz = -jnp.sum(g * dz, axis=1)
        return f_acc + jnp.stack([fx, fy, fz], axis=0)

    f = jax.lax.fori_loop(0, n_col_tiles, col_body,
                          jnp.zeros((3, TILE_R), jnp.float32))
    force_ref[:, :] = f


def _force_hvp_kernel(rep_pow, attr_pow, n_col_tiles, n_real,
                      xyz_row_ref, xyz_full_ref, w_row_ref, w_full_ref,
                      cell_ref, params_ref, dxyz_ref, dsig_ref,
                      deps_ref):
    """vjp of the force map: (dF/dx)^T W (symmetric: = -Hessian @ W),
    plus d(W . F)/dsigma and d(W . F)/depsilon.

    Pair-potential Hessian blocks: B_ij = (u'' - u'/r) dhat dhat^T
    + (u'/r) I; vjp_i = sum_j B_ij (W_j - W_i).
    """
    sigma = params_ref[0]
    epsilon = params_ref[1]
    cutoff_sq = params_ref[2] ** 2
    cell = (cell_ref[0], cell_ref[1], cell_ref[2])
    i0 = pl.program_id(0) * TILE_R
    rows = xyz_row_ref[:, :]
    w_rows = w_row_ref[:, :]
    row_ids = i0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 0)

    def min_img(dr, L):
        return dr - jnp.round(dr / L) * L

    def col_body(c, carry):
        o_acc, ds_acc, de_acc = carry
        cols = xyz_full_ref[:, pl.ds(c * TILE_C, TILE_C)]
        w_cols = w_full_ref[:, pl.ds(c * TILE_C, TILE_C)]
        col_ids = c * TILE_C + jax.lax.broadcasted_iota(
            jnp.int32, (TILE_R, TILE_C), 1)
        dx = min_img(rows[0][:, None] - cols[0][None, :], cell[0])
        dy = min_img(rows[1][:, None] - cols[1][None, :], cell[1])
        dz = min_img(rows[2][:, None] - cols[2][None, :], cell[2])
        wx = w_cols[0][None, :] - w_rows[0][:, None]   # W_j - W_i
        wy = w_cols[1][None, :] - w_rows[1][:, None]
        wz = w_cols[2][None, :] - w_rows[2][:, None]
        r_sq = dx * dx + dy * dy + dz * dz
        valid = ((col_ids != row_ids) & (r_sq < cutoff_sq)
                 & (col_ids < n_real) & (row_ids < n_real))
        r_sq = jnp.where(valid, r_sq, 1.0)
        inv_r2 = 1.0 / r_sq
        sr = sigma * jnp.sqrt(inv_r2)
        sr_a = sr ** attr_pow
        sr_r = sr ** rep_pow
        vm = valid.astype(jnp.float32)
        R, A = rep_pow, attr_pow
        # u'/r and (u'' - u'/r)/r^2 for the LJ family
        g = 4.0 * epsilon * (-R * sr_r + A * sr_a) * inv_r2
        h = 4.0 * epsilon * (R * (R + 2) * sr_r
                             - A * (A + 2) * sr_a) * inv_r2 * inv_r2
        g = g * vm
        h = h * vm
        wd = wx * dx + wy * dy + wz * dz
        ox = jnp.sum(h * wd * dx + g * wx, axis=1)
        oy = jnp.sum(h * wd * dy + g * wy, axis=1)
        oz = jnp.sum(h * wd * dz + g * wz, axis=1)
        o_acc = o_acc + jnp.stack([ox, oy, oz], axis=0)
        # d(W.F)/dsigma: F_i = -sum_j g d_ij -> dF/dsigma = -sum dg/dsigma d
        # dg/dsigma = 4 eps (-R^2 sr_r + A^2 sr_a) / (sigma r^2)
        dgds = 4.0 * epsilon * (-R * R * sr_r + A * A * sr_a) \
            * inv_r2 / sigma * vm
        # W_i . dF_i/dsigma summed over i: -(W_i . d_ij) dgds; note
        # (W_i . d) = -(wd + W_j.d - ... ) -- use W rows directly:
        wrd = (w_rows[0][:, None] * dx + w_rows[1][:, None] * dy
               + w_rows[2][:, None] * dz)
        ds_acc = ds_acc - jnp.sum(dgds * wrd)
        de_acc = de_acc - jnp.sum(g / epsilon * wrd)
        return o_acc, ds_acc, de_acc

    o, ds, de = jax.lax.fori_loop(
        0, n_col_tiles, col_body,
        (jnp.zeros((3, TILE_R), jnp.float32), jnp.zeros((), jnp.float32),
         jnp.zeros((), jnp.float32)))
    dxyz_ref[:, :] = o
    ri = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    dsig_ref[:, :] = jnp.where((ri == 0) & (ci == 0), ds, 0.0)
    deps_ref[:, :] = jnp.where((ri == 0) & (ci == 0), de, 0.0)


def make_lj_force(cell_len, cutoff, rep_pow=12, attr_pow=6,
                  interpret=False):
    """Differentiable fused force: ``force(xyz, sigma, eps) -> (N, 3)``.

    custom_vjp backward runs the analytic HVP kernel, so the force can sit
    inside MD steps that the trajectory adjoint differentiates (the
    second-order grad-of-grad chain of the fitting loss).
    """
    cell = jnp.asarray(cell_len, jnp.float32).reshape(3)

    def _call(kernel_fn, n_out_extra, xyz, sigma, eps, *extra):
        n = xyz.shape[0]
        n_pad = _round_up(max(n, TILE_R), TILE_C)
        xyz_t = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(
            jnp.asarray(xyz, jnp.float32).T)
        ins = [xyz_t, xyz_t]
        in_specs = [
            pl.BlockSpec((3, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        for e in extra:
            e_t = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(
                jnp.asarray(e, jnp.float32).T)
            ins += [e_t, e_t]
            in_specs += [
                pl.BlockSpec((3, TILE_R), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, n_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ]
        params = jnp.stack([jnp.asarray(sigma, jnp.float32),
                            jnp.asarray(eps, jnp.float32),
                            jnp.asarray(cutoff, jnp.float32)])
        ins += [cell, params]
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM),
                     pl.BlockSpec(memory_space=pltpu.SMEM)]
        grid = n_pad // TILE_R
        kernel = functools.partial(kernel_fn, rep_pow, attr_pow,
                                   n_pad // TILE_C, n)
        out_specs = [pl.BlockSpec((3, TILE_R), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((3, n_pad), jnp.float32)]
        for _ in range(n_out_extra):
            out_specs.append(pl.BlockSpec((8, 128), lambda i: (i, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((grid * 8, 128),
                                                  jnp.float32))
        outs = pl.pallas_call(kernel, grid=(grid,), in_specs=in_specs,
                              out_specs=out_specs, out_shape=out_shape,
                              interpret=interpret)(*ins)
        main = outs[0][:, :n].T
        return (main,) + tuple(o.sum() for o in outs[1:])

    @jax.custom_vjp
    def force(xyz, sigma, eps):
        (f,) = _call(_force_only_kernel, 0, xyz, sigma, eps)
        return f

    def force_fwd(xyz, sigma, eps):
        (f,) = _call(_force_only_kernel, 0, xyz, sigma, eps)
        return f, (xyz, sigma, eps)

    def force_bwd(res, w):
        xyz, sigma, eps = res
        dxyz, dsig, deps = _call(_force_hvp_kernel, 2, xyz, sigma, eps, w)
        return (dxyz.astype(xyz.dtype),
                jnp.asarray(dsig, jnp.float32).astype(jnp.result_type(sigma)),
                jnp.asarray(deps, jnp.float32).astype(jnp.result_type(eps)))

    force.defvjp(force_fwd, force_bwd)
    return force
