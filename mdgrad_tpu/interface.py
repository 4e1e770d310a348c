"""Energy-calculator interfaces: adapt potential models to integrators.

Parity target: /root/reference/torchmd/interface.py (GeneralInteraction:33,
GNNPotentials:86, PairPotentials:217, TPairPotentials:139,
Electrostatics:303, BondPotentials:406, AnglePotentials:457, Stack:364).

The reference contract is stateful: ``forward(xyz) -> energy`` plus
``_reset_topology(xyz)`` mutating a cached neighbor list.  The TPU-native
contract is functional so it can live inside ``jax.lax.scan``:

    ``init_params()            -> params``   learnable pytree
    ``aux_init(xyz)            -> aux``      neighbor state pytree (or ())
    ``aux_update(xyz, aux)     -> aux``      static-shape topology refresh
    ``energy(params, xyz, aux) -> scalar``   pure, differentiable in
                                             (params, xyz) and in the cell

Pair potentials additionally support **dense mode**: instead of maintaining
a pair list they evaluate on the full masked NxN minimum-image distance
matrix every call.  On TPU this removes topology refresh entirely (the
reference pays an O(N^2) rebuild every step *and* a GPU<->CPU hop,
interface.py:195-204); XLA fuses the whole pipeline, and for N <~ 1-2k it is
the fastest option.  Sparse mode (padded fixed-capacity lists) covers GNNs
and larger N.

Gradients wrt the simulation cell flow through ``energy`` (the reference
marks cell.requires_grad at interface.py:56 for the virial) -- pass a traced
cell via functools.partial / closure rebinding if the virial is needed, or
use :func:`mdgrad_tpu.thermo.pressure`.
"""

import jax
import jax.numpy as jnp
import numpy as np

from . import topology
from .system import check_system


class Interaction:
    """Base class for the functional interaction contract.

    The optional ``cell`` keyword (accepted by the PBC-aware subclasses)
    overrides the baked-in simulation cell with a *dynamic* -- possibly
    traced -- diagonal cell, given as (3,) lengths.  It exists so one
    compiled program can serve many state points with different boxes
    (see :class:`WithDynamicCell` and ``parallel/multistate.py``); plain
    single-state callers never pass it and pay nothing.
    """

    def init_params(self):
        return {}

    def aux_init(self, xyz, cell=None):
        return ()

    def aux_update(self, xyz, aux, cell=None):
        return aux

    def energy(self, params, xyz, aux, cell=None):
        raise NotImplementedError

    def grow_capacity(self, factor=1.5):
        """Enlarge fixed neighbor capacities IN PLACE after a surfaced
        overflow (topology.aux_overflow); returns True if anything grew.

        Capacities are static per-compile shapes, so the caller must
        rebuild aux via ``aux_init``/``aux_update`` afterwards -- the new
        shapes make jit retrace, which re-reads the grown capacity (one
        recompile per regrow).  Drivers use this for
        ``overflow_policy='regrow'`` (fit_rdf): detection -> grow ->
        restore the epoch's entry state -> continue, instead of merely
        skipping corrupt epochs.  Interactions with no fixed capacity
        (dense mode, bonded terms) return False.
        """
        return False


class PairPotentials(Interaction):
    """Sum of an isotropic pair potential over pairs within a cutoff.

    Parity: reference PairPotentials (interface.py:217-300) including
    ``index_tuple`` species selection and ``ex_pairs`` exclusions.  ``mode``:

      * 'dense'  -- masked NxN evaluation, no neighbor state (TPU default
                    for small/medium N);
      * 'sparse' -- fixed-capacity padded list, refreshed by aux_update
                    (parity with the reference's cached nbr_list +
                    _reset_topology, interface.py:259-282);
      * 'auto'   -- dense when N^2 <= 2^20, else sparse.
    """

    def __init__(self, system, pair_model, cutoff=2.5, index_tuple=None,
                 ex_pairs=None, mode="auto", capacity=None, cell=None,
                 capacity_slack=1.6):
        check_system(system)
        self.model = pair_model
        self.cutoff = cutoff
        self.cell = jnp.asarray(system.get_cell() if cell is None else cell)
        half_box = float(np.abs(np.diag(np.asarray(self.cell))).min()) / 2
        if cutoff > half_box:
            import warnings
            # single-image minimum-image convention (same as the reference,
            # topology.py:59-64) is ill-defined past L/2: pairs near the
            # boundary get an arbitrary image and force directions become
            # rounding-sensitive
            warnings.warn(
                f"cutoff {cutoff} exceeds half the box ({half_box:.3f}); "
                "minimum-image pair selection is ambiguous -- enlarge the "
                "box or reduce the cutoff", stacklevel=2)
        n = system.get_number_of_atoms()
        self.n_atoms = n
        self.select_mask = topology.pair_index_mask(n, index_tuple, ex_pairs)
        if mode == "auto":
            mode = "dense" if n * n <= (1 << 20) else "sparse"
        self.mode = mode
        if mode == "sparse":
            xyz0 = jnp.asarray(system.get_positions())
            self.capacity = capacity or topology.estimate_capacity(
                xyz0, cutoff, self.cell, self.select_mask)
        elif mode == "table":
            # (N, K) neighbor-table pair evaluation: the pair model runs
            # on N*K gathered slots instead of all N^2 entries.  Dense
            # wins for CHEAP closed-form pairs (CLAUDE.md rule 5: the
            # bottleneck there is geometry), but for MLP pair models
            # (PairMLP/TPairMLP) the per-pair network activations are
            # (N, N, hidden) in dense mode -- 120 MB per layer at
            # N=512/hidden=115, HBM-bound -- and the table cuts those
            # bytes ~13x.  Diagonal cells only (elementwise minimum
            # image, offset-free tables); supports the dynamic ``cell=``
            # override like the GNN table path.
            if not (self.cell.ndim == 1 or topology._is_diagonal(self.cell)):
                raise ValueError("mode='table' requires a diagonal cell")
            xyz0 = jnp.asarray(system.get_positions())
            d, _ = topology.displacement_matrix(xyz0, self.cell)
            dist_sq = (d ** 2).sum(-1) + jnp.eye(n) * 1e9
            within = dist_sq < cutoff ** 2
            if self.select_mask is not None:
                within = within & self.select_mask
            k0 = int(jnp.max(within.sum(-1)))
            self.k_max = min(
                int(np.ceil(max(k0, 1) * capacity_slack / 8) * 8), n)
            self.cell_len = (jnp.diag(self.cell)
                             if self.cell.ndim == 2 else self.cell)

    def init_params(self):
        return self.model.init_params()

    def grow_capacity(self, factor=1.5):
        if self.mode == "table":
            new_k = min(int(np.ceil(self.k_max * factor / 8) * 8),
                        self.n_atoms)
            if new_k > self.k_max:
                self.k_max = new_k
                return True
            return False
        if self.mode == "sparse":
            cap = self.n_atoms * (self.n_atoms - 1) // 2
            new_c = min(int(np.ceil(self.capacity * factor)), cap)
            if new_c > self.capacity:
                self.capacity = new_c
                return True
            return False
        return False  # dense mode has no capacity to overflow

    def aux_init(self, xyz, cell=None):
        if self.mode == "dense":
            return ()
        cell = self.cell if cell is None else cell
        if self.mode == "table":
            return topology.generate_neighbor_table(
                xyz, self.cutoff, cell, self.k_max, self.select_mask,
                store_offsets=False)
        return topology.generate_nbr_list(
            xyz, self.cutoff, cell, self.capacity, self.select_mask)

    def aux_update(self, xyz, aux, cell=None):
        return self.aux_init(xyz, cell=cell)

    def _pair_energy(self, params, r):
        return self.model(params, r)

    def energy(self, params, xyz, aux, cell=None):
        cell = self.cell if cell is None else cell
        if self.mode == "dense":
            dist, valid = topology.distance_matrix(xyz, cell)
            n = dist.shape[-1]
            mask = valid & jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
            mask = mask & (dist < self.cutoff)
            if self.select_mask is not None:
                mask = mask & self.select_mask
            safe = jnp.where(mask, dist, 1.0)
            u = self._pair_energy(params, safe[..., None]).squeeze(-1)
            return jnp.where(mask, u, 0.0).sum()
        if self.mode == "table":
            nbrs = aux
            cl = (jnp.diag(cell) if jnp.asarray(cell).ndim == 2
                  else jnp.asarray(cell))
            ext = jnp.concatenate([xyz, jnp.zeros_like(xyz[:1])], axis=0)
            d_raw = xyz[:, None, :] - ext[nbrs.table]
            # elementwise minimum image; the offset choice is piecewise
            # constant -> stop_gradient keeps forces exact away from L/2
            off = jax.lax.stop_gradient(
                -(d_raw > 0.5 * cl).astype(d_raw.dtype)
                + (d_raw < -0.5 * cl).astype(d_raw.dtype))
            d = d_raw + off * cl
            dist_sq = (d ** 2).sum(-1)
            # runtime cutoff re-mask: keeps stale tables (update_freq>1)
            # and SHARED tables built at a larger cutoff (Stack
            # share_aux / Verlet skin) exact -- same semantics as the
            # GNN path's runtime_cutoff (nn/schnet.py)
            mask = nbrs.mask & (dist_sq < self.cutoff ** 2)
            # safe distance BEFORE the model: u'(r->0)=inf and 0*inf=NaN
            # in the force pass even under masking (where-gradient trap)
            safe = jnp.sqrt(jnp.where(mask, dist_sq, 1.0))
            u = self._pair_energy(params, safe[..., None]).squeeze(-1)
            # each pair appears in both atoms' rows
            return 0.5 * jnp.where(mask, u, 0.0).sum()
        nbrs = aux
        r = topology.compute_dis(xyz, nbrs.idx, nbrs.offsets, cell)
        u = self._pair_energy(params, r).squeeze(-1)
        return jnp.where(nbrs.mask, u, 0.0).sum()


class TPairPotentials(PairPotentials):
    """Temperature-dependent pair potential u(r, kT)
    (reference interface.py:139-215).  The temperature enters through the
    params pytree leaf ``kT`` (updated by annealing schedules; excluded from
    optimizers by the fitting drivers) so changing T never recompiles.
    """

    def __init__(self, system, pair_model, T_kelvin, **kw):
        super().__init__(system, pair_model, **kw)
        from . import units
        self.kT0 = T_kelvin * units.kB

    def init_params(self):
        return {"model": self.model.init_params(),
                "kT": jnp.asarray(self.kT0)}

    def _pair_energy(self, params, r):
        return self.model(params["model"], r, params["kT"])


class GNNPotentials(Interaction):
    """GNN force field over a dynamically refreshed graph
    (reference interface.py:86-136).  Holds the static SchNet plus system
    metadata; edges are a fixed-capacity padded list."""

    def __init__(self, system, gnn, cutoff, ex_pairs=None, capacity=None,
                 capacity_slack=1.6, nbr_mode="table", k_max=None,
                 skin=0.0):
        check_system(system)
        self.gnn = gnn
        self.cutoff = cutoff
        # Verlet skin: the list is built at cutoff + skin and edges are
        # re-masked by their current length inside the GNN, so stale lists
        # stay EXACT as long as no atom moves more than skin/2 between
        # rebuilds (set topology_update_freq accordingly).  The reference
        # has no such mechanism -- it rebuilds every step (md.py:112).
        self.skin = skin
        self.build_cutoff = cutoff + skin
        if skin > 0 and nbr_mode not in ("table", "cells"):
            raise ValueError("skin > 0 requires nbr_mode='table'/'cells' "
                             "(the modes with runtime cutoff re-masking)")
        self.cell = jnp.asarray(system.get_cell())
        self.z = jnp.asarray(system.get_atomic_numbers(), dtype=jnp.int32)
        n = system.get_number_of_atoms()
        self.select_mask = topology.pair_index_mask(n, None, ex_pairs)
        self.nbr_mode = nbr_mode
        # diagonal cells: skip storing per-edge offsets -- the GNN
        # recomputes minimum image elementwise, which removes the
        # (3, N, N) -> (N, K) offset gather from every topology refresh
        self.store_offsets = not topology._is_diagonal(self.cell)
        self.cell_len = (jnp.diag(self.cell)
                         if not self.store_offsets else None)
        xyz0 = jnp.asarray(system.get_positions())
        if nbr_mode == "cells":
            # (N, K) table built through the fixed-capacity cell list:
            # per-atom top-k over the 27*M-candidate neighborhood instead
            # of all N -- the >=10k-atom GNN edge builder (ops/cells.py)
            if self.store_offsets:
                raise ValueError("nbr_mode='cells' needs a diagonal cell")
            if self.select_mask is not None:
                raise ValueError("nbr_mode='cells' does not support "
                                 "ex_pairs/index selections")
            from .ops import cells as _cells
            density = n / float(np.prod(np.diag(np.asarray(self.cell))))
            self._cells_density = density
            self._cells_slack = float(capacity_slack)
            self._cell_grid = _cells.make_cell_grid(
                np.diag(np.asarray(self.cell)), self.build_cutoff,
                density, slack=capacity_slack)
            if k_max is None:
                d, _ = topology.displacement_matrix(xyz0, self.cell)
                dist_sq = (d ** 2).sum(-1) + jnp.eye(n) * 1e9
                k0 = int(jnp.max((dist_sq < self.build_cutoff ** 2)
                                 .sum(-1)))
                k_max = int(np.ceil(max(k0, 1) * capacity_slack / 8) * 8)
            self.k_max = min(k_max, n)
        elif nbr_mode in ("topk", "table"):
            # per-atom capacity: max in-cutoff neighbor count x slack
            # (top_k list construction; see topology.generate_nbr_list_topk)
            if k_max is None:
                d, _ = topology.displacement_matrix(xyz0, self.cell)
                dist_sq = (d ** 2).sum(-1) + jnp.eye(n) * 1e9
                within = dist_sq < self.build_cutoff ** 2
                if self.select_mask is not None:
                    within = within & self.select_mask
                k0 = int(jnp.max(within.sum(-1)))
                k_max = int(np.ceil(max(k0, 1) * capacity_slack / 8) * 8)
            self.k_max = min(k_max, n)
        else:
            self.capacity = capacity or topology.estimate_capacity(
                xyz0, cutoff, self.cell, self.select_mask,
                slack=capacity_slack)

    def init_params(self):
        return self.gnn.init_params(self.z)

    def grow_capacity(self, factor=1.5):
        n = int(self.z.shape[0])
        if self.nbr_mode in ("cells", "table", "topk"):
            grew = False
            new_k = min(int(np.ceil(self.k_max * factor / 8) * 8), n)
            if new_k > self.k_max:
                self.k_max = new_k
                grew = True
            if self.nbr_mode == "cells":
                # per-cell slot capacity M overflows independently of K
                from .ops import cells as _cells
                self._cells_slack *= factor
                self._cell_grid = _cells.make_cell_grid(
                    np.diag(np.asarray(self.cell)), self.build_cutoff,
                    self._cells_density, slack=self._cells_slack)
                grew = True
            return grew
        cap = n * (n - 1) // 2
        new_c = min(int(np.ceil(self.capacity * factor)), cap)
        if new_c > self.capacity:
            self.capacity = new_c
            return True
        return False

    def aux_init(self, xyz, cell=None):
        if cell is not None and self.nbr_mode != "table":
            raise ValueError("dynamic cell override requires "
                             "nbr_mode='table'")
        if self.nbr_mode == "cells":
            from .ops import cells as _cells
            clist = _cells.build_cell_list(xyz, jnp.diag(self.cell),
                                           self._cell_grid)
            return _cells.neighbor_table_from_cells(
                xyz, clist, self._cell_grid, jnp.diag(self.cell),
                self.build_cutoff, self.k_max)
        if self.nbr_mode == "table":
            return topology.generate_neighbor_table(
                xyz, self.build_cutoff,
                self.cell if cell is None else cell, self.k_max,
                self.select_mask, store_offsets=self.store_offsets)
        if self.nbr_mode == "topk":
            return topology.generate_nbr_list_topk(
                xyz, self.cutoff, self.cell, self.k_max, self.select_mask,
                directed=True)
        return topology.generate_nbr_list(
            xyz, self.cutoff, self.cell, self.capacity, self.select_mask)

    def aux_update(self, xyz, aux, cell=None):
        return self.aux_init(xyz, cell=cell)

    def energy(self, params, xyz, aux, cell=None):
        nbrs = aux
        if cell is not None and not (self.nbr_mode == "table"
                                     and not self.store_offsets):
            raise ValueError("dynamic cell override requires "
                             "nbr_mode='table' with a diagonal cell")
        if self.nbr_mode in ("table", "cells"):
            if self.store_offsets:
                offsets_real = jnp.matmul(
                    nbrs.offsets, self.cell,
                    precision=jax.lax.Precision.HIGHEST)
            else:
                offsets_real = None
            return self.gnn.energy(params, self.z, xyz, nbrs.table,
                                   offsets_real, nbrs.mask,
                                   edge_format="table",
                                   runtime_cutoff=(self.cutoff
                                                   if self.skin > 0
                                                   else None),
                                   cell_len=(self.cell_len if cell is None
                                             else cell))
        offsets_real = jnp.matmul(nbrs.offsets, self.cell,
                                  precision=jax.lax.Precision.HIGHEST)
        return self.gnn.energy(params, self.z, xyz, nbrs.idx, offsets_real,
                               nbrs.mask,
                               directed=(self.nbr_mode == "topk"))


class Electrostatics(Interaction):
    """Cutoff Coulomb sum (reference interface.py:303-361).

    Uses q_i * q_j -- the reference overwrites q1 with the second gather and
    computes q1*q1 (interface.py:357-359); that bug is documented in
    SURVEY.md and not replicated.
    """

    def __init__(self, system, charges, cutoff=2.5, index_tuple=None,
                 ex_pairs=None):
        from . import units
        check_system(system)
        self.charges = jnp.asarray(charges)
        self.cell = jnp.asarray(system.get_cell())
        self.cutoff = cutoff
        n = system.get_number_of_atoms()
        self.select_mask = topology.pair_index_mask(n, index_tuple, ex_pairs)
        # k_e in eV Angstrom / e^2 (reference interface.py:331-333)
        k_e = 8.987551787e9
        EV_TO_J = 1.60210e-19
        self.conversion = k_e * units.C ** -2 * (1 / EV_TO_J) * units.m

    def energy(self, params, xyz, aux, cell=None):
        dist, valid = topology.distance_matrix(
            xyz, self.cell if cell is None else cell)
        n = dist.shape[-1]
        mask = valid & jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
        mask = mask & (dist < self.cutoff)
        if self.select_mask is not None:
            mask = mask & self.select_mask
        qq = self.charges[:, None] * self.charges[None, :]
        u = self.conversion * qq / jnp.where(mask, dist, 1.0)
        return jnp.where(mask, u, 0.0).sum()


class EwaldElectrostatics(Interaction):
    """Full Ewald electrostatics (beyond-reference capability).

    The reference truncates Coulomb at a cutoff (interface.py:303-361),
    which does not converge for condensed phases; this is the proper
    split-sum treatment (ops/ewald.py), differentiable in positions,
    charges and the diagonal cell -- so it composes with the NPT
    integrators and the dynamic-cell multistate path.  Charges can be
    LEARNABLE: pass ``learn_charges=True`` and they become a params leaf
    (the reference has no trainable electrostatics at all).

    ``accuracy`` trades cost for truncation error (erfc(accuracy); 3.2
    ~ 6e-6).  The k-point set is fixed at construction from the
    construction-time cell -- under NPT cell changes the set stays valid
    as long as the volume excursion is modest (the Gaussian k-filter has
    slack); rebuild the interaction for large compressions.
    """

    def __init__(self, system, charges, r_cut=None, accuracy=3.2,
                 ex_pairs=None, learn_charges=False, mode="dense",
                 capacity_slack=1.6):
        from .ops import ewald
        check_system(system)
        self._ewald = ewald
        self.charges0 = jnp.asarray(charges, dtype=jnp.float32)
        cell = np.asarray(system.get_cell())
        cm = np.diag(cell) if cell.ndim == 1 else cell
        diagonal = np.allclose(cm, np.diag(np.diag(cm)))
        self.cell0 = jnp.asarray(np.diag(cm) if diagonal else cm,
                                 dtype=jnp.float32)
        if r_cut is None:
            # half the smallest perpendicular box width (min-image bound)
            V = abs(np.linalg.det(cm))
            widths = [V / np.linalg.norm(np.cross(cm[(i + 1) % 3],
                                                  cm[(i + 2) % 3]))
                      for i in range(3)]
            r_cut = float(min(widths)) / 2 * 0.99
        self.r_cut = r_cut
        self.alpha, k_cut = ewald.ewald_params(r_cut, accuracy)
        self.nvecs = ewald.build_kvectors(cm, k_cut)
        self.learn_charges = learn_charges
        n = system.get_number_of_atoms()
        self.n_atoms = n
        self.extra_mask = None
        self.ex_pairs = None
        if ex_pairs is not None:
            if not diagonal:
                raise ValueError("ex_pairs requires a diagonal cell "
                                 "(elementwise bond re-wrap)")
            self.ex_pairs = jnp.asarray(ex_pairs, dtype=jnp.int32)
            self.extra_mask = topology.pair_index_mask(n, None, ex_pairs)
        # mode='table': the real-space erfc sum runs over an (N, K)
        # neighbor table instead of re-paying a dense O(N^2) distance
        # matrix on top of the short-range term (bench_ewald: the dense
        # real term dominates the long-range overhead at N=1000).
        # Exclusions are baked into the table's select_mask so excluded
        # pairs never occupy slots.
        if mode == "table" and not diagonal:
            raise ValueError("mode='table' requires a diagonal cell")
        self.mode = mode
        if mode == "table":
            xyz0 = jnp.asarray(system.get_positions())
            d, _ = topology.displacement_matrix(xyz0, self.cell0)
            dist_sq = (d ** 2).sum(-1) + jnp.eye(n) * 1e9
            within = dist_sq < self.r_cut ** 2
            if self.extra_mask is not None:
                within = within & self.extra_mask
            k0 = int(jnp.max(within.sum(-1)))
            self.k_max = min(
                int(np.ceil(max(k0, 1) * capacity_slack / 8) * 8), n)

    def init_params(self):
        if self.learn_charges:
            return {"charges": self.charges0}
        return {}

    def grow_capacity(self, factor=1.5):
        if self.mode != "table":
            return False
        new_k = min(int(np.ceil(self.k_max * factor / 8) * 8),
                    self.n_atoms)
        if new_k > self.k_max:
            self.k_max = new_k
            return True
        return False

    def aux_init(self, xyz, cell=None):
        if self.mode != "table":
            return ()
        cell = self.cell0 if cell is None else cell
        return topology.generate_neighbor_table(
            xyz, self.r_cut, cell, self.k_max, self.extra_mask,
            store_offsets=False)

    def aux_update(self, xyz, aux, cell=None):
        return self.aux_init(xyz, cell=cell)

    def energy(self, params, xyz, aux, cell=None):
        q = params["charges"] if self.learn_charges else self.charges0
        cl = self.cell0 if cell is None else jnp.asarray(cell)
        nbrs = aux if self.mode == "table" else None
        return self._ewald.ewald_energy(
            q, xyz, cl, self.nvecs, self.alpha, self.r_cut,
            extra_mask=self.extra_mask, ex_pairs=self.ex_pairs,
            nbrs=nbrs)


class BondPotentials(Interaction):
    """Harmonic bonds with PBC re-wrap (reference interface.py:406-455)."""

    def __init__(self, system, top, k, ro):
        check_system(system)
        self.cell_len = jnp.asarray(np.diag(system.get_cell()))
        self.top = jnp.asarray(top, dtype=jnp.int32)
        self.k, self.ro = k, ro

    def energy(self, params, xyz, aux, cell=None):
        vec = xyz[self.top[:, 0]] - xyz[self.top[:, 1]]
        vec = topology.wrap_bond_vectors(
            vec, self.cell_len if cell is None else cell)
        bond_sq = (vec ** 2).sum(-1)
        # note: the reference penalizes (r^2 - ro)^2 -- squared distance vs
        # target length (interface.py:448-453); we keep that exact form for
        # parity with the folding demo's fitted k0.
        return (0.5 * self.k * (bond_sq - self.ro) ** 2).sum()


class AnglePotentials(Interaction):
    """Harmonic angles (reference interface.py:457-510)."""

    def __init__(self, system, top, k, thetao):
        check_system(system)
        self.cell_len = jnp.asarray(np.diag(system.get_cell()))
        self.top = jnp.asarray(top, dtype=jnp.int32)
        self.k, self.thetao = k, thetao

    def energy(self, params, xyz, aux, cell=None):
        cl = self.cell_len if cell is None else cell
        v1 = xyz[self.top[:, 0]] - xyz[self.top[:, 1]]
        v2 = xyz[self.top[:, 2]] - xyz[self.top[:, 1]]
        v1 = topology.wrap_bond_vectors(v1, cl)
        v2 = topology.wrap_bond_vectors(v2, cl)
        dot = (v1 * v2).sum(-1)
        norm = jnp.sqrt((v1 ** 2).sum(-1) * (v2 ** 2).sum(-1))
        # clamp like the reference's acos guards (modules.py:188 cos/1.000001)
        cos = jnp.clip(dot / norm, -0.999999, 0.999999)
        angle = jnp.arccos(cos)
        return (0.5 * self.k * (angle - self.thetao) ** 2).sum()


class Stack(Interaction):
    """Sum of named interactions (reference interface.py:364-403).

    params and aux are dicts keyed like ``model_dict``; topology refresh
    fans out to children (reference interface.py:382-385).

    ``share_aux={"prior": "nn"}`` makes child "prior" consume child
    "nn"'s neighbor structure instead of building its own: the shared
    child's aux slot stays ``()`` and its energy receives the donor's
    aux.  At large N this removes an entire duplicate topology rebuild
    per refresh -- e.g. the 4k-atom water stack builds ONE cells-path
    (N, K) table that feeds both the SchNet convs and the ExcludedVolume
    prior (identical cutoff), instead of the prior re-deriving neighbors
    through an O(N^2) sparse-list pass every step.  Donor and sharer
    must agree on aux format (the (N, K) NeighborTable family); sharers
    with a smaller cutoff than the donor's build cutoff stay exact
    because table-mode PairPotentials re-masks by current distance.
    """

    def __init__(self, model_dict, share_aux=None):
        self.models = dict(model_dict)
        self.share_aux = dict(share_aux or {})
        for k, donor in self.share_aux.items():
            if k not in self.models or donor not in self.models:
                raise ValueError(f"share_aux {k}->{donor}: unknown child")
            if donor in self.share_aux:
                raise ValueError("share_aux chains are not supported")

    def init_params(self):
        return {k: m.init_params() for k, m in self.models.items()}

    def grow_capacity(self, factor=1.5):
        return any([m.grow_capacity(factor)
                    for k, m in self.models.items()
                    if k not in self.share_aux])

    def aux_init(self, xyz, cell=None):
        kw = {} if cell is None else {"cell": cell}
        return {k: (() if k in self.share_aux else m.aux_init(xyz, **kw))
                for k, m in self.models.items()}

    def aux_update(self, xyz, aux, cell=None):
        kw = {} if cell is None else {"cell": cell}
        return {k: (() if k in self.share_aux
                    else m.aux_update(xyz, aux[k], **kw))
                for k, m in self.models.items()}

    def energy(self, params, xyz, aux, cell=None):
        kw = {} if cell is None else {"cell": cell}
        total = 0.0
        for k, m in self.models.items():
            a = aux[self.share_aux[k]] if k in self.share_aux else aux[k]
            total = total + m.energy(params[k], xyz, a, **kw)
        return total


class WithDynamicCell(Interaction):
    """Carry the simulation cell in the aux pytree.

    Adapts any cell-kwarg-aware interaction (PairPotentials /
    GNNPotentials / Stack) to the plain ``(params, xyz, aux)`` contract
    with the cell as *runtime data*: ``aux = (cell_len, inner_aux)``.
    Because integrators thread aux through every step untouched, the SAME
    compiled stepper (md/integrators.py, force cache and all) then serves
    any number of state points with different boxes -- the enabling piece
    of the sharded multi-state fit (parallel/multistate.py), where the
    reference loops state points serially on one GPU
    (/root/reference/scripts/fit_rdf_gnn.py:388).

    ``cell_len`` is the (3,) diagonal lengths (2-D systems pad to 3).
    Gradients do not flow into the cell (it rides aux, which is data).
    """

    def __init__(self, base, cell_len0):
        self.base = base
        self.cell_len0 = jnp.asarray(cell_len0)

    def init_params(self):
        return self.base.init_params()

    def grow_capacity(self, factor=1.5):
        return self.base.grow_capacity(factor)

    def aux_init(self, xyz, cell=None):
        c = self.cell_len0 if cell is None else jnp.asarray(cell)
        return (c, self.base.aux_init(xyz, cell=c))

    def aux_update(self, xyz, aux, cell=None):
        c = aux[0] if cell is None else jnp.asarray(cell)
        return (c, self.base.aux_update(xyz, aux[1], cell=c))

    def energy(self, params, xyz, aux, cell=None):
        c = aux[0] if cell is None else cell
        return self.base.energy(params, xyz, aux[1], cell=c)
