"""Additional GNN force-field models beyond plain SchNet.

Parity targets:
  * ``GraphConvIntegration`` (/root/reference/nff/nn/models/
    graphconvintegration.py:13-102): SchNet with per-atom ``aggr_wgt``
    weights for thermodynamic integration (the lambda knob of nff/md/TI.py).
  * ``HybridGraphConv`` (/root/reference/nff/nn/models/hybridgraph.py:14-94):
    dual convolution stacks -- intra-molecular (``atoms_nbr_list``) and
    system-wide (``nbr_list``) -- sharing one embedding, readout on the sum
    of both node states; optional learnable excluded-volume term (``V_ex``,
    hybridgraph.py:68-72).
  * ``GraphAttention`` (/root/reference/nff/nn/modules.py:697-758):
    self-attention-weighted message passing.

All take padded edge lists + masks (TPU static shapes).
"""

import typing

import jax
import jax.numpy as jnp
import flax.linen as fnn

from .layers import shifted_softplus
from .schnet import SchNetConv, SchNet


class GraphAttention(fnn.Module):
    """Self-attention pooling layer (reference modules.py:697-758)."""
    n_atom_basis: int

    @fnn.compact
    def __call__(self, r, idx, mask, n_atoms):
        w = self.param("weight", fnn.initializers.uniform(1.0),
                       (1, 2 * self.n_atom_basis))
        act = lambda x: jax.nn.leaky_relu(x)
        ext = jnp.concatenate([r, jnp.zeros_like(r[:1])], axis=0)
        ri, rj = ext[idx[:, 0]], ext[idx[:, 1]]
        m = mask.astype(r.dtype)
        w_ij = jnp.exp(act(jnp.concatenate([ri, rj], -1) * w).sum(-1)) * m
        w_ji = jnp.exp(act(jnp.concatenate([rj, ri], -1) * w).sum(-1)) * m
        w_ii = jnp.exp(act(jnp.concatenate([r, r], -1) * w).sum(-1))

        seg = lambda v, i: jax.ops.segment_sum(
            v, i, num_segments=n_atoms + 1)[:-1]
        norm = seg(w_ij, idx[:, 0]) + seg(w_ji, idx[:, 1]) + w_ii
        ext_norm = jnp.concatenate([norm, jnp.ones(1)], axis=0)
        a_ij = w_ij / ext_norm[idx[:, 0]]
        a_ji = w_ji / ext_norm[idx[:, 1]]
        a_ii = w_ii / norm
        out = r * a_ii[:, None]
        out = out + seg(ri * a_ij[:, None], idx[:, 1])
        out = out + seg(rj * a_ji[:, None], idx[:, 0])
        return out


class SchNetEdgeUpdate(fnn.Module):
    """Edge-state update from the connected nodes (arXiv:1806.03146;
    reference modules.py:579-612): e'_ij = MLP(cat(r_i, r_j))."""
    n_atom_basis: int

    @fnn.compact
    def __call__(self, r, idx, mask):
        ext = jnp.concatenate([r, jnp.zeros_like(r[:1])], axis=0)
        x = jnp.concatenate([ext[idx[:, 0]], ext[idx[:, 1]]], axis=-1)
        x = jax.nn.relu(fnn.Dense(self.n_atom_basis)(x))
        x = jax.nn.relu(fnn.Dense(self.n_atom_basis)(x))
        e = fnn.Dense(1)(x)
        return e * mask[:, None].astype(e.dtype)


class _HybridModule(fnn.Module):
    n_atom_basis: int
    n_filters: int
    n_gaussians: int
    mol_n_convolutions: int
    mol_cutoff: float
    sys_n_convolutions: int
    sys_cutoff: float
    V_ex_power: int = 10
    V_ex_sigma: float = 1.0
    use_v_ex: bool = False
    trainable_gauss: bool = False

    @fnn.compact
    def __call__(self, z, xyz, sys_idx, sys_off, sys_mask,
                 mol_idx, mol_mask):
        n = z.shape[0]
        r0 = fnn.Embed(100, self.n_atom_basis)(z)
        ext = jnp.concatenate([xyz, jnp.zeros_like(xyz[:1])], axis=0)

        def edge_len(idx, off):
            d = ext[idx[:, 0]] - ext[idx[:, 1]] - off
            return jnp.sqrt((d ** 2).sum(-1) + 1e-20)[:, None]

        e_sys = edge_len(sys_idx, sys_off)
        e_mol = edge_len(mol_idx, 0.0)

        r_sys = r0
        for _ in range(self.sys_n_convolutions):
            r_sys = r_sys + SchNetConv(
                self.n_atom_basis, self.n_filters, self.n_gaussians,
                self.sys_cutoff, self.trainable_gauss)(
                    r_sys, e_sys, sys_idx, sys_mask, n)
        r_mol = r0
        for _ in range(self.mol_n_convolutions):
            r_mol = r_mol + SchNetConv(
                self.n_atom_basis, self.n_filters, self.n_gaussians,
                self.mol_cutoff, self.trainable_gauss)(
                    r_mol, e_mol, mol_idx, mol_mask, n)

        h = shifted_softplus(fnn.Dense(self.n_atom_basis // 2)(
            r_sys + r_mol))
        energy = fnn.Dense(1)(h).squeeze(-1)
        if self.use_v_ex:
            sigma = self.param(
                "v_ex_sigma",
                lambda k: jnp.asarray(self.V_ex_sigma, dtype=jnp.float32))
            dist = edge_len(sys_idx, sys_off).squeeze(-1)
            pot = ((sigma / dist) ** self.V_ex_power) * sys_mask
            energy = energy + jax.ops.segment_sum(
                pot, sys_idx[:, 0], num_segments=n + 1)[:-1]
        return energy


class HybridGraphConv:
    """Dual-graph SchNet (reference hybridgraph.py:14-94)."""

    def __init__(self, modelparams):
        self.module = _HybridModule(
            n_atom_basis=modelparams["n_atom_basis"],
            n_filters=modelparams["n_filters"],
            n_gaussians=modelparams["n_gaussians"],
            mol_n_convolutions=modelparams["mol_n_convolutions"],
            mol_cutoff=modelparams["mol_cutoff"],
            sys_n_convolutions=modelparams["sys_n_convolutions"],
            sys_cutoff=modelparams["sys_cutoff"],
            V_ex_power=modelparams.get("V_ex_power", 10),
            V_ex_sigma=modelparams.get("V_ex_sigma", 1.0),
            use_v_ex=modelparams.get("use_v_ex", False),
            trainable_gauss=modelparams.get("trainable_gauss", False))

    def init_params(self, z, key=None):
        key = jax.random.PRNGKey(0) if key is None else key
        n = z.shape[0]
        idx = jnp.zeros((1, 2), dtype=jnp.int32)
        return self.module.init(
            key, jnp.asarray(z), jnp.zeros((n, 3)), idx,
            jnp.zeros((1, 3)), jnp.ones(1, dtype=bool), idx,
            jnp.ones(1, dtype=bool))["params"]

    def atomwise_energy(self, params, z, xyz, sys_idx, sys_off, sys_mask,
                        mol_idx, mol_mask):
        return self.module.apply({"params": params}, z, xyz, sys_idx,
                                 sys_off, sys_mask, mol_idx, mol_mask)

    def energy(self, params, z, xyz, sys_idx, sys_off, sys_mask, mol_idx,
               mol_mask):
        return self.atomwise_energy(params, z, xyz, sys_idx, sys_off,
                                    sys_mask, mol_idx, mol_mask).sum()


class GraphConvIntegration(SchNet):
    """SchNet whose messages are scaled by per-atom ``aggr_wgt`` -- the
    lambda coupling of thermodynamic integration
    (reference graphconvintegration.py:13-102).  Use ``energy(...,
    aggr_wgt=w)``; ``w`` interpolates between end states.
    """
    pass
