"""AuTopology: classical force-field terms with GNN-predicted parameters.

Parity target: /root/reference/nff/nn/modules.py:24-483 -- a
``ParameterPredictor`` MLP (:44-73; non-trainable variant returns zeros,
``ZeroNet`` :24-42) maps atomic conv features to per-term force-field
parameters; term nets evaluate classical energies on explicit topologies:

  * BondNet (:77-149): harmonic / morse / cubic / quartic on bond lengths,
    with the reference's softplus-free positivity trick (sqrt-shifted
    squares) and priors r0 ~ sqrt(1.5), k ~ 100
  * AngleNet (:152-213): harmonic / cubic / quartic on acos-clamped angles,
    theta0 prior 109.5 deg, k prior 10
  * DihedralNet (:215-272): OPLS cosine series / multiharmonic in cos(phi)
  * ImproperNet (:273-319): harmonic in phi
  * PairNet (:321-377): LJ with geometric-mean mixing, sigma = 4 + 10 s^2,
    epsilon = 0.1 e^2
  * AuTopologyReadOut (:383-483): sums terms per output key + an offset

plus the bonded-graph convolutions ``SingleNodeConv``/``DoubleNodeConv``
(:614-693).  Topology arrays are padded with masks (TPU static shapes);
single-molecule evaluation -- batch via vmap.
"""

import typing

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as fnn


class ParameterPredictor(fnn.Module):
    """tanh-MLP parameter head; non-trainable -> constant zeros
    (reference modules.py:44-73)."""
    L_hidden: typing.Tuple[int, ...]
    L_out: int
    trainable: bool = True

    @fnn.compact
    def __call__(self, x):
        if not self.trainable:
            return jnp.zeros(x.shape[:-1] + (self.L_out,))
        for h in self.L_hidden:
            x = jnp.tanh(fnn.Dense(h)(x))
        return fnn.Dense(self.L_out)(x)


def _gather(ext_feats, idx):
    return ext_feats[idx]


def _pad_feats(r):
    """Append a zero row so padded topology indices (== N) gather zeros."""
    return jnp.concatenate([r, jnp.zeros_like(r[:1])], axis=0)


class BondNet(fnn.Module):
    terms: typing.Tuple[str, ...] = ("harmonic",)
    L_hidden: typing.Tuple[int, ...] = (64,)
    trainable: bool = True

    @fnn.compact
    def __call__(self, r, xyz, bonds, mask):
        ext_x = jnp.concatenate([xyz, jnp.zeros_like(xyz[:1])], axis=0)
        d = ext_x[bonds[:, 0]] - ext_x[bonds[:, 1]]
        D = jnp.sqrt((d ** 2).sum(-1) + 1e-12)[:, None]
        ext_r = _pad_feats(r)
        node_input = ext_r[bonds].sum(1)
        E = 0.0
        pp = lambda name: ParameterPredictor(self.L_hidden, 1,
                                             self.trainable, name=name)
        if "harmonic" in self.terms:
            r0 = (1.5 ** 0.5 + 0.1 * pp("r0_harmonic")(node_input)) ** 2
            k = (100 ** 0.5 + pp("k_harmonic")(node_input)) ** 2
            E = E + (k / 2) * (D - r0) ** 2
        if "morse" in self.terms:
            r0 = pp("r0_morse")(node_input) ** 2
            a = pp("a_morse")(node_input) ** 2
            De = pp("De_morse")(node_input) ** 2
            E = E + De * (1 - jnp.exp(-a * (D - r0))) ** 2
        if "cubic" in self.terms:
            r0 = pp("r0_cubic")(node_input) ** 2
            k = pp("k_cubic")(node_input) ** 2
            E = E + (k / 2) * (D - r0) ** 3
        if "quartic" in self.terms:
            r0 = pp("r0_quartic")(node_input) ** 2
            k = pp("k_quartic")(node_input) ** 2
            E = E + (k / 2) * (D - r0) ** 4
        return (E.squeeze(-1) * mask).sum()


class AngleNet(fnn.Module):
    terms: typing.Tuple[str, ...] = ("harmonic",)
    L_hidden: typing.Tuple[int, ...] = (64,)
    trainable: bool = True

    @fnn.compact
    def __call__(self, r, xyz, angles, mask):
        ext_x = jnp.concatenate([xyz, jnp.zeros_like(xyz[:1])], axis=0)
        v1 = ext_x[angles[:, 0]] - ext_x[angles[:, 1]]
        v2 = ext_x[angles[:, 2]] - ext_x[angles[:, 1]]
        dot = (v1 * v2).sum(-1)
        norm = jnp.sqrt((v1 ** 2).sum(-1) * (v2 ** 2).sum(-1) + 1e-12)
        cos = (dot / norm) / 1.000001  # reference's acos guard
        theta = jnp.arccos(jnp.clip(cos, -0.999999, 0.999999))[:, None]
        ext_r = _pad_feats(r)
        node_input = jnp.concatenate(
            [ext_r[angles[:, [0, 2]]].sum(1), ext_r[angles[:, 1]]], -1)
        E = 0.0
        pp = lambda name: ParameterPredictor(self.L_hidden, 1,
                                             self.trainable, name=name)
        if "harmonic" in self.terms:
            th0 = ((109.5 * np.pi / 180) ** 0.5
                   + pp("theta0_harmonic")(node_input)) ** 2
            k = (10 ** 0.5 + pp("k_harmonic")(node_input)) ** 2
            E = E + (k / 2) * (theta - th0) ** 2
        if "cubic" in self.terms:
            th0 = pp("theta0_cubic")(node_input) ** 2
            k = pp("k_cubic")(node_input) ** 2
            E = E + (k / 2) * (theta - th0) ** 3
        if "quartic" in self.terms:
            th0 = pp("theta0_quartic")(node_input) ** 2
            k = pp("k_quartic")(node_input) ** 2
            E = E + (k / 2) * (theta - th0) ** 4
        return (E.squeeze(-1) * mask).sum()


def _dihedral_phi(xyz, quads):
    ext_x = jnp.concatenate([xyz, jnp.zeros_like(xyz[:1])], axis=0)
    vec1 = ext_x[quads[:, 0]] - ext_x[quads[:, 1]]
    vec2 = ext_x[quads[:, 2]] - ext_x[quads[:, 1]]
    vec3 = ext_x[quads[:, 1]] - ext_x[quads[:, 2]]
    vec4 = ext_x[quads[:, 3]] - ext_x[quads[:, 2]]
    c1 = jnp.cross(vec1, vec2)
    c2 = jnp.cross(vec3, vec4)
    norm = jnp.sqrt((c1 ** 2).sum(-1) * (c2 ** 2).sum(-1) + 1e-12)
    cos_phi = ((c1 * c2).sum(-1) / norm) / 1.000001
    return jnp.clip(cos_phi, -0.999999, 0.999999)[:, None]


class DihedralNet(fnn.Module):
    terms: typing.Tuple[str, ...] = ("OPLS",)
    L_hidden: typing.Tuple[int, ...] = (64,)
    trainable: bool = True

    @fnn.compact
    def __call__(self, r, xyz, dihedrals, mask):
        cos_phi = _dihedral_phi(xyz, dihedrals)
        ext_r = _pad_feats(r)
        nonlinear = ParameterPredictor(self.L_hidden, self.L_hidden[-1],
                                       self.trainable, name="nonlinear")
        pair1 = nonlinear(jnp.concatenate(
            [ext_r[dihedrals[:, 1]], ext_r[dihedrals[:, 0]]], -1))
        pair2 = nonlinear(jnp.concatenate(
            [ext_r[dihedrals[:, 2]], ext_r[dihedrals[:, 3]]], -1))
        x = pair1 + pair2
        E = 0.0
        if "multiharmonic" in self.terms:
            A = ParameterPredictor(self.L_hidden, 5, self.trainable,
                                   name="multiharmonic")(x)
            for m in range(5):
                E = E + A[:, m:m + 1] * cos_phi ** m
        if "OPLS" in self.terms:
            V = ParameterPredictor(self.L_hidden, 4, self.trainable,
                                   name="OPLS")(x)
            phi = jnp.arccos(cos_phi)
            for m in range(4):
                E = E + (V[:, m:m + 1] / 2) * (
                    1 + ((-1) ** m) * jnp.cos((m + 1) * phi))
        return (E.squeeze(-1) * mask).sum()


class ImproperNet(fnn.Module):
    terms: typing.Tuple[str, ...] = ("harmonic",)
    L_hidden: typing.Tuple[int, ...] = (64,)
    trainable: bool = True

    @fnn.compact
    def __call__(self, r, xyz, impropers, mask):
        cos_phi = _dihedral_phi(xyz, impropers)
        phi = jnp.arccos(cos_phi)
        ext_r = _pad_feats(r)
        nonlinear = ParameterPredictor(self.L_hidden, self.L_hidden[-1],
                                       self.trainable, name="nonlinear")
        x = sum(nonlinear(jnp.concatenate(
            [ext_r[impropers[:, 0]], ext_r[impropers[:, j]]], -1))
            for j in (1, 2, 3))
        E = 0.0
        if "harmonic" in self.terms:
            k = ParameterPredictor(self.L_hidden, 1, self.trainable,
                                   name="k_harmonic")(x) ** 2
            E = E + (k / 2) * phi ** 2
        return (E.squeeze(-1) * mask).sum()


class PairNet(fnn.Module):
    """LJ with geometric mixing (reference modules.py:321-377)."""
    terms: typing.Tuple[str, ...] = ("LJ",)
    L_hidden: typing.Tuple[int, ...] = (64,)
    trainable: bool = True

    @fnn.compact
    def __call__(self, r, xyz, pairs, mask):
        ext_x = jnp.concatenate([xyz, jnp.zeros_like(xyz[:1]) + 1e3],
                                axis=0)
        d = ext_x[pairs[:, 0]] - ext_x[pairs[:, 1]]
        inv_d = 1.0 / jnp.sqrt((d ** 2).sum(-1) + 1e-12)[:, None]
        E = 0.0
        if "LJ" in self.terms:
            sigma = 4.0 + 10 * ParameterPredictor(
                self.L_hidden, 1, self.trainable, name="sigma")(r) ** 2
            eps = 0.1 * ParameterPredictor(
                self.L_hidden, 1, self.trainable, name="epsilon")(r) ** 2
            ext_s = jnp.concatenate([sigma, jnp.ones_like(sigma[:1])], 0)
            ext_e = jnp.concatenate([eps, jnp.zeros_like(eps[:1])], 0)
            s_mix = jnp.sqrt(ext_s[pairs].prod(1))
            e_mix = jnp.sqrt(ext_e[pairs].prod(1))
            x = s_mix * inv_d
            E = E + 4 * e_mix * (x ** 12 - x ** 6)
        return (E.squeeze(-1) * mask).sum()


TOPOLOGY_NETS = {"bond": BondNet, "angle": AngleNet,
                 "dihedral": DihedralNet, "improper": ImproperNet,
                 "pair": PairNet}


class _SingleNodeConv(fnn.Module):
    """Bonded-graph conv: sum of neighbor features -> update MLP
    (reference modules.py:663-693)."""
    width: int

    @fnn.compact
    def __call__(self, r, bonds, mask, n_atoms):
        ext = _pad_feats(r)
        m = mask[:, None].astype(r.dtype)
        seg = lambda v, i: jax.ops.segment_sum(
            v, i, num_segments=n_atoms + 1)[:-1]
        agg = seg(ext[bonds[:, 0]] * m, bonds[:, 1]) \
            + seg(ext[bonds[:, 1]] * m, bonds[:, 0])
        return jnp.tanh(fnn.Dense(self.width)(agg))


class _DoubleNodeConv(fnn.Module):
    """Bonded + self features concatenated (reference modules.py:614-661)."""
    width: int

    @fnn.compact
    def __call__(self, r, bonds, mask, n_atoms):
        ext = _pad_feats(r)
        m = mask[:, None].astype(r.dtype)
        seg = lambda v, i: jax.ops.segment_sum(
            v, i, num_segments=n_atoms + 1)[:-1]
        bonded = seg(ext[bonds[:, 0]] * m, bonds[:, 1]) \
            + seg(ext[bonds[:, 1]] * m, bonds[:, 0])
        self_sum = seg(ext[bonds[:, 0]] * m, bonds[:, 0]) \
            + seg(ext[bonds[:, 1]] * m, bonds[:, 1])
        new_r = jnp.concatenate([bonded, self_sum], -1)
        return jnp.tanh(fnn.Dense(self.width)(new_r))


class _AuTopologyModule(fnn.Module):
    Fr: int
    Lh: typing.Tuple[int, ...]
    terms: typing.Mapping[str, typing.Tuple[str, ...]]
    n_convolutions: int = 2
    conv_type: str = "single_node"
    trainable_prior: bool = True
    output_keys: typing.Tuple[str, ...] = ("energy",)

    @fnn.compact
    def __call__(self, z, xyz, tops, masks):
        n = z.shape[0]
        r = fnn.Embed(100, self.Fr)(z)
        conv_cls = (_SingleNodeConv if self.conv_type == "single_node"
                    else _DoubleNodeConv)
        for _ in range(self.n_convolutions):
            r = r + conv_cls(self.Fr)(r, tops["bonds"], masks["bonds"], n)

        out = {}
        for key in self.output_keys:
            E = 0.0
            for top, terms in self.terms.items():
                net = TOPOLOGY_NETS[top](
                    tuple(terms), tuple(self.Lh), self.trainable_prior,
                    name=f"{key}_{top}")
                tkey = "bonds" if top == "bond" else top
                E = E + net(r, xyz, tops[tkey], masks[tkey])
            offset = ParameterPredictor(tuple(self.Lh), 1, True,
                                        name=f"{key}_offset")(r)
            out[key] = E + offset.sum()
        return out


class AuTopology:
    """AuTopology model (reference nff/nn/models/schnet.py:174-300).

    topologies: dict of padded index arrays (keys 'bonds', 'angle',
    'dihedral', 'improper', 'pair' as configured) + parallel boolean masks.
    Use :func:`mdgrad_tpu.data.topology.generate_topologies` to build them.
    """

    def __init__(self, modelparams):
        terms = {}
        defaults = {"bond": ("morse",), "angle": ("harmonic",),
                    "dihedral": ("OPLS",), "improper": ("harmonic",),
                    "pair": ("LJ",)}
        for top, dflt in defaults.items():
            if f"{top}_terms" in modelparams:
                terms[top] = tuple(modelparams[f"{top}_terms"])
        self.module = _AuTopologyModule(
            Fr=modelparams["Fr"],
            Lh=tuple(modelparams["Lh"]),
            terms=terms,
            n_convolutions=modelparams.get("n_convolutions", 2),
            conv_type=modelparams.get("conv_type", "single_node"),
            trainable_prior=modelparams.get("trainable_prior", True),
            output_keys=tuple(modelparams.get("output_keys", ("energy",))))

    @staticmethod
    def prepare_topologies(top_dict):
        """numpy topology dict -> (padded index dict, mask dict)."""
        key_map = {"bonds": "bonds", "angles": "angle",
                   "dihedrals": "dihedral", "impropers": "improper",
                   "pairs": "pair"}
        tops, masks = {}, {}
        for np_key, key in key_map.items():
            arr = np.asarray(top_dict.get(np_key,
                                          np.zeros((0, 2), np.int32)))
            if len(arr) == 0:
                arr = np.zeros((1, arr.shape[1] if arr.ndim == 2
                                and arr.shape[1] else 2), np.int32)
                mask = np.zeros(1, dtype=bool)
            else:
                mask = np.ones(len(arr), dtype=bool)
            tops[key] = jnp.asarray(arr, dtype=jnp.int32)
            masks[key] = jnp.asarray(mask)
        return tops, masks

    def init_params(self, z, tops, masks, key=None):
        key = jax.random.PRNGKey(0) if key is None else key
        n = z.shape[0]
        return self.module.init(key, jnp.asarray(z), jnp.zeros((n, 3)),
                                tops, masks)["params"]

    def atomwise(self, params, z, xyz, tops, masks):
        return self.module.apply({"params": params}, z, xyz, tops, masks)

    def energy(self, params, z, xyz, tops, masks, key="energy"):
        return self.atomwise(params, z, xyz, tops, masks)[key]

    def energy_and_forces(self, params, z, xyz, tops, masks, key="energy"):
        u, g = jax.value_and_grad(self.energy, argnums=2)(
            params, z, xyz, tops, masks, key)
        return u, -g
