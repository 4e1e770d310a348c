"""SchNetAuTopology: staged GNN + classical-FF combination model.

Parity target: /root/reference/nff/nn/models/schnet.py:303-479 -- train the
cheap AuTopology classical prior first, then freeze it and switch on the
SchNet correction (``transfer_to_schnet``, :377-386); multi-state energies
can be sorted per molecule so energy_0 <= energy_1 <= ... (:391-431).

TPU-native notes: the freeze is an optax mask (returned by
:meth:`trainable_labels`) instead of requires_grad mutation; energy sorting
is a vectorized ``jnp.sort``/``take_along_axis`` over the stacked state
energies instead of the reference's per-molecule Python loop.
"""

import jax
import jax.numpy as jnp

from .schnet import SchNet
from .autopology import AuTopology


class SchNetAuTopology:
    """Combined model over a single system; batch via vmap.

    modelparams: {"schnet_params", "autopology_params",
    "sorted_result_keys", "sort_results"}.  Both submodels must share the
    same output keys.
    """

    def __init__(self, modelparams, add_autopology=True, add_schnet=False):
        keys = tuple(modelparams["sorted_result_keys"])
        sp = dict(modelparams["schnet_params"], readout_keys=keys)
        ap = dict(modelparams["autopology_params"], output_keys=keys)
        self.schnet = SchNet(sp)
        self.autopology = AuTopology(ap)
        self.sorted_result_keys = keys
        self.sort_results = modelparams.get("sort_results", False)
        self.add_autopology = add_autopology
        self.add_schnet = add_schnet

    def init_params(self, z, tops, masks, key=None):
        key = jax.random.PRNGKey(0) if key is None else key
        k1, k2 = jax.random.split(key)
        return {"schnet": self.schnet.init_params(z, key=k1),
                "autopology": self.autopology.init_params(
                    z, tops, masks, key=k2)}

    def transfer_to_schnet(self):
        """Stage switch (parity: reference schnet.py:377-386): start adding
        SchNet on top of the (to-be-frozen) AuTopology prior.  Use
        :meth:`trainable_labels` with optax.multi_transform to freeze."""
        self.add_schnet = True
        return self.trainable_labels()

    def trainable_labels(self):
        """{'schnet'|'autopology' -> 'train'|'frozen'} for optax masking."""
        return {"schnet": "train" if self.add_schnet else "frozen",
                "autopology": "frozen" if self.add_schnet else "train"}

    def energies(self, params, z, xyz, nbrs_idx, offsets_real, nbr_mask,
                 tops, top_masks):
        """Per-state energy vector (K,), ordered like sorted_result_keys."""
        total = jnp.zeros(len(self.sorted_result_keys))
        if self.add_schnet:
            out = self.schnet.atomwise(params["schnet"], z, xyz, nbrs_idx,
                                       offsets_real, nbr_mask)
            total = total + jnp.stack(
                [out[k].sum() for k in self.sorted_result_keys])
        if self.add_autopology:
            out = self.autopology.atomwise(params["autopology"], z, xyz,
                                           tops, top_masks)
            total = total + jnp.stack(
                [out[k] for k in self.sorted_result_keys])
        if self.sort_results:
            total = jnp.sort(total)
        return total

    def energies_and_forces(self, params, z, xyz, nbrs_idx, offsets_real,
                            nbr_mask, tops, top_masks):
        """(energies (K,), forces (K, N, 3)) -- per-state gradients."""
        def e_fn(x):
            return self.energies(params, z, x, nbrs_idx, offsets_real,
                                 nbr_mask, tops, top_masks)
        energies = e_fn(xyz)
        grads = jax.jacrev(e_fn)(xyz)
        return energies, -grads
