"""Glue layer: combine batch-dict models into one prediction head.

Parity target: ``nff.nn.glue.Stack`` (/root/reference/nff/nn/glue.py:4-37)
-- sums (or averages) the output dicts of several models over shared keys.
Functional contract: each member model follows the (init_params /
batched_predict) protocol; the stack's params are a dict keyed by member
name, so optax sees one pytree and subtrees can be frozen individually.
"""

import jax


class Stack:
    """Sum/mean of several batch-dict models' predictions.

    model_dict: {name: model} where each model exposes
    ``batched_predict(params, batch) -> {key: array}`` (e.g.
    :class:`mdgrad_tpu.nn.SchNet`).
    """

    def __init__(self, model_dict, mode="sum"):
        if mode not in ("sum", "mean"):
            raise NotImplementedError(
                f"{mode} mode is not implemented for Stack")
        self.models = dict(model_dict)
        self.mode = mode

    def init_params(self, z, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, len(self.models))
        return {name: m.init_params(z, key=k)
                for (name, m), k in zip(self.models.items(), keys)}

    def batched_predict(self, params, batch,
                        keys_to_combine=("energy", "energy_grad")):
        out = {}
        for name, model in self.models.items():
            result = model.batched_predict(params[name], batch)
            for key in keys_to_combine:
                out[key] = out[key] + result[key] if key in out \
                    else result[key]
        if self.mode == "mean":
            for key in keys_to_combine:
                out[key] = out[key] / len(self.models)
        return out

    __call__ = batched_predict
