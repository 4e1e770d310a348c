"""Model builders: construct / persist models from param dicts.

Parity target: /root/reference/nff/train/builders/model.py --
``PARAMS_TYPE`` per-model config validation (:10-60), ``get_model`` (:92),
``load_model`` (:109), plus ``get_trainer`` (builders/trainer.py:13-68)
assembling optimizer + hooks.
"""

import os
import pickle

from ..nn import SchNet
from .supervised import (Trainer, build_mse_loss, EarlyStoppingHook,
                         MaxEpochHook, ReduceLROnPlateauHook, PrintingHook,
                         CSVHook)

PARAMS_TYPE = {
    "SchNet": {
        "n_atom_basis": int,
        "n_filters": int,
        "n_gaussians": int,
        "n_convolutions": int,
        "cutoff": float,
        "trainable_gauss": bool,
        "readout_keys": (tuple, list),
    },
}

MODEL_DICT = {"SchNet": SchNet}


def check_parameters(params_type, params):
    """Validate config dtypes (parity: reference model.py:65-80)."""
    for key, val in params.items():
        if key in params_type and not isinstance(val, params_type[key]):
            raise TypeError(f"{key} is not of type {params_type[key]}")


def get_model(params, model_type="SchNet"):
    """(parity: reference model.py:92-107)."""
    if model_type not in MODEL_DICT:
        raise ValueError(f"unknown model type {model_type!r}; "
                         f"options: {sorted(MODEL_DICT)}")
    check_parameters(PARAMS_TYPE[model_type], params)
    return MODEL_DICT[model_type](params)


def save_model(path, model_type, model_params, params):
    import numpy as np
    import jax
    blob = {"model_type": model_type, "model_params": model_params,
            "params": jax.tree_util.tree_map(np.asarray, params)}
    with open(path, "wb") as f:
        pickle.dump(blob, f)


def load_model(path):
    """Rebuild (model, params) from a saved blob or a trainer's best-model
    file (parity: reference model.py:109-128)."""
    with open(path, "rb") as f:
        blob = pickle.load(f)
    if isinstance(blob, dict) and "model_type" in blob:
        model = get_model(blob["model_params"], blob["model_type"])
        return model, blob["params"]
    return None, blob  # bare params pytree (best_model.pkl)


def get_trainer(model, params, train_loader, val_loader, model_path,
                loss_coef=None, lr=3e-4, max_epochs=200, patience=30,
                log=print):
    """Assemble the standard supervised trainer
    (parity: reference builders/trainer.py:13-68)."""
    loss_coef = loss_coef or {"energy": 0.1, "energy_grad": 1.0}
    hooks = [
        MaxEpochHook(max_epochs),
        EarlyStoppingHook(patience=patience),
        ReduceLROnPlateauHook(patience=max(patience // 2, 5)),
        PrintingHook(log=log),
        CSVHook(model_path),
    ]
    return Trainer(
        model_path=model_path,
        model_fn=model.batched_predict,
        params=params,
        loss_fn=build_mse_loss(loss_coef),
        train_loader=train_loader,
        val_loader=val_loader,
        lr=lr,
        hooks=hooks)
