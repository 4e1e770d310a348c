"""Checkpoint/resume for the MD fitting drivers.

The reference never persists optimizer state in its fitting loops (a
500-epoch water fit that dies at epoch 499 restarts from zero —
fit_rdf_gnn.py / fit_rdf_pair.py only dump params JSON); SURVEY §5
flagged the gap.  This mirrors the supervised Trainer's rotating
checkpoints (train/supervised.py) for the epoch-loop drivers: each blob
carries (epoch, params, optax state, per-state-point MD states, logs) as
numpy-ified pytrees, so a fit resumes bit-exactly mid-annealing.
"""

import glob
import os
import pickle

import jax
import numpy as np


def _to_np(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


class FitCheckpointer:
    """Rotating checkpoint files ``fit-ckpt-<epoch>.pkl`` under
    ``model_path``.  ``model_path=None`` disables everything (no-op)."""

    def __init__(self, model_path, every=10, keep=3):
        self.path = model_path
        self.every = max(int(every), 1)
        self.keep = keep
        if model_path:
            os.makedirs(model_path, exist_ok=True)

    def _files(self):
        files = glob.glob(os.path.join(self.path, "fit-ckpt-*.pkl"))
        return sorted(files,
                      key=lambda p: int(p.split("-")[-1].split(".")[0]))

    def latest(self):
        if not self.path:
            return None
        files = self._files()
        return files[-1] if files else None

    def restore(self):
        """Returns the latest blob dict, or None when there is nothing to
        resume from."""
        path = self.latest()
        if path is None:
            return None
        with open(path, "rb") as f:
            return pickle.load(f)

    def maybe_save(self, epoch, params, opt_state, md_states=None,
                   logs=None):
        """Save when ``epoch`` hits the interval (and rotate)."""
        if not self.path or (epoch + 1) % self.every:
            return
        self.save(epoch, params, opt_state, md_states, logs)

    def save(self, epoch, params, opt_state, md_states=None, logs=None):
        if not self.path:
            return
        blob = {"epoch": epoch, "params": _to_np(params),
                "opt_state": _to_np(opt_state),
                "md_states": _to_np(md_states), "logs": logs or {}}
        out = os.path.join(self.path, f"fit-ckpt-{epoch}.pkl")
        tmp = out + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(blob, f)
        os.replace(tmp, out)  # no truncated blobs on mid-write death
        for old in self._files()[:-self.keep]:
            os.remove(old)

    def save_best(self, epoch, loss, params, fname="best.pkl"):
        """Persist ``fname`` whenever ``loss`` beats the stored best
        (trajectory fits oscillate around their noise floor -- the final
        epoch is rarely the best one; mirrors the supervised Trainer's
        best-model file, train/supervised.py).  Drivers with an
        equilibrated evaluation pass ``fname='best_eval.pkl'`` so the
        drift-free selection lives alongside the train-loss one."""
        if not self.path:
            return
        best_path = os.path.join(self.path, fname)
        prev = None
        if os.path.exists(best_path):
            with open(best_path, "rb") as f:
                prev = pickle.load(f)
        if prev is not None and prev["loss"] <= loss:
            return
        tmp = best_path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump({"epoch": epoch, "loss": float(loss),
                         "params": _to_np(params)}, f)
        os.replace(tmp, best_path)
