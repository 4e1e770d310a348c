"""Supervised force-field training: Trainer, hooks, losses, metrics.

Parity target: the nff training stack --
``Trainer`` (/root/reference/nff/train/trainer.py:19-300: epoch loop,
minibatch accumulation, validation with best-model save, rotating
checkpoints, hook dispatch), the hook zoo (nff/train/hooks/: EarlyStopping,
MaxEpoch, MaxStep, ReduceLROnPlateau, ExponentialDecay, CSV/Printing
logging), ``build_mse_loss`` with per-key coefficients and NaN masking
(nff/train/loss.py:6-69), MAE/RMSE metrics (nff/train/metrics.py:52-133),
``evaluate`` (nff/train/evaluate.py:7-54) and transfer-learning
freeze/unfreeze (nff/train/transfer.py:11-33).

TPU-native notes: the train step is one jitted value_and_grad over a
*padded* batch (see data/loader.py); the learning rate is an
``optax.inject_hyperparams`` runtime value so scheduling hooks mutate it
without recompiling; checkpoints are plain pickles of numpy-ified pytrees.
"""

import os
import csv
import json
import glob
import pickle
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# losses & metrics
# ---------------------------------------------------------------------------

def build_mse_loss(loss_coef):
    """Weighted multi-key MSE with NaN masking
    (parity: reference nff/train/loss.py:6-69).

    loss_coef: {key: coefficient}; per-atom keys are masked by atom_mask.
    """
    def loss_fn(batch, preds):
        loss = 0.0
        for key, coef in loss_coef.items():
            targ = batch[key]
            pred = preds[key]
            valid = jnp.isfinite(targ)
            if targ.ndim >= 2 and "atom_mask" in batch:
                valid = valid & batch["atom_mask"][
                    (...,) + (None,) * (targ.ndim - 2)]
            if "batch_weight" in batch:
                # batch-fill duplicates must vanish from numerator AND
                # denominator or partial batches deflate the loss
                w = batch["batch_weight"].reshape(
                    (-1,) + (1,) * (targ.ndim - 1))
                valid = valid & (w > 0)
            diff = jnp.where(valid, pred - jnp.where(valid, targ, 0.0),
                             0.0)
            loss = loss + coef * (diff ** 2).sum() / \
                jnp.maximum(valid.sum(), 1)
        return loss
    return loss_fn


def mae(pred, targ, mask=None):
    d = np.abs(np.asarray(pred) - np.asarray(targ))
    if mask is not None:
        d = d[np.asarray(mask)]
    return float(d.mean())


def rmse(pred, targ, mask=None):
    d = (np.asarray(pred) - np.asarray(targ)) ** 2
    if mask is not None:
        d = d[np.asarray(mask)]
    return float(np.sqrt(d.mean()))


# ---------------------------------------------------------------------------
# hooks (parity: nff/train/hooks)
# ---------------------------------------------------------------------------

class Hook:
    def on_train_begin(self, trainer):
        pass

    def on_epoch_begin(self, trainer):
        pass

    def on_batch_end(self, trainer, loss, batch=None):
        pass

    def on_validation_end(self, trainer, val_loss):
        pass

    def on_epoch_end(self, trainer):
        pass

    def on_train_ends(self, trainer):
        pass

    def on_train_failed(self, trainer):
        pass


class MaxEpochHook(Hook):
    def __init__(self, max_epochs):
        self.max_epochs = max_epochs

    def on_epoch_begin(self, trainer):
        if trainer.epoch >= self.max_epochs:
            trainer.stop = True


class MaxStepHook(Hook):
    def __init__(self, max_steps):
        self.max_steps = max_steps

    def on_batch_end(self, trainer, loss, batch=None):
        if trainer.step >= self.max_steps:
            trainer.stop = True


class EarlyStoppingHook(Hook):
    """Stop when validation loss hasn't improved for ``patience`` epochs
    (reference hooks/scheduling.py:12-45)."""

    def __init__(self, patience, threshold_ratio=0.0001):
        self.patience = patience
        self.threshold_ratio = threshold_ratio
        self.best = np.inf
        self.counter = 0

    def on_validation_end(self, trainer, val_loss):
        if val_loss <= (1 - self.threshold_ratio) * self.best:
            self.best = val_loss
            self.counter = 0
        else:
            self.counter += 1
        if self.counter > self.patience:
            trainer.stop = True


class ReduceLROnPlateauHook(Hook):
    """Halve the runtime LR on validation plateau
    (reference hooks/scheduling.py:211-274)."""

    def __init__(self, patience=25, factor=0.5, min_lr=1e-6,
                 window_length=1, stop_after_min=False):
        self.patience = patience
        self.factor = factor
        self.min_lr = min_lr
        self.best = np.inf
        self.counter = 0
        self.stop_after_min = stop_after_min

    def on_validation_end(self, trainer, val_loss):
        if val_loss < self.best:
            self.best = val_loss
            self.counter = 0
            return
        self.counter += 1
        if self.counter > self.patience:
            new_lr = max(trainer.get_lr() * self.factor, self.min_lr)
            trainer.set_lr(new_lr)
            self.counter = 0
            if self.stop_after_min and new_lr <= self.min_lr:
                trainer.stop = True


class WarmRestartHook(Hook):
    """Cosine-annealed LR with warm restarts
    (reference hooks/scheduling.py:48-112): lr follows a half-cosine from
    lr_max to lr_min over T epochs; on restart T doubles (T_mult) and the
    best model so far is reloaded if the cycle regressed."""

    def __init__(self, T0=10, T_mult=2, lr_min=1e-6, lr_factor=1.0,
                 patience=1):
        self.T = T0
        self.T_mult = T_mult
        self.lr_min = lr_min
        self.lr_factor = lr_factor
        self.patience = patience
        self.epoch_in_cycle = 0
        self.lr_max = None
        self.best_cycle = np.inf
        self.failed_cycles = 0

    def on_epoch_begin(self, trainer):
        if self.lr_max is None:
            self.lr_max = trainer.get_lr()
        frac = min(self.epoch_in_cycle / max(self.T, 1), 1.0)
        lr = self.lr_min + 0.5 * (self.lr_max - self.lr_min) * (
            1 + np.cos(np.pi * frac))
        trainer.set_lr(lr)
        self.epoch_in_cycle += 1

    def on_validation_end(self, trainer, val_loss):
        if self.epoch_in_cycle < self.T:
            return
        # cycle finished: restart
        self.epoch_in_cycle = 0
        self.T *= self.T_mult
        self.lr_max *= self.lr_factor
        if val_loss > self.best_cycle:
            self.failed_cycles += 1
            if self.failed_cycles > self.patience:
                trainer.stop = True
        else:
            self.best_cycle = val_loss
            self.failed_cycles = 0


class ExponentialDecayHook(Hook):
    """lr <- lr * gamma each epoch (reference hooks/scheduling.py:277-296)."""

    def __init__(self, gamma=0.96, min_lr=1e-6):
        self.gamma = gamma
        self.min_lr = min_lr

    def on_epoch_end(self, trainer):
        trainer.set_lr(max(trainer.get_lr() * self.gamma, self.min_lr))


class LRScheduleHook(Hook):
    """Set the LR from an arbitrary schedule callable
    (reference hooks/scheduling.py:162-208 wrapped a torch
    ``_LRScheduler``; the optax-idiomatic equivalent is a schedule
    ``count -> lr``, e.g. ``optax.cosine_decay_schedule``).  With
    ``each_step`` the count is ``trainer.step``, else ``trainer.epoch``."""

    def __init__(self, schedule, each_step=False):
        self.schedule = schedule
        self.each_step = each_step

    def on_epoch_begin(self, trainer):
        if not self.each_step:
            trainer.set_lr(float(self.schedule(trainer.epoch)))

    def on_batch_end(self, trainer, loss, batch=None):
        if self.each_step:
            trainer.set_lr(float(self.schedule(trainer.step)))


class UpdatePrioritiesHook(Hook):
    """Feed per-batch priorities back into a
    :class:`mdgrad_tpu.data.loader.PrioritizedSampler`
    (reference hooks/scheduling.py:299-310).  ``priority_fn(batch, loss)``
    returns one priority per example in the batch (default: the batch
    loss broadcast over its examples)."""

    def __init__(self, prioritized_sampler, priority_fn=None):
        self.sampler = prioritized_sampler
        self.priority_fn = priority_fn

    def on_batch_end(self, trainer, loss, batch=None):
        if batch is None or "_idx" not in batch:
            return
        idx = np.asarray(batch["_idx"])
        if self.priority_fn is not None:
            pri = np.asarray(self.priority_fn(batch, loss)).reshape(-1)
        else:
            pri = np.full(len(idx), float(loss))
        self.sampler.update_weights(idx, pri)


class TensorboardHook(Hook):
    """Scalar logging to TensorBoard event files
    (reference hooks/logging.py:192-290 via tensorboardX).  Uses
    ``torch.utils.tensorboard`` when available, else falls back to a
    JSONL scalar log in the same directory (zero extra deps)."""

    def __init__(self, log_path, every_n_epochs=1, log_train_loss=True,
                 log_validation_loss=True, log_learning_rate=True):
        os.makedirs(log_path, exist_ok=True)
        self.log_path = log_path
        self.every_n_epochs = every_n_epochs
        self.log_train_loss = log_train_loss
        self.log_validation_loss = log_validation_loss
        self.log_learning_rate = log_learning_rate
        try:
            from torch.utils.tensorboard import SummaryWriter
            self.writer = SummaryWriter(log_path)
            self._jsonl = None
        except Exception:
            self.writer = None
            self._jsonl = os.path.join(log_path, "scalars.jsonl")

    def _scalar(self, tag, value, step):
        if self.writer is not None:
            self.writer.add_scalar(tag, value, step)
        else:
            with open(self._jsonl, "a") as f:
                f.write(json.dumps(
                    {"tag": tag, "value": float(value), "step": step}) + "\n")

    def on_epoch_end(self, trainer):
        if trainer.epoch % self.every_n_epochs:
            return
        if self.log_train_loss:
            self._scalar("train/loss", trainer.last_train_loss,
                         trainer.epoch)
        if self.log_learning_rate:
            self._scalar("train/learning_rate", trainer.get_lr(),
                         trainer.epoch)

    def on_validation_end(self, trainer, val_loss):
        if self.log_validation_loss and \
                trainer.epoch % self.every_n_epochs == 0:
            self._scalar("train/val_loss", val_loss, trainer.epoch)

    def _close(self):
        if self.writer is not None:
            self.writer.close()

    def on_train_ends(self, trainer):
        self._close()

    def on_train_failed(self, trainer):
        self._close()


class PrintingHook(Hook):
    def __init__(self, every=1, log=print):
        self.every = every
        self.log = log

    def on_validation_end(self, trainer, val_loss):
        if trainer.epoch % self.every == 0:
            self.log(f"epoch {trainer.epoch} | train "
                     f"{trainer.last_train_loss:.6f} | val "
                     f"{val_loss:.6f} | lr {trainer.get_lr():.2e}")


class CSVHook(Hook):
    """Append per-epoch metrics to log.csv
    (reference hooks/logging.py:83-189)."""

    def __init__(self, log_path):
        self.path = os.path.join(log_path, "log.csv")
        os.makedirs(log_path, exist_ok=True)
        self.t0 = None

    def on_train_begin(self, trainer):
        self.t0 = time.time()
        if not os.path.exists(self.path):
            with open(self.path, "w", newline="") as f:
                csv.writer(f).writerow(
                    ["time", "epoch", "lr", "train_loss", "val_loss"])

    def on_validation_end(self, trainer, val_loss):
        with open(self.path, "a", newline="") as f:
            csv.writer(f).writerow(
                [time.time() - self.t0, trainer.epoch, trainer.get_lr(),
                 trainer.last_train_loss, val_loss])


# ---------------------------------------------------------------------------
# transfer learning (parity: nff/train/transfer.py)
# ---------------------------------------------------------------------------

def freeze_labels(params, frozen_prefixes):
    """optax.multi_transform labels: 'frozen' for any top-level key in
    ``frozen_prefixes``, else 'train'."""
    def label(path, _):
        top = getattr(path[0], "key", getattr(path[0], "name", ""))
        return "frozen" if str(top) in frozen_prefixes else "train"
    return jax.tree_util.tree_map_with_path(label, params)


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------

class Trainer:
    """Epoch/validation loop with hooks and rotating checkpoints.

    model_fn(params, batch) -> dict of predictions (matching loss keys).
    """

    def __init__(self, model_path, model_fn, params, loss_fn,
                 train_loader, val_loader, lr=1e-3, optimizer=None,
                 hooks=None, checkpoint_interval=1, keep_n_checkpoints=3,
                 frozen_prefixes=()):
        self.model_path = model_path
        self.model_fn = model_fn
        self.loss_fn = loss_fn
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.hooks = hooks or []
        self.checkpoint_interval = checkpoint_interval
        self.keep_n_checkpoints = keep_n_checkpoints

        base = optimizer or optax.inject_hyperparams(optax.adam)(
            learning_rate=lr)
        if frozen_prefixes:
            labels = freeze_labels(params, set(frozen_prefixes))
            base = optax.multi_transform(
                {"train": base, "frozen": optax.set_to_zero()}, labels)
            self._lr_path = ("inner_states", "train", "inner_state",
                             "hyperparams", "learning_rate")
        self.optimizer = base
        self.params = params
        self.opt_state = base.init(params)
        self.epoch = 0
        self.step = 0
        self.stop = False
        self.best_loss = np.inf
        self.last_train_loss = np.nan

        os.makedirs(model_path, exist_ok=True)
        if self._latest_checkpoint() is not None:
            self.restore_checkpoint()

        @jax.jit
        def train_step(params, opt_state, batch):
            def batch_loss(p):
                preds = self.model_fn(p, batch)
                return self.loss_fn(batch, preds)
            loss, grads = jax.value_and_grad(batch_loss)(params)
            updates, opt_state = self.optimizer.update(grads, opt_state,
                                                       params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def val_step(params, batch):
            return self.loss_fn(batch, self.model_fn(params, batch))

        self._train_step = train_step
        self._val_step = val_step

    # -- runtime LR (through inject_hyperparams) ------------------------------
    def _hyper(self):
        s = self.opt_state
        if hasattr(s, "inner_states"):  # multi_transform
            s = s.inner_states["train"].inner_state
        return s

    def get_lr(self):
        return float(self._hyper().hyperparams["learning_rate"])

    def set_lr(self, lr):
        self._hyper().hyperparams["learning_rate"] = jnp.asarray(lr)

    # -- checkpoints (parity: reference trainer.py:103-155) -------------------
    def _ckpt_files(self):
        return sorted(glob.glob(
            os.path.join(self.model_path, "checkpoint-*.pkl")),
            key=lambda p: int(p.split("-")[-1].split(".")[0]))

    def _latest_checkpoint(self):
        files = self._ckpt_files()
        return files[-1] if files else None

    def store_checkpoint(self):
        to_np = lambda t: jax.tree_util.tree_map(np.asarray, t)
        blob = {"epoch": self.epoch, "step": self.step,
                "best_loss": self.best_loss,
                "params": to_np(self.params),
                "opt_state": to_np(self.opt_state)}
        path = os.path.join(self.model_path,
                            f"checkpoint-{self.epoch}.pkl")
        with open(path, "wb") as f:
            pickle.dump(blob, f)
        for old in self._ckpt_files()[:-self.keep_n_checkpoints]:
            os.remove(old)

    def restore_checkpoint(self, path=None):
        path = path or self._latest_checkpoint()
        with open(path, "rb") as f:
            blob = pickle.load(f)
        self.epoch = blob["epoch"]
        self.step = blob["step"]
        self.best_loss = blob["best_loss"]
        self.params = blob["params"]
        self.opt_state = jax.tree_util.tree_map(
            lambda cur, new: new, self.opt_state, blob["opt_state"])

    def save_best(self):
        with open(os.path.join(self.model_path, "best_model.pkl"),
                  "wb") as f:
            pickle.dump(jax.tree_util.tree_map(np.asarray, self.params), f)

    # -- main loop (parity: reference trainer.py:157-243) ---------------------
    def train(self, n_epochs=None):
        for h in self.hooks:
            h.on_train_begin(self)
        try:
            while not self.stop:
                if n_epochs is not None and self.epoch >= n_epochs:
                    break
                for h in self.hooks:
                    h.on_epoch_begin(self)
                if self.stop:
                    break

                losses = []
                for batch in self.train_loader:
                    batch = {k: jnp.asarray(v) for k, v in batch.items()}
                    self.params, self.opt_state, loss = self._train_step(
                        self.params, self.opt_state, batch)
                    self.step += 1
                    losses.append(float(loss))
                    for h in self.hooks:
                        h.on_batch_end(self, float(loss), batch)
                    if self.stop:
                        break
                self.last_train_loss = float(np.mean(losses))

                val_loss = self.validate()
                for h in self.hooks:
                    h.on_validation_end(self, val_loss)
                if val_loss < self.best_loss:
                    self.best_loss = val_loss
                    self.save_best()

                self.epoch += 1
                if self.epoch % self.checkpoint_interval == 0:
                    self.store_checkpoint()
                for h in self.hooks:
                    h.on_epoch_end(self)
            self.store_checkpoint()
            for h in self.hooks:
                h.on_train_ends(self)
        except Exception:
            for h in self.hooks:
                h.on_train_failed(self)
            raise
        return self.params

    def validate(self):
        losses = []
        for batch in self.val_loader:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            losses.append(float(self._val_step(self.params, batch)))
        return float(np.mean(losses)) if losses else np.nan


def evaluate(model_fn, params, loader, metric_fns=None):
    """Collect predictions/targets over a loader and compute metrics
    (parity: reference nff/train/evaluate.py:7-54)."""
    all_preds, all_targs = {}, {}
    for batch in loader:
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        preds = model_fn(params, jbatch)
        for k, v in preds.items():
            if k in batch:
                all_preds.setdefault(k, []).append(np.asarray(v))
                all_targs.setdefault(k, []).append(np.asarray(batch[k]))
    out = {}
    for k in all_preds:
        p = np.concatenate([a.reshape(a.shape[0], -1)
                            for a in all_preds[k]])
        t = np.concatenate([a.reshape(a.shape[0], -1)
                            for a in all_targs[k]])
        out[k] = {"mae": mae(p, t), "rmse": rmse(p, t)}
    return out
