"""Supervised training stack: dataset, padded loader, trainer with hooks,
checkpoint/restore, SchNet learns a toy energy/force dataset."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from mdgrad_tpu.data.dataset import (Dataset, concatenate_dict,
                                     split_train_validation_test,
                                     remove_outliers)
from mdgrad_tpu.data.loader import DataLoader, pad_batch
from mdgrad_tpu.train.builders import (get_model, get_trainer, load_model,
                                       save_model)
from mdgrad_tpu.train.supervised import evaluate, build_mse_loss


def make_lj_dataset(n_geoms=24, n_atoms=8, seed=0):
    """Toy dataset: LJ dimer-cluster energies/forces (ground truth)."""
    rng = np.random.default_rng(seed)
    props = {"nxyz": [], "energy": [], "energy_grad": []}
    for _ in range(n_geoms):
        n = n_atoms + int(rng.integers(0, 3))  # variable sizes
        xyz = rng.uniform(0, 3.5, (n, 3))
        # push apart overlapping atoms
        for _ in range(20):
            d = xyz[:, None] - xyz[None, :]
            r = np.linalg.norm(d, axis=-1) + np.eye(n)
            if r.min() > 0.8:
                break
            i, j = np.unravel_index(np.argmin(r + np.eye(n) * 10),
                                    r.shape)
            xyz[i] += 0.3 * (xyz[i] - xyz[j])
        d = xyz[:, None] - xyz[None, :]
        r = np.linalg.norm(d, axis=-1) + np.eye(n) * 1e9
        u = (4 * ((1 / r) ** 12 - (1 / r) ** 6)).sum() / 2
        du = 4 * (-12 * r ** -13 + 6 * r ** -7)
        f = (du[..., None] * d / r[..., None]).sum(1)
        z = np.ones(n)
        props["nxyz"].append(
            np.concatenate([z[:, None], xyz], axis=1).astype(np.float32))
        props["energy"].append(np.float32(u))
        props["energy_grad"].append(f.astype(np.float32))  # +dU/dx
    return Dataset(props, units_name="kcal/mol")


def test_dataset_roundtrip(tmp_path):
    ds = make_lj_dataset(6)
    ds.generate_neighbor_list(3.0)
    path = os.path.join(str(tmp_path), "ds.npz")
    ds.save(path)
    ds2 = Dataset.load(path)
    assert len(ds2) == 6
    np.testing.assert_allclose(ds2.props["nxyz"][3], ds.props["nxyz"][3])
    assert ds2.units == "kcal/mol"


def test_unit_conversion():
    ds = make_lj_dataset(3)
    e0 = float(np.asarray(ds.props["energy"][0]))
    ds.to_units("atomic")
    e1 = float(np.asarray(ds.props["energy"][0]))
    assert abs(e1 - e0 / 627.509) < 1e-6
    ds.to_units("kcal/mol")
    assert abs(float(np.asarray(ds.props["energy"][0])) - e0) < 1e-4


def test_split_and_outliers():
    ds = make_lj_dataset(20)
    ds.props["energy"][0] = np.float32(1e9)  # outlier
    clean, ids = remove_outliers(ds, "energy", std_away=2.0)
    assert len(clean) < 20 and 0 not in ids
    tr, va, te = split_train_validation_test(clean, 0.25, 0.25)
    assert len(tr) + len(va) + len(te) == len(clean)


def test_pad_batch_shapes():
    ds = make_lj_dataset(5)
    ds.generate_neighbor_list(3.0)
    loader = DataLoader(ds, batch_size=3, shuffle=False)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["z"].shape == b["atom_mask"].shape
    assert b["nbr_idx"].shape[0] == 3
    # padded nbr entries point at n_max
    n_max = b["z"].shape[1]
    assert (b["nbr_idx"][~b["nbr_mask"]] == n_max).all()
    # incomplete final batch is weight-masked
    assert batches[1]["batch_weight"].sum() == 2


def test_schnet_trains_on_lj_data(tmp_path):
    ds = make_lj_dataset(24)
    ds.generate_neighbor_list(3.0)
    train, val, _ = split_train_validation_test(ds, 0.2, 0.0, seed=1)
    train_loader = DataLoader(train, batch_size=6, seed=1)
    val_loader = DataLoader(val, batch_size=6, shuffle=False)

    model = get_model({"n_atom_basis": 32, "n_filters": 32,
                       "n_gaussians": 16, "n_convolutions": 2,
                       "cutoff": 3.0}, "SchNet")
    params = model.init_params(jnp.ones(8, dtype=jnp.int32))
    trainer = get_trainer(model, params, train_loader, val_loader,
                          str(tmp_path), lr=3e-3, max_epochs=12,
                          patience=50, log=lambda *a: None)
    losses = []

    class Tracker:
        def on_train_begin(self, t): pass
        def on_epoch_begin(self, t): pass
        def on_batch_end(self, t, l, batch=None): pass
        def on_epoch_end(self, t): pass
        def on_train_ends(self, t): pass
        def on_train_failed(self, t): pass
        def on_validation_end(self, t, v): losses.append(v)

    trainer.hooks.append(Tracker())
    trained = trainer.train()
    assert losses[-1] < losses[0], losses
    assert os.path.exists(os.path.join(str(tmp_path), "best_model.pkl"))
    assert os.path.exists(os.path.join(str(tmp_path), "log.csv"))

    # evaluate returns metrics for both keys
    res = evaluate(model.batched_predict, trained, val_loader)
    assert "energy" in res and "energy_grad" in res
    assert np.isfinite(res["energy"]["mae"])


def test_checkpoint_restore(tmp_path):
    ds = make_lj_dataset(12)
    ds.generate_neighbor_list(3.0)
    loader = DataLoader(ds, batch_size=6, seed=1)
    model = get_model({"n_atom_basis": 16, "n_filters": 16,
                       "n_gaussians": 8, "n_convolutions": 1,
                       "cutoff": 3.0}, "SchNet")
    params = model.init_params(jnp.ones(8, dtype=jnp.int32))
    t1 = get_trainer(model, params, loader, loader, str(tmp_path),
                     max_epochs=2, log=lambda *a: None)
    t1.train()
    assert t1.epoch == 2
    # a new trainer at the same path resumes from the checkpoint
    t2 = get_trainer(model, params, loader, loader, str(tmp_path),
                     max_epochs=4, log=lambda *a: None)
    assert t2.epoch == 2
    t2.train()
    assert t2.epoch == 4


def test_save_load_model(tmp_path):
    model_params = {"n_atom_basis": 16, "n_filters": 16, "n_gaussians": 8,
                    "n_convolutions": 1, "cutoff": 3.0}
    model = get_model(model_params, "SchNet")
    params = model.init_params(jnp.ones(4, dtype=jnp.int32))
    path = os.path.join(str(tmp_path), "model.pkl")
    save_model(path, "SchNet", model_params, params)
    model2, params2 = load_model(path)
    assert model2.cutoff == 3.0
    import jax
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params2)


def test_get_model_validation():
    with pytest.raises(ValueError):
        get_model({}, "NotAModel")
    with pytest.raises(TypeError):
        get_model({"n_atom_basis": "wrong", "n_filters": 16,
                   "n_gaussians": 8, "n_convolutions": 1, "cutoff": 3.0},
                  "SchNet")


def test_warm_restart_hook_cosine_cycle(tmp_path):
    from mdgrad_tpu.train.supervised import WarmRestartHook

    class FakeTrainer:
        def __init__(self):
            self.lr = 1e-3
            self.stop = False
        def get_lr(self):
            return self.lr
        def set_lr(self, v):
            self.lr = float(v)

    t = FakeTrainer()
    h = WarmRestartHook(T0=4, T_mult=2, lr_min=1e-6)
    lrs = []
    for _ in range(4):
        h.on_epoch_begin(t)
        lrs.append(t.lr)
    # cosine: starts at lr_max, decays toward lr_min
    assert lrs[0] == pytest.approx(1e-3)
    assert lrs[-1] < lrs[0]
    h.on_validation_end(t, 1.0)
    assert h.T == 8 and h.epoch_in_cycle == 0  # restarted, period doubled
    h.on_epoch_begin(t)
    assert t.lr == pytest.approx(1e-3)  # back to lr_max


def test_sparse_roundtrip():
    from mdgrad_tpu.data.sparse import sparsify_tensor, densify
    a = np.zeros((6, 6), dtype=np.float32)
    a[1, 2] = 3.0
    a[4, 0] = -1.0
    sp = sparsify_tensor(a)
    assert sp.nse == 2
    np.testing.assert_allclose(np.asarray(densify(sp)), a)


def test_crystals_dict_path():
    from mdgrad_tpu.data.crystals import dict_to_nxyz, get_crystal_graph
    from mdgrad_tpu.lattice import face_centered_cubic
    xyz, cell = face_centered_cubic(2, 1.679)
    nxyz = dict_to_nxyz({"numbers": np.full(len(xyz), 18),
                         "positions": xyz})
    assert nxyz.shape == (32, 4)
    nbrs = get_crystal_graph(nxyz, cell, 1.6)
    assert int(nbrs.count) > 0


def test_edge_update_module():
    import jax
    import jax.numpy as jnp
    from mdgrad_tpu.nn.models import SchNetEdgeUpdate
    mod = SchNetEdgeUpdate(n_atom_basis=8)
    r = jnp.ones((5, 8))
    idx = jnp.asarray([[0, 1], [2, 3], [5, 5]], dtype=jnp.int32)
    mask = jnp.asarray([True, True, False])
    p = mod.init(jax.random.PRNGKey(0), r, idx, mask)
    e = mod.apply(p, r, idx, mask)
    assert e.shape == (3, 1)
    assert float(e[2, 0]) == 0.0  # padded edge masked


def test_hessian_utilities():
    import jax.numpy as jnp
    from mdgrad_tpu.nn.tensorgrad import (compute_hess,
                                          vibrational_frequencies)
    # 1D harmonic dimer: U = 0.5 k (x1 - x0 - r0)^2
    k = 4.0
    def u(x):
        return 0.5 * k * (x[1, 0] - x[0, 0] - 1.0) ** 2
    x0 = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0]])
    h = compute_hess(u, x0)
    freqs = vibrational_frequencies(h, np.ones(2))
    # one mode at sqrt(2k/m) (relative coordinate), rest zero
    np.testing.assert_allclose(float(freqs.max()), np.sqrt(2 * k),
                               rtol=1e-5)


def test_lr_schedule_hook():
    from mdgrad_tpu.train.supervised import LRScheduleHook

    class FakeTrainer:
        def __init__(self):
            self.lr, self.epoch, self.step, self.stop = 1.0, 0, 0, False
        def get_lr(self):
            return self.lr
        def set_lr(self, v):
            self.lr = float(v)

    t = FakeTrainer()
    h = LRScheduleHook(lambda e: 0.1 * 0.5 ** e)
    for e in range(3):
        t.epoch = e
        h.on_epoch_begin(t)
    assert t.lr == pytest.approx(0.1 * 0.25)
    hs = LRScheduleHook(lambda s: 1.0 / (1 + s), each_step=True)
    t.step = 9
    hs.on_batch_end(t, 0.0)
    assert t.lr == pytest.approx(0.1)


def test_prioritized_sampler_and_hook():
    from mdgrad_tpu.data.loader import PrioritizedSampler
    from mdgrad_tpu.train.supervised import UpdatePrioritiesHook

    smp = PrioritizedSampler(10, seed=0)
    hook = UpdatePrioritiesHook(smp)
    batch = {"_idx": np.array([3, 4])}
    hook.on_batch_end(None, 100.0, batch)
    assert smp.weights[3] == 100.0 and smp.weights[4] == 100.0
    draws = smp.sample(2000)
    frac = np.isin(draws, [3, 4]).mean()
    assert frac > 0.9  # priority examples dominate sampling

    # custom priority_fn path
    hook2 = UpdatePrioritiesHook(smp, lambda b, l: np.array([1.0, 2.0]))
    hook2.on_batch_end(None, 0.0, batch)
    assert smp.weights[4] == 2.0


def test_tensorboard_hook_writes_scalars(tmp_path):
    from mdgrad_tpu.train.supervised import TensorboardHook

    class FakeTrainer:
        epoch = 2
        last_train_loss = 0.5
        def get_lr(self):
            return 1e-3

    h = TensorboardHook(str(tmp_path))
    t = FakeTrainer()
    h.on_epoch_end(t)
    h.on_validation_end(t, 0.25)
    h.on_train_ends(t)
    files = os.listdir(tmp_path)
    assert files, "no tensorboard/jsonl output written"


def test_loader_with_sampler_carries_idx():
    from mdgrad_tpu.data.loader import PrioritizedSampler
    props = {"nxyz": [np.hstack([np.full((4, 1), 3.0),
                                 np.random.default_rng(i).uniform(0, 5, (4, 3))])
                      for i in range(6)],
             "energy": [float(i) for i in range(6)]}
    ds = Dataset(props)
    smp = PrioritizedSampler(len(ds), seed=1)
    smp.update_weights([5], [1e6])
    dl = DataLoader(ds, batch_size=4, sampler=smp)
    batches = list(dl)
    idx = np.concatenate([b["_idx"] for b in batches])
    assert (idx == 5).mean() > 0.9
