"""Smoke test for the supervised force-matching workload driver
(scripts/run_supervised.py): label generation from a ground-truth
trajectory, Trainer-stack training, validation-by-use MD."""

import json
import os
import sys

import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")
sys.path.insert(0, SCRIPTS)


def test_run_supervised_smoke(tmp_path, monkeypatch):
    import run_supervised

    logdir = str(tmp_path / "sup")
    monkeypatch.setattr(sys, "argv", [
        "run_supervised.py", "-logdir", logdir, "-size", "2",
        "-cutoff", "1.5", "-n_frames", "12", "-burnin", "1",
        "-frame_stride", "5", "-batch_size", "4", "-max_epochs", "3",
        "-val_sim", "3", "-n_atom_basis", "16", "-n_filters", "16",
        "-n_convolutions", "1"])
    result = run_supervised.main()

    assert result["n_frames"] == 12
    assert "energy_grad" in result["test_metrics"]
    import numpy as np
    assert np.isfinite(result["test_metrics"]["energy_grad"]["mae"])
    assert np.isfinite(result["rdf_mse_vs_truth"])
    # artifacts on disk
    for f in ("dataset.npz", "model.pkl", "best_model.pkl", "log.csv",
              "rdf_compare.csv", "result.json"):
        assert os.path.exists(os.path.join(logdir, f)), f
    with open(os.path.join(logdir, "result.json")) as fh:
        assert json.load(fh)["n_atoms"] == 32
