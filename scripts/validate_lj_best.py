#!/usr/bin/env python
"""Long-rollout validation of the 5-state LJ + pressure fit's selected
potential (results/lj_multi_r3/0/best.pkl) against the raw
Boltzmann-inversion pretrain.

The per-epoch training loss is a noisy 120-step estimator (+-~0.05), so
best-epoch selection between close candidates is marginal.  This script
re-evaluates both candidates with a LOW-noise protocol: per state,
equilibrate 10 x 120 steps under the candidate, then average RDF and
virial pressure over 20 x 120 steps of sampling, and compare against
the targets (including the ground-truth pressure).  The candidate with
the lower combined error is the defensible "recovered potential".

Writes results/lj_multi_r3/validation.json and prints a table.
"""

import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mdgrad_tpu import units, thermo
from mdgrad_tpu.system import System
from mdgrad_tpu.nn import PairMLP
from mdgrad_tpu import potentials as pot_zoo
from mdgrad_tpu.interface import PairPotentials, Stack
from mdgrad_tpu.md import NoseHooverChain, Simulation
from mdgrad_tpu.train.fit_rdf_pair import (get_observer, get_system,
                                           registry_T_kelvin)
from mdgrad_tpu.data.registry import pair_data_dict

TAGS = ["lj_0.845_0.75", "lj_0.845_1.2", "lj_0.7_1", "lj_0.5_1.2",
        "lj_0.3_1.2"]
CUTOFF = 2.5
NBINS = 100
EQ_EPOCHS, SAMPLE_EPOCHS, TAU = 10, 20, 120


def get_pretrain_params():
    """Re-run the exact fit config at lr=0 for 1 epoch: params never
    move, so results['params'] is the raw 5-state BI pretrain."""
    from mdgrad_tpu.train.fit_rdf_pair import fit_lj
    assignments = {"nbins": NBINS, "opt_freq": TAU, "lr": 0.0,
                   "sigma": 0.9, "gaussian_width": 0.1, "n_width": 128,
                   "n_layers": 3, "nonlinear": "SELU", "grad_clip": 1.0,
                   "rdf_weight": 1.0, "vacf_weight": 0.0}
    sys_params = {"size": 5, "cutoff": CUTOFF, "t_range": 50,
                  "n_epochs": 1, "n_sim": 1, "data": TAGS, "val": None,
                  "topology_update_freq": 1, "pretrain_iters": 2000,
                  "burnin_epochs": 0, "frame_skip": 5,
                  "state_reset_every": 10, "train_vacf": "False"}
    out = fit_lj(assignments, sys_params, model_path=None,
                 log=lambda *a: None)
    return out["params"]


def evaluate(params, label):
    rng = np.random.default_rng(1)
    net = PairMLP(n_gauss=int(CUTOFF // 0.1), r_start=0.0, r_end=CUTOFF,
                  n_width=128, n_layers=3, nonlinear="SELU", res=False)
    prior = pot_zoo.LJFamily(epsilon=2.0, sigma=0.9, rep_pow=6,
                             attr_pow=3)
    rows = []
    for tag in TAGS:
        entry = pair_data_dict[tag]
        system = get_system(tag, 5, pair_data_dict, rng=rng)
        stack = Stack({
            "pairnn": PairPotentials(system, net, cutoff=CUTOFF,
                                     mode="table", capacity_slack=2.5),
            "pair": PairPotentials(system, prior, cutoff=CUTOFF),
        })
        integ = NoseHooverChain(stack, system,
                                T=registry_T_kelvin(entry), Q=50.0,
                                num_chains=5, adjoint=False)
        sim = Simulation(system, integ)
        sim.params = jax.device_put(params)
        x, g_t, robs, _, _, p_t = get_observer(
            system, tag, NBINS, 50, entry.get("start", 0.75),
            pair_data_dict, want_pressure=True, rng=rng)
        dt = entry.get("dt", 0.01)
        masses, cell = system.get_masses(), system.get_cell()
        # lax.map (NOT vmap) over frames: vmapping the smeared RDF
        # materializes a (frames, N, N, nbins) tensor (~12 GB at
        # 120x500x500x100) -- see CLAUDE.md rule 7
        rdf_frames = jax.jit(
            lambda qs: jax.lax.map(lambda q: robs(q)[2], qs))
        p_fn = jax.jit(lambda q, v, aux: thermo.pressure(
            stack, sim.params, q, stack.aux_update(q, aux), v, masses,
            cell))
        for _ in range(EQ_EPOCHS):
            sim.simulate(steps=TAU, dt=dt, frequency=TAU)
        gs, ps = [], []
        for _ in range(SAMPLE_EPOCHS):
            traj = sim.simulate(steps=TAU, dt=dt, frequency=TAU)
            g = rdf_frames(traj.q).mean(0)
            gs.append(np.asarray(g))
            aux = stack.aux_init(traj.q[-1])
            ps.append(float(p_fn(traj.q[-1], traj.v[-1], aux)))
        g_mean = np.mean(gs, axis=0)
        mse = float(((g_mean - np.asarray(g_t)) ** 2).mean())
        p_mean = float(np.mean(ps))
        rows.append({"tag": tag, "rdf_mse": mse, "P_sim": p_mean,
                     "P_target": float(p_t) if p_t is not None else None,
                     "P_err": (abs(p_mean - p_t)
                               if p_t is not None else None)})
        print(f"  {tag:16s} rdf_mse {mse:.5f}  P {p_mean:7.3f} "
              f"(target {p_t if p_t is not None else float('nan'):7.3f})",
              flush=True)
    tot_mse = sum(r["rdf_mse"] for r in rows)
    tot_perr = sum(r["P_err"] for r in rows if r["P_err"] is not None)
    print(f"{label}: total rdf_mse {tot_mse:.5f}, total |dP| "
          f"{tot_perr:.3f}", flush=True)
    return {"label": label, "states": rows, "total_rdf_mse": tot_mse,
            "total_P_err": tot_perr}


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("-run", default="results/lj_multi_r3/0",
                    help="fit output dir holding the candidate pkls")
    ap.add_argument("-candidates", nargs="+",
                    default=["best.pkl", "pretrain"],
                    help="pkl filenames under -run, or the literal "
                         "'pretrain' for the lr=0 BI control")
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)

    out, scores = {}, {}
    for cand in args.candidates:
        if cand == "pretrain":
            print("candidate: raw BI pretrain (lr=0 control)", flush=True)
            params = get_pretrain_params()
        else:
            with open(os.path.join(args.run, cand), "rb") as f:
                blob = pickle.load(f)
            print(f"candidate: {cand} (epoch {blob['epoch']}, "
                  f"selection loss {blob['loss']:.4f})", flush=True)
            params = blob["params"]
        res = evaluate(params, cand)
        out[cand] = res
        scores[cand] = res["total_rdf_mse"] + 0.05 * res["total_P_err"]
    with open(os.path.join(args.run, "..", "validation.json"), "w") as f:
        json.dump(out, f, indent=2)
    for cand, s in sorted(scores.items(), key=lambda kv: kv[1]):
        print(f"combined (rdf + 0.05*|dP|): {cand} = {s:.5f}", flush=True)
    print("winner:", min(scores, key=scores.get), flush=True)


if __name__ == "__main__":
    main()
