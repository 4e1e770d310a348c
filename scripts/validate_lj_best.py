#!/usr/bin/env python
"""Long-rollout validation of pair-potential fit candidates.

The per-epoch training loss is a noisy 120-step estimator (+-~0.05), so
best-epoch selection between close candidates is marginal.  This script
re-evaluates candidates with a LOW-noise protocol: per state,
equilibrate EQ_EPOCHS x tau steps under the candidate, then average the
RDF (and virial pressure / VACF where the run trained on them) over
SAMPLE_EPOCHS x tau steps of sampling, and compare against the targets
(including the ground-truth pressure).  The candidate with the lower
combined error is the defensible "recovered potential".

Config (state tags, box size, model widths, capacity_slack, vacf) is
read from the run's paramset.json, so the script serves any
fit_rdf_pair output dir.  Candidates may be pkl filenames under -run or
paths relative to it (e.g. ../../lj_multi_r3/0/best.pkl), plus the
literal 'pretrain' for the lr=0 Boltzmann-inversion control.

Writes <run>/../validation.json and prints a table.
"""

import ast
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mdgrad_tpu import thermo
from mdgrad_tpu.nn import PairMLP
from mdgrad_tpu import potentials as pot_zoo
from mdgrad_tpu.interface import PairPotentials, Stack
from mdgrad_tpu.md import NoseHooverChain, Simulation
from mdgrad_tpu.train.fit_rdf_pair import (get_observer, get_system,
                                           registry_T_kelvin)
from mdgrad_tpu.data.registry import pair_data_dict

EQ_EPOCHS, SAMPLE_EPOCHS = 10, 20  # -eq_epochs / -sample_epochs override


def load_cfg(run):
    with open(os.path.join(run, "paramset.json")) as f:
        raw = json.load(f)
    cfg = {}
    for k, v in raw.items():
        try:
            cfg[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            cfg[k] = v
    return cfg


def get_pretrain_params(cfg):
    """Re-run the exact fit config at lr=0 for 1 epoch: params never
    move, so results['params'] is the raw Boltzmann-inversion pretrain."""
    from mdgrad_tpu.train.fit_rdf_pair import fit_lj
    assignments = {"nbins": cfg["nbins"], "opt_freq": cfg["opt_freq"],
                   "lr": 0.0, "sigma": cfg["sigma"],
                   "gaussian_width": cfg["gaussian_width"],
                   "n_width": cfg["n_width"], "n_layers": cfg["n_layers"],
                   "nonlinear": cfg["nonlinear"], "grad_clip": 1.0,
                   "rdf_weight": 1.0, "vacf_weight": 0.0}
    sys_params = {"size": cfg["size"], "cutoff": cfg["cutoff"],
                  "t_range": cfg["t_range"], "n_epochs": 1, "n_sim": 1,
                  "data": list(cfg["data"]), "val": None,
                  "topology_update_freq": 1,
                  "pretrain_iters": cfg.get("pretrain_iters", 2000),
                  "burnin_epochs": 0, "frame_skip": 5,
                  "state_reset_every": 10, "train_vacf": "False"}
    out = fit_lj(assignments, sys_params, model_path=None,
                 log=lambda *a: None)
    return out["params"]


def evaluate(params, label, cfg, use_vacf, eq_epochs=EQ_EPOCHS,
             sample_epochs=SAMPLE_EPOCHS):
    """params: a fit param pytree, or the literal 'truth' to run the
    registry ground-truth potential under the SAME protocol (controls
    for thermostat/estimator mismatch vs the bundled target data)."""
    rng = np.random.default_rng(1)
    cutoff = cfg["cutoff"]
    tau = cfg["opt_freq"]
    truth = isinstance(params, str) and params == "truth"
    if truth:
        from mdgrad_tpu.train.fit_rdf_pair import resolve_target_pot
        r_grid = np.linspace(0.3, cutoff, 250)
    else:
        net = PairMLP(n_gauss=int(cutoff // cfg["gaussian_width"]),
                      r_start=0.0, r_end=cutoff, n_width=cfg["n_width"],
                      n_layers=cfg["n_layers"],
                      nonlinear=cfg["nonlinear"], res=False)
        prior = pot_zoo.LJFamily(epsilon=2.0, sigma=cfg["sigma"],
                                 rep_pow=6, attr_pow=3)
        # recovered-potential well depth (net + prior, tail-anchored)
        r_grid = np.linspace(0.3, cutoff, 250)
        u = (np.asarray(net(params["pairnn"],
                            jnp.asarray(r_grid)[:, None])).squeeze(-1)
             + np.asarray(prior(params["pair"],
                                jnp.asarray(r_grid)[:, None])).squeeze(-1))
        u = u - u[-1]
        depth, r_min = float(u.min()), float(r_grid[int(u.argmin())])
    slack = float(cfg.get("capacity_slack") or 2.5)

    rows = []
    for tag in cfg["data"]:
        entry = pair_data_dict[tag]
        system = get_system(tag, cfg["size"], pair_data_dict, rng=rng)
        if truth:
            tp = resolve_target_pot(entry["target_pot"])
            stack = Stack({"pair": PairPotentials(system, tp,
                                                  cutoff=cutoff)})
            params = {"pair": tp.init_params()}
            ut = np.asarray(tp(params["pair"],
                               jnp.asarray(r_grid)[:, None])).squeeze(-1)
            ut = ut - ut[-1]
            depth = float(ut.min())
            r_min = float(r_grid[int(ut.argmin())])
        else:
            stack = Stack({
                "pairnn": PairPotentials(system, net, cutoff=cutoff,
                                         mode="table",
                                         capacity_slack=slack),
                "pair": PairPotentials(system, prior, cutoff=cutoff),
            })
        integ = NoseHooverChain(stack, system,
                                T=registry_T_kelvin(entry), Q=50.0,
                                num_chains=5, adjoint=False)
        sim = Simulation(system, integ)
        sim.params = jax.device_put(params)
        x, g_t, robs, vacf_t, vobs, p_t = get_observer(
            system, tag, cfg["nbins"], cfg["t_range"],
            entry.get("start", 0.75), pair_data_dict,
            target_nsim=cfg.get("_target_nsim", 30),
            want_pressure=True, rng=rng)
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
        want_vacf = use_vacf and vacf_t is not None
        for _ in range(eq_epochs):
            sim.simulate(steps=tau, dt=dt, frequency=tau)
        gs, ps, vs = [], [], []
        for _ in range(sample_epochs):
            # frequency=tau records every step of the tau-step epoch:
            # the VACF needs consecutive velocities; the RDF averages
            # over the same frames
            traj = sim.simulate(steps=tau, dt=dt, frequency=tau)
            gs.append(np.asarray(rdf_frames(traj.q).mean(0)))
            if want_vacf:
                vs.append(np.asarray(vobs(traj.v)))
            aux = stack.aux_init(traj.q[-1])
            ps.append(float(p_fn(traj.q[-1], traj.v[-1], aux)))
        g_mean = np.mean(gs, axis=0)
        mse = float(((g_mean - np.asarray(g_t)) ** 2).mean())
        p_mean = float(np.mean(ps))
        row = {"tag": tag, "rdf_mse": mse, "P_sim": p_mean,
               "P_target": float(p_t) if p_t is not None else None,
               "P_err": (abs(p_mean - p_t)
                         if p_t is not None else None)}
        msg = (f"  {tag:16s} rdf_mse {mse:.5f}  P {p_mean:7.3f} "
               f"(target {p_t if p_t is not None else float('nan'):7.3f})")
        if want_vacf:
            v_mean = np.mean(vs, axis=0)
            t_range = cfg["t_range"]
            row["vacf_mse"] = float(
                ((v_mean - np.asarray(vacf_t)[:t_range]) ** 2).mean())
            msg += f"  vacf_mse {row['vacf_mse']:.5f}"
        rows.append(row)
        print(msg, flush=True)
    tot_mse = sum(r["rdf_mse"] for r in rows)
    tot_perr = sum(r["P_err"] for r in rows if r["P_err"] is not None)
    tot_vacf = sum(r.get("vacf_mse", 0.0) for r in rows)
    print(f"{label}: total rdf_mse {tot_mse:.5f}, total |dP| "
          f"{tot_perr:.3f}, total vacf_mse {tot_vacf:.5f}, "
          f"depth {depth:.4f} @ r={r_min:.3f}", flush=True)
    return {"label": label, "states": rows, "total_rdf_mse": tot_mse,
            "total_P_err": tot_perr, "total_vacf_mse": tot_vacf,
            "depth": depth, "r_min": r_min}


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("-run", default="results/lj_multi_r3/0",
                    help="fit output dir holding paramset.json + pkls")
    ap.add_argument("-candidates", nargs="+",
                    default=["best.pkl", "pretrain"],
                    help="pkl filenames/relative paths under -run, or "
                         "the literal 'pretrain' for the lr=0 BI control")
    ap.add_argument("-pressure_weight", type=float, default=0.05,
                    help="weight of |dP| in the combined score")
    ap.add_argument("-vacf_score_weight", type=float, default=None,
                    help="weight of vacf_mse in the combined score "
                         "(default: the run's vacf_weight)")
    ap.add_argument("-eq_epochs", type=int, default=EQ_EPOCHS)
    ap.add_argument("-sample_epochs", type=int, default=SAMPLE_EPOCHS)
    ap.add_argument("-target_nsim", type=int, default=30,
                    help="target-regeneration epochs; must be large "
                         "enough that 1/3 discarded equilibrates the "
                         "dense-cold states (see fit_rdf_pair."
                         "get_target_obs)")
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)

    cfg = load_cfg(args.run)
    cfg["_target_nsim"] = args.target_nsim
    use_vacf = str(cfg.get("train_vacf", "False")) == "True"
    vacf_w = (args.vacf_score_weight if args.vacf_score_weight is not None
              else float(cfg.get("vacf_weight", 0.0)))

    out, scores = {}, {}
    for cand in args.candidates:
        if cand == "truth":
            print("candidate: ground-truth target potential (protocol "
                  "control)", flush=True)
            params = "truth"
        elif cand == "pretrain":
            print("candidate: raw BI pretrain (lr=0 control)", flush=True)
            params = get_pretrain_params(cfg)
        else:
            with open(os.path.join(args.run, cand), "rb") as f:
                blob = pickle.load(f)
            sel = (f"selection loss {blob['loss']:.4f}"
                   if "loss" in blob else
                   f"engine {blob.get('engine', '?')}")
            print(f"candidate: {cand} (epoch {blob['epoch']}, {sel})",
                  flush=True)
            params = blob["params"]
        res = evaluate(params, cand, cfg, use_vacf,
                       eq_epochs=args.eq_epochs,
                       sample_epochs=args.sample_epochs)
        out[cand] = res
        scores[cand] = (res["total_rdf_mse"]
                        + args.pressure_weight * res["total_P_err"]
                        + vacf_w * res["total_vacf_mse"])
    # fit_rdf_pair runs live in <logdir>/0 -- write beside the logdir;
    # difftre runs write pkls at the logdir root -- keep it in-run
    vdir = (os.path.join(args.run, "..")
            if os.path.basename(os.path.normpath(args.run)) == "0"
            else args.run)
    with open(os.path.join(vdir, "validation.json"), "w") as f:
        json.dump(out, f, indent=2)
    for cand, s in sorted(scores.items(), key=lambda kv: kv[1]):
        print(f"combined (rdf + {args.pressure_weight}*|dP| + "
              f"{vacf_w}*vacf): {cand} = {s:.5f}", flush=True)
    print("winner:", min(scores, key=scores.get), flush=True)


if __name__ == "__main__":
    main()
