#!/usr/bin/env python
"""a-Si size transfer: evaluate the 512-atom-trained SchNet potential in
a 4096-atom cell.

SchNet parameters are size-agnostic (per-edge filters + per-atom
readout), so the potential fit at size=4 (512 atoms, results/si_r2)
can drive MD in any cell.  This script loads that checkpoint, rebuilds
the fit stack at -size 8 (4096 atoms) on the O(N) cell-list edge path
(nbr_mode='cells' -- a config the reference's O(N^2)-memory torch
topology cannot run, torchmd/topology.py:30-73), replays the
melt-quench anneal (1500 K -> 100 K, reference fit_rdf_gnn.py:392-399)
as inference-only MD, and scores the 800-bin RDF against the
experimental a-Si target.  The larger box shrinks both the RDF
estimator variance and the finite-size error of the quench -- the same
mechanism that made the 4096-atom water fit the best water result
(results/water_4k_r3).
"""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-ckpt", type=str,
                   default="results/si_r2/0/fit-ckpt-5699.pkl")
    p.add_argument("-data", type=str, default="Si_2.293_100K")
    p.add_argument("-size", type=int, default=8)
    p.add_argument("-nbr_mode", type=str, default="cells")
    p.add_argument("-capacity_slack", type=float, default=3.0,
                   help="sized off the CRYSTAL neighbor count; the "
                        "1500 K melt densifies the first shell and "
                        "overflowed 2.0 (queue-19 run, NaN at epoch 0)")
    p.add_argument("-anneal_epochs", type=int, default=500)
    p.add_argument("-equil_epochs", type=int, default=60)
    p.add_argument("-sample_epochs", type=int, default=40)
    p.add_argument("-opt_freq", type=int, default=40)
    p.add_argument("-start_T", type=float, default=1500.0)
    p.add_argument("-anneal_rate", type=float, default=5.0)
    p.add_argument("-compute_dtype", type=str, default="float32")
    p.add_argument("-nhc_tau", type=float, default=50.0,
                   help="MTK thermostat time constant in units of dt")
    p.add_argument("-logdir", type=str, default="results/si_4k_r3")
    p.add_argument("--dry_run", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from mdgrad_tpu import units
    from mdgrad_tpu.topology import aux_overflow
    from mdgrad_tpu.train.fit_rdf import (build_fit, get_temp,
                                          registry_T_kelvin)
    from mdgrad_tpu.data.registry import exp_rdf_data_dict

    if args.dry_run:
        args.size, args.anneal_epochs = 2, 4
        args.equil_epochs, args.sample_epochs = 2, 2
        args.nbr_mode = "table"  # size-2 box < 3 cells of cutoff width

    print("devices:", jax.devices(), flush=True)
    os.makedirs(args.logdir, exist_ok=True)

    # identical model hyperparameters to the training run (si_r2
    # assignments.json) -- the checkpoint pytree must match the net
    assignments = {
        "cutoff": 5.0, "epsilon": 0.05, "gaussian_width": 0.125,
        "n_atom_basis": "tiny", "n_filters": "low", "n_convolutions": 3,
        "nbins": 800, "rdf_backend": "pallas", "opt_freq": args.opt_freq,
        "sigma": 2.0, "start_T": args.start_T, "anneal_freq": 2,
        "anneal_rate": args.anneal_rate, "lr": 0.0,
        "compute_dtype": args.compute_dtype,
    }
    sys_params = {
        "dt": 1.0, "n_epochs": args.anneal_epochs, "n_sim": 20,
        "data": [args.data], "val": None, "size": args.size,
        "anneal_flag": "True", "pair_flag": False, "tpair_flag": False,
        "topology_update_freq": 1, "nbr_mode": args.nbr_mode,
        "capacity_slack": args.capacity_slack,
    }
    if args.dry_run:
        assignments["nbins"] = 100

    rng = np.random.default_rng(0)
    entry = exp_rdf_data_dict[args.data]
    time_unit = 1.0 if entry.get("reduced_units") else units.fs
    # MTK chain masses: the reference's Q/N link masses cascade-diverge
    # in the 4096-atom melt transient (integrators.NoseHooverChain
    # docstring); tau = 50 dt keeps every link at its thermal scale
    sys_params["nhc_tau"] = args.nhc_tau * sys_params["dt"] * time_unit
    built = build_fit(assignments, sys_params,
                      registry=exp_rdf_data_dict, rng=rng)
    system = built["systems"][0]
    sim = built["sims"][0]
    obs = built["observers"][0]
    g_obs = built["targets"][0]
    x = built["r_axes"][0]
    n_atoms = system.get_number_of_atoms()
    print(f"system: {n_atoms} atoms, cell {np.asarray(system.get_cell())}",
          flush=True)

    with open(args.ckpt, "rb") as f:
        blob = pickle.load(f)
    sim.params = jax.device_put(blob["params"])
    print(f"loaded {args.ckpt} (epoch {blob.get('epoch')})", flush=True)

    entry = exp_rdf_data_dict[args.data]
    T_equil = registry_T_kelvin(entry)
    dt = sys_params["dt"] * (1.0 if entry.get("reduced_units")
                             else units.fs)
    integ = sim.integrator
    tau = args.opt_freq

    def check(tag, epoch):
        q = np.asarray(sim.state.q)
        if not np.isfinite(q).all():
            raise RuntimeError(f"NaN during {tag} at epoch {epoch}")
        if sim.aux is not None and aux_overflow(sim.aux):
            print(f"WARNING: neighbor overflow during {tag} epoch "
                  f"{epoch}", flush=True)

    # ---- melt-quench anneal (inference-only MD, frozen params) ----
    # hot start: velocities AT the melt temperature -- lattice-cold
    # velocities against a 1500 K thermostat target charge the bath
    # through a 15x temperature jolt
    system.set_temperature(args.start_T, rng=rng)

    for epoch in range(args.anneal_epochs):
        if epoch % assignments["anneal_freq"] == 0:
            integ.update_T(get_temp(args.start_T, T_equil,
                                    args.anneal_epochs, epoch,
                                    args.anneal_rate))
        sim.simulate(steps=tau, dt=dt, frequency=tau)
        check("anneal", epoch)
        if epoch % 50 == 0:
            print(f"anneal epoch {epoch}", flush=True)

    # ---- equilibrate at the target temperature ----
    integ.update_T(T_equil)
    for epoch in range(args.equil_epochs):
        sim.simulate(steps=tau, dt=dt, frequency=tau)
        check("equil", epoch)

    # ---- sample the 800-bin RDF (driver inference protocol) ----
    gs = []
    for epoch in range(args.sample_epochs):
        traj = sim.simulate(steps=100, dt=dt, frequency=25)
        check("sample", epoch)
        for f in np.asarray(traj.q):
            gs.append(np.asarray(obs(jnp.asarray(f))[2]))
    g_sim = np.mean(gs, axis=0)
    mse = float(((np.asarray(g_obs) - g_sim) ** 2).mean())
    print(f"{args.data} @ {n_atoms} atoms: {assignments['nbins']}-bin "
          f"inference MSE {mse:.5f} ({len(gs)} frames)", flush=True)

    np.savetxt(os.path.join(args.logdir, f"rdf_{args.data}_{n_atoms}.csv"),
               np.vstack([x, g_sim]), delimiter=",")
    with open(os.path.join(args.logdir, "transfer.json"), "w") as f:
        json.dump({"ckpt": args.ckpt, "n_atoms": int(n_atoms),
                   "size": args.size, "nbr_mode": args.nbr_mode,
                   "anneal_epochs": args.anneal_epochs,
                   "equil_epochs": args.equil_epochs,
                   "sample_frames": len(gs), "mse": mse}, f, indent=2)
    from mdgrad_tpu.train.plots import plot_rdfs
    plot_rdfs(x, np.asarray(g_obs), g_sim,
              f"rdf_{args.data}_{n_atoms}", args.logdir, pname="transfer")


if __name__ == "__main__":
    main()
