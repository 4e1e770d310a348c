#!/usr/bin/env python
"""Diagnose the size-8 a-Si anneal NaN: run the first few hundred steps
of the melt at fine granularity and print kinetic temperature, force
scale, bath momenta, and neighbor occupancy per chunk.

The full transfer script (si_transfer.py) dies with NaN + capacity
overflow inside the FIRST 40-step epoch even with MTK masses, hot-start
velocities, and capacity_slack 3.0 -- this instruments exactly that
window to see which quantity diverges first.
"""

import argparse
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
    p.add_argument("-capacity_slack", type=float, default=3.0)
    p.add_argument("-start_T", type=float, default=1500.0)
    p.add_argument("-nhc_tau", type=float, default=50.0)
    p.add_argument("-chunk", type=int, default=10)
    p.add_argument("-nchunks", type=int, default=30)
    p.add_argument("-hot_start", type=int, default=1)
    p.add_argument("-compute_dtype", type=str, default="float32")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from mdgrad_tpu import units, thermo
    from mdgrad_tpu.topology import aux_overflow
    from mdgrad_tpu.train.fit_rdf import build_fit
    from mdgrad_tpu.data.registry import exp_rdf_data_dict

    print("devices:", jax.devices(), flush=True)

    assignments = {
        "cutoff": 5.0, "epsilon": 0.05, "gaussian_width": 0.125,
        "n_atom_basis": "tiny", "n_filters": "low", "n_convolutions": 3,
        "nbins": 800, "rdf_backend": "pallas", "opt_freq": 40,
        "sigma": 2.0, "start_T": args.start_T, "anneal_freq": 2,
        "anneal_rate": 5.0, "lr": 0.0,
        "compute_dtype": args.compute_dtype,
    }
    sys_params = {
        "dt": 1.0, "n_epochs": 10, "n_sim": 20,
        "data": [args.data], "val": None, "size": args.size,
        "anneal_flag": "True", "pair_flag": False, "tpair_flag": False,
        "topology_update_freq": 1, "nbr_mode": args.nbr_mode,
        "capacity_slack": args.capacity_slack,
    }
    entry = exp_rdf_data_dict[args.data]
    time_unit = 1.0 if entry.get("reduced_units") else units.fs
    if args.nhc_tau > 0:
        sys_params["nhc_tau"] = args.nhc_tau * sys_params["dt"] * time_unit

    rng = np.random.default_rng(0)
    built = build_fit(assignments, sys_params,
                      registry=exp_rdf_data_dict, rng=rng)
    system = built["systems"][0]
    sim = built["sims"][0]
    n = system.get_number_of_atoms()
    masses = system.get_masses()
    print(f"{n} atoms; Q = {np.asarray(sim.integrator.Q)}", flush=True)

    with open(args.ckpt, "rb") as f:
        blob = pickle.load(f)
    sim.params = jax.device_put(blob["params"])

    dt = sys_params["dt"] * time_unit
    sim.integrator.update_T(args.start_T)
    if args.hot_start:
        system.set_temperature(args.start_T, rng=rng)

    import warnings
    warnings.simplefilter("always")

    for c in range(args.nchunks):
        traj = sim.simulate(steps=args.chunk, dt=dt, frequency=args.chunk)
        v = np.asarray(sim.state.v)
        q = np.asarray(sim.state.q)
        f = np.asarray(sim.state.f) if sim.state.f is not None else None
        pv = np.asarray(sim.state.pv)
        T_k = float(thermo.temperature(jnp.asarray(v),
                                       masses, dim=3)) / units.kB
        fmax = float(np.abs(f).max()) if f is not None else float("nan")
        ovf = bool(aux_overflow(sim.aux)) if sim.aux is not None else False
        print(f"chunk {c:3d} (step {(c + 1) * args.chunk:4d}): "
              f"T_kin {T_k:9.1f} K  max|f| {fmax:11.4g}  "
              f"max|v| {np.abs(v).max():9.4g}  pv {np.array2string(pv, precision=2)}  "
              f"overflow={ovf}  finite(q)={np.isfinite(q).all()}",
              flush=True)
        if not np.isfinite(q).all():
            bad = np.where(~np.isfinite(q).any(axis=-1) if q.ndim == 2
                           else ~np.isfinite(q))[0]
            print(f"  non-finite positions at atoms {bad[:20]}", flush=True)
            break


if __name__ == "__main__":
    main()
