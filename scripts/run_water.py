#!/usr/bin/env python
"""Water O-O RDF fitting runner (the north-star workload).

Parity target: /root/reference/scripts/run_water.py -- GNN assignments
(the "low" SchNet config, run_water.py:38-46 commented block) or pair-MLP
assignments (run_water.py:55-56), sys_params with size=4 diamond init and
dt=0.5 fs (run_water.py:58-70).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-logdir", type=str, default="outputs/water")
    p.add_argument("-data", type=str, nargs="+",
                   default=["H20_298K_redd"])
    p.add_argument("-val", type=str, nargs="+", default=None)
    p.add_argument("-nepochs", type=int, default=700)
    p.add_argument("-nsim", type=int, default=20)
    p.add_argument("-nruns", type=int, default=1)
    p.add_argument("--pair", action="store_true")
    p.add_argument("--tpair", action="store_true")
    p.add_argument("--angle", action="store_true",
                   help="add the water angle-distribution target "
                        "(angle_data_dict, reference data.py:33-46,1007) "
                        "as a second loss head")
    p.add_argument("-angle_cutoff", type=float, default=3.7,
                   help="O-O-O angle cutoff (2.7 or 3.7 select the "
                        "deepcg target files)")
    p.add_argument("-angle_weight", type=float, default=1.0)
    p.add_argument("--dry_run", action="store_true")
    p.add_argument("-compute_dtype", type=str, default="float32",
                   help="SchNet filter-net dtype (float32 | bf16 | "
                        "mixed)")
    p.add_argument("-rdf_backend", type=str, default="xla",
                   help="'pallas' streams the soft histogram (O(tile) "
                        "memory; the fast path for high-nbins pair "
                        "losses, e.g. tpair's 400 bins)")
    p.add_argument("-frame_skip", type=int, default=20)
    p.add_argument("-capacity_slack", type=float, default=1.6,
                   help="neighbor-table k_max headroom; 1.25 is +19%% "
                        "steps/s, watch for overflow warnings")
    p.add_argument("-size", type=int, default=4,
                   help="diamond supercell size (size^3 * 8 sites; "
                        "4 -> 512, 8 -> 4096)")
    p.add_argument("-mts", type=int, default=0,
                   help="r-RESPA inner steps per outer step (0/1 = "
                        "single-rate): the SchNet force is evaluated "
                        "once per OUTER step (dt*k), the prior every "
                        "dt -- same simulated window per epoch")
    p.add_argument("-Q", type=float, default=None,
                   help="NHC bath mass; default scales 50*(N/512) "
                        "(reference-convention masses shrink as Q/N)")
    p.add_argument("-nhc_tau", type=float, default=None,
                   help="MTK thermostat time constant in fs (overrides "
                        "-Q; canonical N-invariant chain masses)")
    p.add_argument("-lr_override", type=float, default=None,
                   help="learning-rate override (0 freezes training: "
                        "pure-MD stability probe)")
    p.add_argument("-prior_mode", type=str, default="auto",
                   help="prior PairPotentials mode (dense|sparse|table|"
                        "auto); auto flips dense->sparse at N^2 > 2^20")
    p.add_argument("-dt_override", type=float, default=None,
                   help="base/inner time step in fs (default 0.5, the "
                        "reference run_water.py:59 convention); with "
                        "-mts k the OUTER step is k x this")
    p.add_argument("-overflow_policy", type=str, default="warn",
                   help="neighbor-capacity overflow handling: 'warn', "
                        "'skip' (drop the epoch's update), or 'regrow' "
                        "(grow capacity, restore the epoch entry state, "
                        "continue -- survives learned densification)")
    p.add_argument("-regrow_factor", type=float, default=1.5)
    p.add_argument("-init_pkl", type=str, default=None,
                   help="params-only warm start: graft the nn subtree "
                        "from a saved fit checkpoint / best.pkl")
    p.add_argument("-nbr_mode", type=str, default="table",
                   help="GNN edge builder: 'table' (dense O(N^2) "
                        "top_k) or 'cells' (O(N) cell list -- the "
                        ">=4k-atom path, BENCH.md large-N table)")
    p.add_argument("--share_prior_aux", action="store_true",
                   help="prior rides the GNN's neighbor table "
                        "(Stack share_aux) -- removes the prior's own "
                        "O(N^2) topology rebuild from every refresh")
    p.add_argument("-gnn_skin", type=float, default=0.0,
                   help="Verlet skin on the GNN edge build; pair with "
                        "-update_freq so no atom moves > skin/2 "
                        "between rebuilds")
    p.add_argument("-update_freq", type=int, default=1,
                   help="topology refresh cadence (steps)")
    p.add_argument("-adjoint", type=int, default=1,
                   help="1 = trajectory-replay adjoint (O(1) memory); "
                        "0 = direct backprop through the scan (faster "
                        "when (N, tau) activations fit in HBM)")
    args = p.parse_args()

    if args.pair or args.tpair:
        # pair-MLP best params (reference run_water.py:55-56)
        assignments = {
            "cutoff": 6.0, "epsilon": 1.8245160642515632,
            "gaussian_width": 0.15,
            "lr": 0.0006548601438181719, "mse_weight": 0.345,
            "n_layers": 3, "n_width": 115, "nbins": 400,
            "nonlinear": "ELU", "opt_freq": 192, "power": 12,
            "sigma": 1.68191635809129,
        }
    else:
        # GNN best params (reference run_water.py:32-46)
        assignments = {
            "cutoff": 6.0, "epsilon": 0.010637550996566496,
            "gaussian_width": 0.195, "lr": 0.0001839,
            "mse_weight": 3.2, "n_atom_basis": "low",
            "n_filters": "low", "n_convolutions": 2,
            "nbins": 109, "opt_freq": 52, "sigma": 2.61227614490785,
        }
    sys_params = {
        "dt": args.dt_override or 0.5,
        "n_epochs": args.nepochs, "n_sim": args.nsim,
        "data": args.data, "val": args.val, "size": args.size,
        "anneal_flag": "False", "pair_flag": args.pair,
        "tpair_flag": args.tpair,
        "topology_update_freq": args.update_freq,
        "adjoint": bool(args.adjoint),
        "share_prior_aux": args.share_prior_aux,
        "gnn_skin": args.gnn_skin,
        "capacity_slack": args.capacity_slack,
        "nbr_mode": args.nbr_mode,
        "mts_inner": args.mts,
        "frame_skip": args.frame_skip,
        "overflow_policy": args.overflow_policy,
        "regrow_factor": args.regrow_factor,
        "prior_mode": args.prior_mode,
        "init_pkl": args.init_pkl,
    }
    if args.lr_override is not None:
        assignments["lr"] = args.lr_override
    if args.Q is not None:
        sys_params["Q"] = args.Q
    if args.nhc_tau is not None:
        from mdgrad_tpu import units as _u
        sys_params["nhc_tau"] = args.nhc_tau * _u.fs
    assignments["rdf_backend"] = args.rdf_backend
    if args.angle:
        assignments.update(angle_weight=args.angle_weight,
                           angle_cutoff=args.angle_cutoff,
                           angle_nbins=64, angle_start=0.5)
        sys_params.update(angle_flag=True, angle_k_max=24)

    if args.dry_run:
        assignments["opt_freq"] = 25
        sys_params.update(n_epochs=2, n_sim=1, size=2, frame_skip=5,
                          test_nbins=100, pretrain_iters=50)

    if not (args.pair or args.tpair):
        assignments["compute_dtype"] = args.compute_dtype

    from mdgrad_tpu.train.fit_rdf import fit_rdf
    for i in range(args.nruns):
        out = fit_rdf(assignments, sys_params,
                      model_path=os.path.join(args.logdir, str(i)))
        print("objective:", out["objective"])


if __name__ == "__main__":
    main()
