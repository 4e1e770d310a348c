"""Benchmark: water-SchNet NHC differentiable-MD steps/sec on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N}

Workload = the north-star config (BASELINE.json): 512-site diamond lattice
at water O-O density, SchNet(128 basis, 128 filters, 40 gaussians, 2 convs,
cutoff 6.0 -- run_water.py's "low" GNN config) + ExcludedVolume prior,
Nose-Hoover chain (Q=50, 5 chains), dt = 0.5 fs, topology refresh every
step.  Measured quantity: forward + backward (trajectory-adjoint) steps/sec
through a tau=52-step epoch ending in an RDF loss -- i.e. *training*
steps/sec for the water RDF fit.

vs_baseline: ratio against the ROOFLINE-BOUNDED reference GPU -- the
most generous 50 steps/s the reference's per-step kernel-launch floor
admits (BENCH.md "Why >=10x is safe"; the reference never published GPU
numbers and cannot run here).  The measured algorithm-equivalent CPU
ratio is emitted separately as vs_cpu_thread
(benchmarks/baseline_torch.json, regenerate with
benchmarks/torch_reference_baseline.py).

Also emits FLOP accounting (XLA cost analysis of the compiled epoch):
achieved TFLOP/s and MFU vs the v5e bf16 peak (197 TFLOP/s).
"""

import json
import os
import sys
import time

import numpy as np


def build():
    import jax.numpy as jnp
    from mdgrad_tpu.system import System
    from mdgrad_tpu.nn import SchNet
    from mdgrad_tpu import potentials, units
    from mdgrad_tpu.interface import GNNPotentials, PairPotentials, Stack
    from mdgrad_tpu.md import NoseHooverChain, Simulation
    from mdgrad_tpu.observables import rdf as rdf_obs
    from mdgrad_tpu.data.registry import get_unit_len

    L = get_unit_len(0.99749, 18.01528, 8)
    system = System.from_lattice("diamond", 4, L, symbol="O")  # 512 sites
    system.masses = np.full(512, 18.01528)
    system.set_temperature(298.0, rng=np.random.default_rng(0))

    # bf16 filter network: fit-validated (water 800-bin inference MSE
    # 0.0190 bf16 vs 0.0199 f32, results/water_r2_*) -- this IS the
    # training configuration, not a benchmark special
    gnn = SchNet({"n_atom_basis": 128, "n_filters": 128, "n_gaussians": 40,
                  "n_convolutions": 2, "cutoff": 6.0,
                  "compute_dtype": "bf16"})
    # capacity_slack=1.25 (k_max 40 vs 48): every conv tensor is
    # (N, K, ...) so the tighter K removes pure masked-padding work at
    # identical physics -- zero neighbor overflow across the bench epoch
    # (bench_backward.py, identical loss to slack 1.6) and across a full
    # 150-epoch water fit (results/water_slim_r3)
    stack = Stack({
        "nn": GNNPotentials(system, gnn, cutoff=6.0, capacity_slack=1.25),
        "prior": PairPotentials(system, potentials.ExcludedVolume(
            sigma=2.6, epsilon=0.01, power=12), cutoff=6.0, mode="dense"),
    })
    integ = NoseHooverChain(stack, system, T=298.0, Q=50.0, num_chains=5,
                            adjoint=True)
    sim = Simulation(system, integ)
    obs = rdf_obs(system, nbins=109, r_range=(1.8, 7.5))
    return system, sim, integ, obs


def main():
    import jax
    import jax.numpy as jnp

    tau = 52                       # reference opt_freq (run_water.py:45)
    dt = 0.5 * 0.09822694788464063  # 0.5 fs
    system, sim, integ, obs = build()
    ode = sim.epoch_fn(dt, tau)
    state, aux = sim.initial_state()
    ctrl = integ.default_ctrl()
    g_target = jnp.ones(109)

    def loss_fn(params):
        traj, _ = ode(params, state, aux, ctrl)
        _, _, g = obs(traj.q[::10])
        return ((g - g_target) ** 2).mean()

    vg = jax.jit(jax.value_and_grad(loss_fn))

    # warmup/compile
    t_c = time.perf_counter()
    lowered = vg.lower(sim.params)
    compiled = lowered.compile()
    loss, grads = compiled(sim.params)
    jax.block_until_ready(loss)
    print(f"# compile+first-run: {time.perf_counter()-t_c:.1f}s",
          file=sys.stderr)

    n_rep = 5
    t0 = time.perf_counter()
    for _ in range(n_rep):
        loss, grads = compiled(sim.params)
    jax.block_until_ready(loss)
    elapsed = time.perf_counter() - t0
    steps_per_sec = n_rep * (tau - 1) / elapsed

    # FLOP accounting: XLA's own cost model for the compiled fwd+bwd
    # epoch (VERDICT r2 item 2 -- put an MFU number on the board)
    tflops = mfu = None
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops_per_call = float(ca.get("flops", 0.0))
        if flops_per_call > 0:
            tflops = flops_per_call / (elapsed / n_rep) / 1e12
            V5E_BF16_PEAK = 197.0  # TFLOP/s
            mfu = 100.0 * tflops / V5E_BF16_PEAK
            print(f"# cost_analysis: {flops_per_call/1e9:.2f} GFLOP/epoch"
                  f" -> {tflops:.2f} TFLOP/s achieved "
                  f"({mfu:.1f}% of v5e bf16 peak)", file=sys.stderr)
        # bandwidth roofline: low MFU is expected iff the program is
        # HBM-bound -- compare XLA's bytes-accessed against the v5e
        # HBM feed at the measured wall time
        bytes_per_call = float(ca.get("bytes accessed", 0.0))
        if bytes_per_call > 0:
            V5E_HBM_GBS = 819.0  # GB/s
            hbm_floor = bytes_per_call / (V5E_HBM_GBS * 1e9)
            frac = 100.0 * hbm_floor / (elapsed / n_rep)
            print(f"# bytes accessed: {bytes_per_call/1e9:.2f} GB/epoch"
                  f" -> HBM-roofline floor {hbm_floor*1e3:.1f} ms vs"
                  f" measured {elapsed/n_rep*1e3:.1f} ms"
                  f" ({frac:.0f}% of wall is the memory floor)",
                  file=sys.stderr)
    except Exception as e:  # pragma: no cover - cost model optional
        print(f"# cost_analysis unavailable: {e}", file=sys.stderr)

    # secondary: MTS (r-RESPA) k=2 -- the validated fast training config
    # (results/water_mts_r3: 800-bin MSE 0.0040); GNN at 1.0 fs outer
    # steps, prior at 0.5 fs inner.  Reported as dt=0.5fs-equivalent
    # steps/s (= simulated fs/s / 0.5) on the same 26-fs epoch.
    mts_equiv = None
    try:
        from mdgrad_tpu.md import MTSNoseHooverChain
        system2, sim2, integ2, obs2 = build()
        integ_mts = MTSNoseHooverChain(
            integ2.model, system2, T=298.0, Q=50.0, num_chains=5,
            adjoint=True, fast_keys=("prior",), n_inner=2)
        from mdgrad_tpu.md import Simulation as _Sim
        sim_mts = _Sim(system2, integ_mts)
        tau2 = tau // 2
        ode2 = sim_mts.epoch_fn(2 * dt, tau2)
        state2, aux2 = sim_mts.initial_state()
        ctrl2 = integ_mts.default_ctrl()

        def loss_fn2(params):
            traj, _ = ode2(params, state2, aux2, ctrl2)
            _, _, g = obs2(traj.q[::5])
            return ((g - g_target) ** 2).mean()

        vg2 = jax.jit(jax.value_and_grad(loss_fn2))
        l2, _ = vg2(sim_mts.params)
        jax.block_until_ready(l2)
        t0 = time.perf_counter()
        for _ in range(n_rep):
            l2, _ = vg2(sim_mts.params)
        jax.block_until_ready(l2)
        el2 = (time.perf_counter() - t0) / n_rep
        mts_equiv = (tau2 - 1) * 2 / el2  # dt=0.5fs-equivalent steps/s
        print(f"# MTS k=2: {(tau2-1)*1.0/el2:.1f} fs/s -> "
              f"{mts_equiv:.1f} equiv steps/s", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"# MTS secondary bench skipped: {e}", file=sys.stderr)

    # second official metric AT SCALE (VERDICT r3 weak #6): the 4096-atom
    # cells-path fit epoch -- the O(N) regime the reference's dense
    # O(N^2) torch topology cannot enter (topology.py:30-73 is the foil;
    # results/water_4k_r3 is the 0.00137-MSE fit this config trained).
    # Same protocol as the headline: fwd+bwd through a tau=52 epoch
    # ending in the (Pallas-streamed) RDF loss.
    n4k = {}
    try:
        from mdgrad_tpu.system import System
        from mdgrad_tpu.nn import SchNet
        from mdgrad_tpu import potentials
        from mdgrad_tpu.interface import (GNNPotentials, PairPotentials,
                                          Stack)
        from mdgrad_tpu.md import NoseHooverChain, Simulation as _Sim
        from mdgrad_tpu.observables import rdf as rdf_obs
        from mdgrad_tpu.data.registry import get_unit_len

        N4 = 8 ** 3 * 8
        L = get_unit_len(0.99749, 18.01528, 8)
        sys4 = System.from_lattice("diamond", 8, L, symbol="O")
        sys4.masses = np.full(N4, 18.01528)
        sys4.set_temperature(298.0, rng=np.random.default_rng(0))
        gnn4 = SchNet({"n_atom_basis": 128, "n_filters": 128,
                       "n_gaussians": 40, "n_convolutions": 2,
                       "cutoff": 6.0, "compute_dtype": "bf16"})
        # share_aux: the prior rides the GNN's (N, K) cells-built table
        # instead of rebuilding its own O(N^2) sparse neighbor list every
        # step -- 10.0 s -> 2.03 s/epoch (4.9x) at identical loss/grad
        # (bench_4k_budget2.log: loss 3.571460 vs 3.571458, |g|1 631.198
        # vs 631.197) and fit-validated by the 300-epoch 4k run
        # (results/water_4k_share_r5).  This is the production 4k config
        # (run_water.py --share_prior_aux).
        stack4 = Stack({
            "nn": GNNPotentials(sys4, gnn4, cutoff=6.0, nbr_mode="cells",
                                capacity_slack=1.6),
            "prior": PairPotentials(sys4, potentials.ExcludedVolume(
                sigma=2.6, epsilon=0.01, power=12), cutoff=6.0,
                mode="table"),
        }, share_aux={"prior": "nn"})
        integ4 = NoseHooverChain(stack4, sys4, T=298.0, Q=50.0,
                                 num_chains=5, adjoint=True)
        sim4 = _Sim(sys4, integ4)
        obs4 = rdf_obs(sys4, nbins=109, r_range=(1.8, 7.5),
                       backend="pallas")
        ode4 = sim4.epoch_fn(dt, tau)
        state4, aux4 = sim4.initial_state()
        ctrl4 = integ4.default_ctrl()

        def loss_fn4(params):
            traj, _ = ode4(params, state4, aux4, ctrl4)
            _, _, g = obs4(traj.q)
            return ((g - g_target) ** 2).mean()

        vg4 = jax.jit(jax.value_and_grad(loss_fn4))
        lowered4 = vg4.lower(sim4.params)
        compiled4 = lowered4.compile()
        l4, _ = compiled4(sim4.params)
        jax.block_until_ready(l4)
        n_rep4 = 3
        t0 = time.perf_counter()
        for _ in range(n_rep4):
            l4, _ = compiled4(sim4.params)
        jax.block_until_ready(l4)
        el4 = (time.perf_counter() - t0) / n_rep4
        n4k["n4096_cells_ms_per_epoch"] = round(el4 * 1e3, 1)
        n4k["n4096_cells_matom_steps_per_sec"] = round(
            (tau - 1) * N4 / el4 / 1e6, 2)
        try:
            ca4 = compiled4.cost_analysis()
            ca4 = ca4[0] if isinstance(ca4, (list, tuple)) else ca4
            bytes4 = float(ca4.get("bytes accessed", 0.0))
            if bytes4 > 0:
                hbm_floor4 = bytes4 / (819.0 * 1e9)
                n4k["n4096_cells_hbm_roofline_pct"] = round(
                    100.0 * hbm_floor4 / el4, 1)
        except Exception:
            pass
        print(f"# 4k cells epoch: {el4*1e3:.0f} ms -> "
              f"{n4k['n4096_cells_matom_steps_per_sec']:.2f} "
              f"Matom-steps/s, HBM roofline "
              f"{n4k.get('n4096_cells_hbm_roofline_pct')}%",
              file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"# 4k cells bench skipped: {e}", file=sys.stderr)

    base_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchmarks", "baseline_torch.json")
    vs_cpu = None
    if os.path.exists(base_file):
        with open(base_file) as f:
            base = json.load(f)
        vs_cpu = steps_per_sec / \
            base["water_schnet_nhc_fwdbwd_steps_per_sec"]

    # the defensible headline ratio: reference GPU bounded at <=50
    # steps/s by its own kernel-launch/sync floor (BENCH.md roofline)
    REF_GPU_BOUND = 50.0

    print(json.dumps({
        "metric": "water SchNet+prior NHC fwd+bwd MD steps/sec "
                  "(512 atoms, tau=52 RDF-fit epoch)",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / REF_GPU_BOUND, 1),
        "vs_cpu_thread": round(vs_cpu, 1) if vs_cpu else None,
        "tflops": round(tflops, 2) if tflops else None,
        "mfu_pct": round(mfu, 2) if mfu else None,
        "mts2_equiv_steps_per_sec": (round(mts_equiv, 1)
                                     if mts_equiv else None),
        **n4k,
    }))


if __name__ == "__main__":
    main()
