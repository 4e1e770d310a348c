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

vs_baseline: ratio against the reference-algorithm-equivalent PyTorch
pipeline measured on this host's CPU (benchmarks/baseline_torch.json,
regenerate with benchmarks/torch_reference_baseline.py).  The reference
never published GPU numbers and cannot run here (needs ASE + CUDA); see
BENCH.md for methodology and caveats.
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
    stack = Stack({
        "nn": GNNPotentials(system, gnn, cutoff=6.0),
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
    loss, grads = vg(sim.params)
    jax.block_until_ready(loss)
    print(f"# compile+first-run: {time.perf_counter()-t_c:.1f}s",
          file=sys.stderr)

    n_rep = 5
    t0 = time.perf_counter()
    for _ in range(n_rep):
        loss, grads = vg(sim.params)
    jax.block_until_ready(loss)
    elapsed = time.perf_counter() - t0
    steps_per_sec = n_rep * (tau - 1) / elapsed

    base_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchmarks", "baseline_torch.json")
    vs = None
    if os.path.exists(base_file):
        with open(base_file) as f:
            base = json.load(f)
        vs = steps_per_sec / base["water_schnet_nhc_fwdbwd_steps_per_sec"]

    print(json.dumps({
        "metric": "water SchNet+prior NHC fwd+bwd MD steps/sec "
                  "(512 atoms, tau=52 RDF-fit epoch)",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(vs, 1) if vs else None,
    }))


if __name__ == "__main__":
    main()
