"""Per-step time attribution for the headline water-SchNet epoch.

BENCH.md's round-3 roofline says the N=512 headline is neither
FLOP-bound (0.45% MFU) nor HBM-bound (memory floor = 4% of wall): the
epoch is occupancy/latency-bound on a long chain of small kernels.
This bench decomposes the ~0.57 ms per fwd+bwd MD step into its
components so the next optimization targets the real hog:

  1. neighbor-table refresh alone (dense disp planes + top_k, the only
     part topology_update_freq can amortize)
  2. SchNet+prior force evaluation alone (the per-step physics)
  3. forward-only epoch steps/s (integrator chain, no adjoint)
  4. fwd+bwd epoch steps/s (the headline protocol)
  5. topology_update_freq in {1, 2, 4} at skin=0: with capacity_slack
     1.25 the (N, K=40) table holds ~8 beyond-cutoff neighbors that act
     as a free Verlet skin (distance-masked at evaluation), so a stale
     table stays near-exact for a few steps WITHOUT the K inflation
     that made the explicit skin=0.6 variant lose (BENCH.md round-3
     log: skin 0.6 + refresh/4 -> 633 steps/s vs 851 baseline).

Loss values are printed for every refresh variant: identical physics
shows up as matching losses at the RDF-estimator noise scale.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, n=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def build(update_freq=1):
    import jax.numpy as jnp
    from mdgrad_tpu.system import System
    from mdgrad_tpu.nn import SchNet
    from mdgrad_tpu import potentials
    from mdgrad_tpu.interface import GNNPotentials, PairPotentials, Stack
    from mdgrad_tpu.md import NoseHooverChain, Simulation
    from mdgrad_tpu.observables import rdf as rdf_obs
    from mdgrad_tpu.data.registry import get_unit_len

    L = get_unit_len(0.99749, 18.01528, 8)
    system = System.from_lattice("diamond", 4, L, symbol="O")
    system.masses = np.full(512, 18.01528)
    system.set_temperature(298.0, rng=np.random.default_rng(0))
    gnn = SchNet({"n_atom_basis": 128, "n_filters": 128, "n_gaussians": 40,
                  "n_convolutions": 2, "cutoff": 6.0,
                  "compute_dtype": "bf16"})
    stack = Stack({
        "nn": GNNPotentials(system, gnn, cutoff=6.0, capacity_slack=1.25),
        "prior": PairPotentials(system, potentials.ExcludedVolume(
            sigma=2.6, epsilon=0.01, power=12), cutoff=6.0, mode="dense"),
    })
    integ = NoseHooverChain(stack, system, T=298.0, Q=50.0, num_chains=5,
                            adjoint=True, topology_update_freq=update_freq)
    sim = Simulation(system, integ)
    obs = rdf_obs(system, nbins=109, r_range=(1.8, 7.5))
    return system, sim, integ, stack, obs


def main():
    import jax
    import jax.numpy as jnp

    tau = 52
    dt = 0.5 * 0.09822694788464063
    print(f"devices: {jax.devices()}", file=sys.stderr)

    system, sim, integ, stack, obs = build()
    state, aux = sim.initial_state()
    params = sim.params
    g_target = jnp.ones(109)

    # --- component 1: neighbor refresh (Stack aux_update) ---
    upd = jax.jit(lambda q, a: stack.aux_update(q, a))
    t_upd = timeit(upd, state.q, aux, n=50)

    # --- component 2: force eval (energy grad wrt positions) ---
    force = jax.jit(lambda p, q, a: jax.grad(stack.energy, argnums=1)(p, q, a))
    t_force = timeit(force, params, state.q, aux, n=50)

    # --- component 2b: energy forward only ---
    en = jax.jit(stack.energy)
    t_en = timeit(en, params, state.q, aux, n=50)

    print(f"aux_update (table rebuild): {t_upd*1e6:8.1f} us")
    print(f"energy fwd:                 {t_en*1e6:8.1f} us")
    print(f"force (energy grad):        {t_force*1e6:8.1f} us")

    # --- components 3-5: epochs at each refresh cadence ---
    for freq in (1, 2, 4):
        system, sim, integ, stack, obs = build(update_freq=freq)
        state, aux = sim.initial_state()
        ctrl = integ.default_ctrl()
        ode = sim.epoch_fn(dt, tau)

        def loss_fn(p):
            traj, _ = ode(p, state, aux, ctrl)
            _, _, g = obs(traj.q[::10])
            return ((g - g_target) ** 2).mean()

        fwd = jax.jit(loss_fn)
        vg = jax.jit(jax.value_and_grad(loss_fn))
        t_fwd = timeit(fwd, sim.params, n=10)
        t_vg = timeit(vg, sim.params, n=10)
        loss = float(fwd(sim.params))
        sps_f = (tau - 1) / t_fwd
        sps = (tau - 1) / t_vg
        per_step = t_vg / (tau - 1)
        print(f"refresh/{freq}: fwd-only {sps_f:7.1f} steps/s | fwd+bwd "
              f"{sps:7.1f} steps/s ({per_step*1e6:.0f} us/step) | "
              f"loss {loss:.6f}")

    # budget summary at refresh/1
    print("\nbudget check (refresh/1): per-step fwd+bwd vs "
          "refresh + 3x force (1 fwd force cache + ~2x-cost backward):",
          file=sys.stderr)
    print(f"  components: refresh {t_upd*1e6:.0f} + force "
          f"{t_force*1e6:.0f} us", file=sys.stderr)


if __name__ == "__main__":
    main()
