#!/usr/bin/env python
"""Attack the N=512 headline plateau (VERDICT r4 item 4: 871 -> 865
steps/s across two rounds; BENCH.md attributes the 58.9 ms epoch to
per-fusion dispatch/latency, NOT FLOPs (MFU 0.46%) or bandwidth (memory
floor 4%)).  This bench isolates the candidate costs one variant at a
time, all at the official workload (512 atoms, SchNet 128/128/40/2 bf16
+ ExcludedVolume prior, NHC, tau=52 fwd+bwd RDF-loss epoch):

  base        bench.py headline exactly (dense O(N^2) prior, rebuild
              every step)
  share       prior rides the GNN (N, K) table via Stack share_aux --
              deletes the prior's ~10 dense 512^2 elementwise ops AND
              its separate topology pass from every step
  share_uf2   share + Verlet skin 0.3 + topology refresh every 2 steps
  share_uf4   share + skin 0.6 + refresh every 4 steps
  frozen      share + refresh never inside the epoch (uf=60 > tau) --
              pure diagnostic: bounds the total rebuild cost
  noobs       share + loss = mean(q_final^2) instead of the RDF -- what
              the 109-bin RDF histogram + its vjp cost per epoch
  tau104      share at tau=104 -- if the per-CALL (tunnel dispatch)
              overhead matters, steps/s rises with a longer program

Usage: python benchmarks/bench_headline_r5.py [variant ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

TAU = 52
DT = 0.5 * 0.09822694788464063


def build(share=False, skin=0.0, update_freq=1, prior_mode="dense",
          adjoint=True, unroll=1):
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
    nn = GNNPotentials(system, gnn, cutoff=6.0, capacity_slack=1.25,
                       skin=skin)
    ev = potentials.ExcludedVolume(sigma=2.6, epsilon=0.01, power=12)
    if share:
        prior = PairPotentials(system, ev, cutoff=6.0, mode="table")
        stack = Stack({"nn": nn, "prior": prior},
                      share_aux={"prior": "nn"})
    else:
        prior = PairPotentials(system, ev, cutoff=6.0, mode=prior_mode)
        stack = Stack({"nn": nn, "prior": prior})
    integ = NoseHooverChain(stack, system, T=298.0, Q=50.0, num_chains=5,
                            adjoint=adjoint,
                            topology_update_freq=update_freq,
                            unroll=unroll)
    sim = Simulation(system, integ)
    obs = rdf_obs(system, nbins=109, r_range=(1.8, 7.5))
    return system, sim, integ, obs


def run(tag, tau=TAU, rdf_loss=True, n_rep=5, **kw):
    import jax
    import jax.numpy as jnp
    system, sim, integ, obs = build(**kw)
    ode = sim.epoch_fn(DT, tau)
    state, aux = sim.initial_state()
    ctrl = integ.default_ctrl()
    g_target = jnp.ones(109)

    if rdf_loss:
        def loss_fn(params):
            traj, _ = ode(params, state, aux, ctrl)
            _, _, g = obs(traj.q[::10])
            return ((g - g_target) ** 2).mean()
    else:
        def loss_fn(params):
            traj, _ = ode(params, state, aux, ctrl)
            return (traj.q[-1] ** 2).mean()

    vg = jax.jit(jax.value_and_grad(loss_fn))
    t0 = time.perf_counter()
    compiled = vg.lower(sim.params).compile()
    l, g = compiled(sim.params)
    jax.block_until_ready(l)
    t_compile = time.perf_counter() - t0
    # per-call timing on PERTURBED inputs: the first harness version
    # timed a loop of byte-identical (executable, args) calls and blocked
    # only on the last result -- the 'frozen' variant came back at an
    # impossible 0.1 ms/epoch (467k steps/s, 5x the chip's FLOP roof),
    # i.e. repeated identical requests were being collapsed somewhere
    # down the axon tunnel.  Nudging one param leaf per rep makes every
    # call unique, and blocking per call gives honest wall times.
    def nudged(i):
        eps = np.float32(1e-7) * (i + 1)
        return jax.tree_util.tree_map(
            lambda x: x + eps if (hasattr(x, "dtype")
                                  and jnp.issubdtype(x.dtype, jnp.floating))
            else x, sim.params)

    times = []
    for i in range(n_rep):
        p = jax.block_until_ready(nudged(i))
        t0 = time.perf_counter()
        li, gi = compiled(p)
        jax.block_until_ready((li, gi))
        times.append(time.perf_counter() - t0)
    el = float(np.median(times))
    sps = (tau - 1) / el
    extra = ""
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        fl = float(ca.get("flops", 0.0))
        by = float(ca.get("bytes accessed", 0.0))
        extra = (f"  {fl/1e9:.2f} GFLOP {by/1e9:.2f} GB "
                 f"(hbm floor {by/819e9*1e3:.1f} ms)")
    except Exception:
        pass
    print(f"{tag:10s} {el*1e3:7.1f} ms/epoch  {sps:7.1f} steps/s  "
          f"loss {float(l):.6f}{extra}  (compile {t_compile:.0f}s)",
          flush=True)
    return sps


VARIANTS = {
    "base": dict(),
    "share": dict(share=True),
    "share_uf2": dict(share=True, skin=0.3, update_freq=2),
    "share_uf4": dict(share=True, skin=0.6, update_freq=4),
    "frozen": dict(share=True, update_freq=60),
    "noobs": dict(share=True, rdf_loss=False),
    "tau104": dict(share=True, tau=104),
    # round-2 probe set: the first sweep showed share_aux HURTS at N=512
    # (table-gather prior loses to dense O(N^2) math, CLAUDE.md rule 5),
    # so re-test the skin/update-freq lever with the DENSE prior kept
    "uf2": dict(skin=0.3, update_freq=2),
    "uf4": dict(skin=0.6, update_freq=4),
    "uf8": dict(skin=1.2, update_freq=8),
    "frozen_dense": dict(update_freq=60),
    "noobs_dense": dict(rdf_loss=False),
    "tau104_dense": dict(tau=104),
    # direct backprop through the scan (adjoint=False): at N=512 the
    # stored activations fit easily, and the adjoint's backward REPLAYS
    # the step (fwd + vjp ~ 3x fwd inside bwd vs direct's stored-
    # residual 2x) -- candidate ~25% epoch saving at identical grads
    "direct": dict(adjoint=False),
    "direct_uf4": dict(adjoint=False, skin=0.6, update_freq=4),
    "direct_uf8": dict(adjoint=False, skin=1.2, update_freq=8),
    # scan-unroll ladder: the clean round-2 probe pinned the epoch at
    # ~1.04 ms/step + ~25 ms/call (post-restart tunnel RTT) with FLOPs
    # and bytes both ~20x below their rooflines -- fusion-count bound.
    # unroll=k unrolls the scan body so XLA fuses across step
    # boundaries; numerics identical (the same ops in the same order)
    "unroll2": dict(unroll=2),
    "unroll4": dict(unroll=4),
    "unroll8": dict(unroll=8),
    "unroll4_direct": dict(unroll=4, adjoint=False),
}


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    for name in (sys.argv[1:] or list(VARIANTS)):
        run(name, **VARIANTS[name])


if __name__ == "__main__":
    main()
