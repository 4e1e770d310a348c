#!/usr/bin/env python
"""Decompose + attack the 4096-atom cells-path fit epoch (VERDICT r4
item 3: 10,003 ms/epoch at 0.5% of the HBM roofline -- find where the
time goes and cut it >=3x with the fit unchanged).

Components (standalone jitted calls, dispatch-floor included):
  * GNN cells rebuild: build_cell_list + neighbor_table_from_cells
  * prior sparse rebuild: generate_nbr_list at N=4096 (O(N^2))
  * stack energy / force given a fixed table

Variants (tau=52 fwd+bwd RDF-loss epoch, bench.py 4k protocol):
  * base        nn cells slack 1.6 + prior sparse (the r4 official)
  * share       prior rides the GNN's table (Stack share_aux) -- the
                prior's O(N^2) rebuild disappears
  * share_uf3   share + topology refresh every 3 steps + skin 0.45
  * share_skin5 share + refresh every 5 steps + skin 0.75
                (skin covers >= uf * dt * v_max drift; runtime re-mask
                keeps stale tables exact -- nn/schnet.py, interface.py)

Usage: python benchmarks/bench_4k_budget.py [variant ...]
       (default: components + all variants)
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def build(share=False, skin=0.0, update_freq=1, slack=1.6,
          gather_mode="auto"):
    import jax.numpy as jnp
    from mdgrad_tpu.system import System
    from mdgrad_tpu.nn import SchNet
    from mdgrad_tpu import potentials
    from mdgrad_tpu.interface import GNNPotentials, PairPotentials, Stack
    from mdgrad_tpu.md import NoseHooverChain, Simulation
    from mdgrad_tpu.observables import rdf as rdf_obs
    from mdgrad_tpu.data.registry import get_unit_len

    N4 = 8 ** 3 * 8
    L = get_unit_len(0.99749, 18.01528, 8)
    sys4 = System.from_lattice("diamond", 8, L, symbol="O")
    sys4.masses = np.full(N4, 18.01528)
    sys4.set_temperature(298.0, rng=np.random.default_rng(0))
    gnn4 = SchNet({"n_atom_basis": 128, "n_filters": 128,
                   "n_gaussians": 40, "n_convolutions": 2,
                   "cutoff": 6.0, "compute_dtype": "bf16",
                   "gather_mode": gather_mode})
    nn = GNNPotentials(sys4, gnn4, cutoff=6.0, nbr_mode="cells",
                       capacity_slack=slack, skin=skin)
    ev = potentials.ExcludedVolume(sigma=2.6, epsilon=0.01, power=12)
    if share:
        prior = PairPotentials(sys4, ev, cutoff=6.0, mode="table")
        stack = Stack({"nn": nn, "prior": prior},
                      share_aux={"prior": "nn"})
    else:
        prior = PairPotentials(sys4, ev, cutoff=6.0)
        stack = Stack({"nn": nn, "prior": prior})
    integ = NoseHooverChain(stack, sys4, T=298.0, Q=50.0, num_chains=5,
                            adjoint=True, topology_update_freq=update_freq)
    sim = Simulation(sys4, integ)
    obs = rdf_obs(sys4, nbins=109, r_range=(1.8, 7.5), backend="pallas")
    return sys4, sim, integ, stack, obs


def time_epoch(tag, share=False, skin=0.0, update_freq=1, slack=1.6,
               gather_mode="auto", n_rep=3):
    import jax
    import jax.numpy as jnp
    tau, dt = 52, 0.5 * 0.09822694788464063
    sys4, sim, integ, stack, obs = build(share, skin, update_freq, slack,
                                         gather_mode)
    ode = sim.epoch_fn(dt, tau)
    state, aux = sim.initial_state()
    ctrl = integ.default_ctrl()
    g_target = jnp.ones(109)

    def loss_fn(params):
        traj, _ = ode(params, state, aux, ctrl)
        _, _, g = obs(traj.q)
        return ((g - g_target) ** 2).mean()

    vg = jax.jit(jax.value_and_grad(loss_fn))
    t0 = time.perf_counter()
    l, g = vg(sim.params)
    jax.block_until_ready(l)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_rep):
        l, g = vg(sim.params)
    jax.block_until_ready(l)
    el = (time.perf_counter() - t0) / n_rep
    gn = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.abs(x).sum(), g, 0.0))
    print(f"{tag:14s} {el*1e3:8.1f} ms/epoch  "
          f"{(tau-1)*4096/el/1e6:6.3f} Matom-steps/s  "
          f"loss {float(l):.6f}  |g|1 {gn:.4f}  "
          f"(compile {t_compile:.0f}s)", flush=True)
    return el, float(l)


def time_components():
    import jax
    import jax.numpy as jnp
    from mdgrad_tpu.ops import cells as C
    from mdgrad_tpu import topology
    sys4, sim, integ, stack, obs = build()
    nn = stack.models["nn"]
    prior = stack.models["prior"]
    xyz = jnp.asarray(sys4.get_positions())
    cl_len = jnp.diag(jnp.asarray(sys4.get_cell()))

    def t(fn, *a, n=10):
        r = jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(*a)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / n * 1e3

    f_cl = jax.jit(lambda x: C.build_cell_list(x, cl_len, nn._cell_grid))
    clist = f_cl(xyz)
    f_tab = jax.jit(lambda x, c: C.neighbor_table_from_cells(
        x, c, nn._cell_grid, cl_len, nn.build_cutoff, nn.k_max))
    tab = f_tab(xyz, clist)
    f_both = jax.jit(lambda x: nn.aux_update(x, None))
    f_sparse = jax.jit(lambda x: prior.aux_update(x, None))
    sp = f_sparse(xyz)
    params = sim.params
    aux = {"nn": tab, "prior": sp}
    f_e = jax.jit(lambda p, x, a: stack.energy(p, x, a))
    f_f = jax.jit(jax.grad(lambda p, x, a: stack.energy(p, x, a),
                           argnums=1))
    f_e_nn = jax.jit(lambda p, x, a: nn.energy(p, x, a))
    f_f_nn = jax.jit(jax.grad(lambda p, x, a: nn.energy(p, x, a),
                              argnums=1))
    f_e_pr = jax.jit(lambda p, x, a: prior.energy(p, x, a))
    f_f_pr = jax.jit(jax.grad(lambda p, x, a: prior.energy(p, x, a),
                              argnums=1))
    print(f"build_cell_list            {t(f_cl, xyz):8.2f} ms")
    print(f"neighbor_table_from_cells  {t(f_tab, xyz, clist):8.2f} ms")
    print(f"nn.aux_update (both)       {t(f_both, xyz):8.2f} ms")
    print(f"prior sparse rebuild       {t(f_sparse, xyz):8.2f} ms")
    print(f"stack energy               {t(f_e, params, xyz, aux):8.2f} ms")
    print(f"stack force                {t(f_f, params, xyz, aux):8.2f} ms")
    print(f"  nn energy                {t(f_e_nn, params['nn'], xyz, tab):8.2f} ms")
    print(f"  nn force                 {t(f_f_nn, params['nn'], xyz, tab):8.2f} ms")
    print(f"  prior energy (sparse)    {t(f_e_pr, params['prior'], xyz, sp):8.2f} ms")
    print(f"  prior force  (sparse)    {t(f_f_pr, params['prior'], xyz, sp):8.2f} ms")
    sys.stdout.flush()


VARIANTS = {
    "base": dict(),
    "share": dict(share=True),
    "share_uf3": dict(share=True, skin=0.45, update_freq=3, slack=1.25),
    "share_skin5": dict(share=True, skin=0.75, update_freq=5, slack=1.25),
    # aggregation alternatives at N=4096 ('auto' resolves to 'gather'
    # past ONEHOT_MAX_ATOMS=3500; the r3 fit-epoch ratio onehot/gather
    # was 1.03 @4000 -- retest under sharing, and test the fused Pallas
    # kernel whose gathered (N*K, F) tensor never exists in HBM)
    "share_pallas": dict(share=True, gather_mode="pallas"),
    "share_onehot": dict(share=True, gather_mode="onehot"),
    "share_uf3_pl": dict(share=True, skin=0.45, update_freq=3, slack=1.25,
                         gather_mode="pallas"),
}


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    args = sys.argv[1:]
    if not args or "components" in args:
        time_components()
    for name in (args or list(VARIANTS)):
        if name == "components":
            continue
        time_epoch(name, **VARIANTS[name])


if __name__ == "__main__":
    main()
