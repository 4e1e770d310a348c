#!/usr/bin/env python
"""Stripe-fit degeneracy analysis (VERDICT r2 item 7).

Overlays the recovered pair potential against the ground-truth
SplineOverlap and quantifies WHERE g(r) constrains it: bands of r where
the target g(r) ~ 0 (or where the g(r)-weighted sensitivity vanishes)
are invisible to an RDF-only loss, so any u(r) discrepancy there is the
soft-core degeneracy, not a fitting failure.

Usage: analyze_stripe.py <run_dir> <data_tag> [-out results/stripe_r3]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# pure host-side analysis: never grab the TPU
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("data_tag")
    p.add_argument("-out", default=None)
    args = p.parse_args()
    out = args.out or args.run_dir

    import jax.numpy as jnp
    from mdgrad_tpu.data import pair_data_dict, get_exp_rdf
    from mdgrad_tpu.train.fit_rdf_pair import resolve_target_pot

    entry = pair_data_dict[args.data_tag]
    pot = resolve_target_pot(entry["target_pot"])

    which = ("potential_best.txt"
             if os.path.exists(os.path.join(args.run_dir,
                                            "potential_best.txt"))
             else "potential.txt")
    r, u_fit = np.loadtxt(os.path.join(args.run_dir, which))
    u_t = np.asarray(pot(pot.init_params(),
                         jnp.asarray(r)[:, None])).squeeze(-1)
    u_t = u_t - u_t[-1]
    u_fit = u_fit - u_fit[-1]

    # target g(r) on the same grid
    start, end = entry.get("start", 0.5), entry["end"]
    data = np.loadtxt(entry.get("rdf_fn") or entry["fn"], delimiter=",") \
        if (entry.get("rdf_fn") or entry.get("fn")) else None
    if data is not None:
        x, g = get_exp_rdf(data, 256, (start, end),
                           dim=entry.get("dim", 3))
        g_on_r = np.interp(r, np.asarray(x), np.asarray(g), left=0.0,
                           right=1.0)
    else:
        g_on_r = np.ones_like(r)

    dev = np.abs(u_fit - u_t)
    # g(r)-weighted (what the RDF loss can see) vs unweighted deviation
    blind = g_on_r < 0.05
    seen_dev = dev[~blind]
    blind_dev = dev[blind] if blind.any() else np.zeros(1)

    print(f"potential: {which}")
    print(f"r range: [{r[0]:.2f}, {r[-1]:.2f}]  "
          f"(g<0.05 'blind' bands: {blind.mean() * 100:.0f}% of grid)")
    bands = []
    if blind.any():
        edges = np.flatnonzero(np.diff(blind.astype(int)))
        idx = np.concatenate([[0], edges + 1, [len(r)]])
        for a, b in zip(idx[:-1], idx[1:]):
            if blind[a]:
                bands.append((r[a], r[b - 1]))
        print("blind bands (g(r) < 0.05, invisible to the RDF loss):")
        for a, b in bands:
            print(f"  r in [{a:.2f}, {b:.2f}]")
    print(f"|u_fit - u_truth| where g(r) SEES the potential: "
          f"mean {seen_dev.mean():.4f}, max {seen_dev.max():.4f}")
    print(f"|u_fit - u_truth| in the blind bands:           "
          f"mean {blind_dev.mean():.4f}, max {blind_dev.max():.4f}")

    os.makedirs(out, exist_ok=True)
    np.savetxt(os.path.join(out, "potential_overlay.csv"),
               np.vstack([r, u_fit, u_t, g_on_r]), delimiter=",",
               header="rows: r, u_fit, u_truth, g_target(r)")
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(7, 4.5))
        ax.plot(r, u_t, "k-", lw=2, label="SplineOverlap truth")
        ax.plot(r, u_fit, "r--", lw=2, label=f"recovered ({which})")
        for a, b in bands:
            ax.axvspan(a, b, color="0.85", zorder=0)
        ax.set_xlabel("r")
        ax.set_ylabel("u(r)")
        ax.set_ylim(min(u_t.min(), 0) - 0.5,
                    min(u_t.max(), 25.0) * 1.05)
        ax2 = ax.twinx()
        ax2.plot(r, g_on_r, "b:", lw=1, label="target g(r)")
        ax2.set_ylabel("g(r)", color="b")
        ax.legend(loc="upper right")
        ax.set_title("shaded: g(r)<0.05 -- bands the RDF loss cannot see")
        fig.tight_layout()
        fig.savefig(os.path.join(out, "potential_overlay.jpg"), dpi=130)
        print(f"wrote {out}/potential_overlay.jpg")
    except Exception as e:  # pragma: no cover
        print(f"plot skipped: {e}")


if __name__ == "__main__":
    main()
