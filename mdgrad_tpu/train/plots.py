"""Plotting helpers for the fitting drivers (matplotlib, headless).

Parity target: the reference drivers' per-epoch diagnostics --
``plot_rdfs`` (fit_rdf_gnn.py:45-59), ``plot_pair`` recovered-potential
overlays (fit_rdf_pair.py:266-295), ``plot_vacf`` (scripts/plot.py) and the
loss-curve dumps.  All functions no-op gracefully if matplotlib is absent.
"""

import numpy as np


def _plt():
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        return plt
    except Exception:
        return None


def plot_rdfs(bins, g_target, g_sim, fname, path, pname=None):
    plt = _plt()
    if plt is None:
        return
    plt.figure()
    plt.title(f"epoch {pname}")
    plt.plot(bins, np.asarray(g_sim), linewidth=4, alpha=0.6, label="sim.")
    plt.plot(bins, np.asarray(g_target), linewidth=2, linestyle="--",
             c="black", label="target")
    plt.xlabel("r [A]")
    plt.ylabel("g(r)")
    plt.legend()
    plt.savefig(f"{path}/{fname}.jpg", bbox_inches="tight")
    plt.close()


def plot_pair(r_grid, u_fit, u_target, fname, path, ylim=(-2, 4)):
    plt = _plt()
    if plt is None:
        return
    plt.figure()
    plt.plot(r_grid, np.asarray(u_fit), label="fit", linewidth=4,
             alpha=0.6)
    if u_target is not None:
        plt.plot(r_grid, np.asarray(u_target), label="truth", linewidth=2,
                 linestyle="--", c="black")
    plt.ylim(*ylim)
    plt.xlabel("r")
    plt.ylabel("u(r)")
    plt.legend()
    plt.savefig(f"{path}/potential_{fname}.jpg", bbox_inches="tight")
    plt.close()


def plot_vacf(vacf_sim, vacf_target, fname, path, dt=0.01):
    plt = _plt()
    if plt is None:
        return
    plt.figure()
    t = np.arange(len(np.asarray(vacf_sim))) * dt
    plt.plot(t, np.asarray(vacf_sim), label="sim.", linewidth=4, alpha=0.6)
    if vacf_target is not None:
        plt.plot(t[:len(np.asarray(vacf_target))], np.asarray(vacf_target),
                 label="target", linewidth=2, linestyle="--", c="black")
    plt.xlabel("t")
    plt.ylabel("VACF")
    plt.legend()
    plt.savefig(f"{path}/vacf_{fname}.jpg", bbox_inches="tight")
    plt.close()


def plot_loss(loss_log, path, fname="loss"):
    plt = _plt()
    if plt is None:
        return
    plt.figure()
    plt.semilogy(np.asarray(loss_log))
    plt.xlabel("epoch")
    plt.ylabel("loss")
    plt.savefig(f"{path}/{fname}.jpg", bbox_inches="tight")
    plt.close()
