"""Quantum-yield optimization of retinal isomerization (control problem).

Parity target: /root/reference/demo/isom.py -- load the retinal model
operators (Hahn & Stock 2000) from data/isom/*.npy, initialize a Gaussian
pulse E(t) (isom.py:70-112), integrate the Schroedinger EOM with RK4
through ~30k steps, compute four quantum-yield definitions
(calc_yield, isom.py:114-202), and maximize the yield (definition 4)
averaged over the last ``look_back`` steps by gradient descent on E(t)
(isom.py:276-315).

TPU-native notes: yields are computed for ALL frames at once with batched
einsum contractions against the (716, 716) projectors (MXU work) instead of
the reference's per-frame Python loop; the whole epoch (30k RK4 steps) is
one lax.scan program.
"""

import os
import json
from math import pi

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..md.isomerization import Isomerization
from ..md.adjoint import make_odeint

# time conversion / pulse constants (parity: reference isom.py:22-37)
FS_TO_EV = 41.341 / 27.2
DT = 2 * pi / 2.8 / 30
TMAX = 1500 * FS_TO_EV
TAU = 10 * FS_TO_EV
W0 = 2.4
TP = 3 * TAU

_VENDORED_ISOM = os.path.join(os.path.dirname(__file__), "..", "data",
                              "targets", "isom")
ISOM_DATA_DIR = os.environ.get(
    "MDGRAD_ISOM_DIR",
    _VENDORED_ISOM if os.path.isdir(_VENDORED_ISOM)
    else "/root/reference/data/isom")


def make_quants(data_dir=None):
    """Load retinal operators (parity: reference isom.py:39-67)."""
    d = data_dir or ISOM_DATA_DIR
    load = lambda f: np.load(os.path.join(d, f)).astype(np.float32)
    ham = load("hamiltonian.npy")
    return {"ham": ham,
            "dipole": load("unitless_mu.npy"),
            "prod_op": load("Pt_11.npy"),
            "reac_op": load("Pc_00.npy"),
            "dim": ham.shape[0]}


def initialize_Et(dt=DT, tmax=TMAX, w0=W0, tau=TAU, tp=TP):
    """Gaussian-pulse initial guess on a coarse uniform grid
    (parity: reference isom.py:70-112).  Returns (t_field, e_t, n_steps)."""
    num_steps = int(tmax / dt)
    first_num_steps = int(tmax / dt / 5)
    t_grid_0 = np.linspace(0, tmax / 2, first_num_steps)
    e0 = pi ** 0.5 / tau
    e_t = (e0 * np.cos(w0 * (t_grid_0 - tp))
           * np.exp(-(t_grid_0 - tp) ** 2 / tau ** 2))
    return t_grid_0, e_t, num_steps


def calc_yields(psi_t, prod_op, reac_op):
    """Four quantum-yield definitions, vectorized over frames
    (parity: reference isom.py:114-202)."""
    dim = psi_t.shape[-1] // 2
    pr = psi_t[..., :dim]
    pi_ = psi_t[..., dim:]

    def expect(op, a):
        return jnp.einsum("ti,ij,tj->t", a, op, a)

    er, ei = expect(prod_op, pr), expect(prod_op, pi_)
    erc, eic = expect(reac_op, pr), expect(reac_op, pi_)
    prod = er + ei
    reac = erc + eic
    pg = pr[:, 0] ** 2 + pi_[:, 0] ** 2

    y1 = prod / (prod + reac - pg)
    # definition 2 keeps the reference's exact cross-term expression
    # (isom.py:158-161)
    cross = ((reac_op[0, 1:] * pr[:, 1:]).sum(-1) * pr[:, 0]
             + (reac_op[0, 1:] * pi_[:, 1:]).sum(-1))
    y2 = prod / (prod + reac - (pg + 2 * cross))
    y3 = prod / (1 - pg)

    prod_exc, reac_exc = prod_op[1:, 1:], reac_op[1:, 1:]
    pr_e, pi_e = pr[:, 1:], pi_[:, 1:]
    prod_e = expect(prod_exc, pr_e) + expect(prod_exc, pi_e)
    reac_e = expect(reac_exc, pr_e) + expect(reac_exc, pi_e)
    y4 = prod_e / (prod_e + reac_e)
    return y1, y2, y3, y4


def objective(y_t, look_back=20000):
    """Negative mean yield over the last ``look_back`` frames
    (parity: reference isom.py:205-223)."""
    return -jnp.mean(y_t[-look_back:])


def fit_isomerization(n_epochs=5, lr=1e-2, adam=False, n_steps=None,
                      look_back=20000, data_dir=None, logdir=None,
                      log=print, yield_def=4):
    """Optimize E(t) to maximize the quantum yield.

    Returns dict with per-epoch yields and the optimized field.
    """
    q = make_quants(data_dir)
    t_field, e_t, full_steps = initialize_Et()
    n_steps = n_steps or full_steps
    look_back = min(look_back, n_steps)

    ode_obj = Isomerization(q["ham"], q["dipole"], t_field, e_t,
                            max_e_t=float(t_field.max()))

    def step_fn(params, state, aux, ctrl, i):
        return ode_obj.step(params, state, aux, ctrl, i * DT, DT)

    odeint = make_odeint(step_fn, lambda s, a: a, n_steps, adjoint=True)
    prod_op = jnp.asarray(q["prod_op"])
    reac_op = jnp.asarray(q["reac_op"])
    psi0 = ode_obj.initial_state()

    def loss_fn(params):
        traj, _ = odeint(params, psi0, (), {})
        ys = calc_yields(traj.psi, prod_op, reac_op)
        return objective(ys[yield_def - 1], look_back), ys

    vg = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    opt = optax.adam(lr) if adam else optax.sgd(lr)
    params = ode_obj.init_params()
    opt_state = opt.init(params)

    @jax.jit
    def _opt_step(grads, opt_state, params):
        # fused optimizer step (eager optax over the axon tunnel costs
        # hundreds of small dispatches per epoch; see fit_rdf.py)
        updates, new_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_state

    q_yields, fields = [], []
    yields_t = None
    for epoch in range(n_epochs):
        (loss, ys), grads = vg(params)
        q_yields.append(-float(loss))
        fields.append(np.asarray(params["e_field"]).tolist())
        yields_t = [np.asarray(y) for y in ys]
        log(f"epoch {epoch}: average quantum yield {-float(loss):.6f}")
        params, opt_state = _opt_step(grads, opt_state, params)

    out = {"q_yields": q_yields, "e_field": np.asarray(params["e_field"]),
           "yields_t": yields_t, "params": params}
    if logdir:
        os.makedirs(logdir, exist_ok=True)
        with open(os.path.join(logdir, "q_yields.json"), "w") as f:
            json.dump(q_yields, f)
        with open(os.path.join(logdir, "e_fields.json"), "w") as f:
            json.dump(fields, f)
    return out
