"""Generic fixed-grid ODE solvers on ARBITRARY (non-uniform) time grids.

Parity target: /root/reference/torchmd/tinydiffeq.py:56-86 (``odeint``'s
grid loop: step between successive solution times, collect y(t_i)) with
the solver table euler / midpoint / rk4 "3/8 rule"
(tinydiffeq.py:88-116).  The MD stack never uses non-uniform grids (its
epochs ride md/adjoint.make_odeint's uniform-dt scan), but the generic
solver completes the reference's public surface -- e.g. logging
observables on a geometric time grid for VACF long tails.

TPU-native: one ``lax.scan`` over intervals; dt comes from the traced
``t`` array, so one compiled program serves any grid of the same length.
Differentiable through ``y0``, ``t`` and the closed-over parameters of
``func`` (plain scan autodiff -- use md/adjoint for the O(activations)-
free trajectory machinery).
"""

import jax
import jax.numpy as jnp


def _euler_step(func, y, t, dt):
    return jax.tree_util.tree_map(
        lambda a, k: a + dt * k, y, func(t, y))


def _midpoint_step(func, y, t, dt):
    k1 = func(t, y)
    mid = jax.tree_util.tree_map(lambda a, k: a + 0.5 * dt * k, y, k1)
    k2 = func(t + 0.5 * dt, mid)
    return jax.tree_util.tree_map(lambda a, k: a + dt * k, y, k2)


def _rk4_step(func, y, t, dt):
    """RK4 "3/8 rule" (reference tinydiffeq.py:97-103)."""
    tm = jax.tree_util.tree_map
    k1 = func(t, y)
    k2 = func(t + dt / 3,
              tm(lambda a, k: a + dt * k / 3, y, k1))
    k3 = func(t + dt * 2 / 3,
              tm(lambda a, p, q: a + dt * (-p / 3 + q), y, k1, k2))
    k4 = func(t + dt,
              tm(lambda a, p, q, r: a + dt * (p - q + r), y, k1, k2, k3))
    return tm(lambda a, p, q, r, s: a + (p + 3 * q + 3 * r + s) * (dt / 8),
              y, k1, k2, k3, k4)


_STEPPERS = {"euler": _euler_step, "midpoint": _midpoint_step,
             "rk4": _rk4_step}


def odeint(func, y0, t, method="rk4", substeps=1):
    """Solve dy/dt = func(t, y) at the times in ``t``.

    func:     (t, y_pytree) -> dy/dt pytree
    y0:       initial state pytree at t[0]
    t:        (T,) solution times, strictly monotone, ARBITRARY spacing
    substeps: integration sub-steps per output interval (static)

    Returns the trajectory pytree with a leading T axis (row 0 is y0) --
    the reference's ``odeint`` contract (tinydiffeq.py:56-86).
    """
    if method not in _STEPPERS:
        raise ValueError(f"unknown method {method!r}; "
                         f"have {sorted(_STEPPERS)}")
    stepper = _STEPPERS[method]
    t = jnp.asarray(t)

    def interval(y, span):
        t0, t1 = span
        h = (t1 - t0) / substeps
        for s in range(substeps):
            y = stepper(func, y, t0 + s * h, h)
        return y, y

    _, traj = jax.lax.scan(interval, y0, (t[:-1], t[1:]))
    return jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a[None], b], axis=0), y0, traj)
