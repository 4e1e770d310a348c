"""Tracing / profiling utilities (SURVEY §5: the reference has no
profiler or timing instrumentation anywhere -- progress is print
statements, fit_rdf_gnn.py:453, fit_rdf_pair.py:517; the rebuild's
BASELINE metric is MD steps/s, so both are first-class here).

``trace`` wraps ``jax.profiler`` (view with TensorBoard or Perfetto);
``Throughput`` is the steps/s counter the fit drivers and benches print;
``time_fn`` is the compile-then-time micro-bench used across BENCH.md.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir, host_only=False):
    """Device-level trace of everything inside the block.

    Usage::

        with profiling.trace("/tmp/trace"):
            traj, _ = ode(params, state, aux, ctrl)
            jax.block_until_ready(traj.q)

    The per-op device timeline (one XLA `while` op per scan -- forward
    and adjoint backward show up separately) lands in
    ``logdir/plugins/profile/...`` for TensorBoard/Perfetto/xprof.
    """
    jax.profiler.start_trace(logdir, create_perfetto_trace=not host_only)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Steps/s (and any-unit/s) counter with exponential smoothing.

    >>> tp = Throughput(unit="steps")
    >>> for epoch in range(10):
    ...     run_epoch()           # doctest: +SKIP
    ...     print(tp.update(steps_this_epoch))  # doctest: +SKIP
    """

    def __init__(self, unit="steps", alpha=0.3):
        self.unit = unit
        self.alpha = alpha
        self.rate = None
        self._t = time.perf_counter()
        self.total = 0

    def update(self, n):
        now = time.perf_counter()
        dt = max(now - self._t, 1e-9)
        self._t = now
        inst = n / dt
        self.rate = (inst if self.rate is None
                     else self.alpha * inst + (1 - self.alpha) * self.rate)
        self.total += n
        return self.rate

    def __str__(self):
        r = 0.0 if self.rate is None else self.rate
        return f"{r:.1f} {self.unit}/s"


def time_fn(fn, *args, iters=20, warmup=2):
    """Median-free mean wall-clock of ``fn(*args)`` after compile/warmup;
    blocks on the output pytree.  Returns seconds per call."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
