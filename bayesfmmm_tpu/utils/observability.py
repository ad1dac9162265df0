"""Observability: progress streams, profiling, NaN debugging.

The reference's observability is Rcpp::Rcout prints of iteration count and
rolling mean log-likelihood (BFMMM.h:200-204, :870-875) plus TT acceptance
prints (:831-835).  Rebuild equivalents (SURVEY.md §5):

  * ``ProgressStream``   — rolling-loglik diagnostic stream as a first-class
    callback (host-side, fed from scanned loglik outputs)
  * ``trace_profile``    — context manager around jax.profiler for
    per-region device traces
  * ``assert_finite_state`` / ``debug_nans`` — NaN debugging hooks
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np

__all__ = ["ProgressStream", "trace_profile", "assert_finite_state",
           "debug_nans", "rolling_loglik"]


class ProgressStream:
    """Rolling log-likelihood progress reporting (BFMMM.h:870-875 analog)."""

    def __init__(self, every=100, window=5, printer=print):
        self.every = every
        self.window = window
        self.printer = printer
        self._t0 = time.time()
        self.history = []

    def update(self, iteration, loglik_values):
        """Feed the latest loglik values (array-like); prints every `every`."""
        vals = np.atleast_1d(np.asarray(loglik_values))
        self.history.extend(vals.tolist())
        if (iteration + 1) % self.every == 0:
            tail = self.history[-self.window:]
            rate = (iteration + 1) / (time.time() - self._t0)
            self.printer(
                f"Iteration: {iteration + 1}  "
                f"Log-likelihood: {np.mean(tail):.2f}  "
                f"({rate:.1f} it/s)")


def rolling_loglik(loglik_trace, window=5):
    """Rolling mean over the trailing window (the reference's statistic)."""
    ll = np.asarray(loglik_trace)
    if len(ll) < window:
        return float(ll.mean())
    return float(ll[-window:].mean())


@contextlib.contextmanager
def trace_profile(logdir: str):
    """Profile a region with the JAX profiler (TensorBoard-compatible)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def assert_finite_state(state, where=""):
    """Host-side NaN/Inf check over a state pytree; raises with field names."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(state)[0]:
        arr = np.asarray(leaf)
        if arr.size and not np.isfinite(arr).all():
            label = "".join(str(p) for p in path)
            bad.append(label)
    if bad:
        raise FloatingPointError(
            f"non-finite values in state fields {bad} {where}")
    return True


@contextlib.contextmanager
def debug_nans(enable=True):
    """Scoped jax_debug_nans (SURVEY.md §5 race/NaN debugging rebuild)."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
