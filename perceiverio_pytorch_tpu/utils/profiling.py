"""Tracing / profiling / observability helpers.

The reference has no profiler hooks or timers anywhere (SURVEY.md 5); here:
  * ``trace`` -- context manager around ``jax.profiler.trace`` producing a
    TensorBoard-loadable xplane trace of the enclosed device work;
  * ``annotate`` -- ``jax.named_scope`` alias used throughout the core model
    so encoder/decoder stages are legible in traces and HLO;
  * ``sync`` -- a reliable completion barrier (device->host fetch; on remote
    TPU transports ``block_until_ready`` can return before execution drains);
  * ``ThroughputMeter`` -- steady-state items/sec measurement;
  * ``enable_nan_checks`` -- jit-level NaN debugging (jax.debug_nans).
"""

from __future__ import annotations

import contextlib
import time
import jax
import jax.numpy as jnp

annotate = jax.named_scope


@contextlib.contextmanager
def trace(log_dir: str, host_profile: bool = False):
    """Capture a device trace for the enclosed block into ``log_dir``."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> float:
    """Barrier on a pytree of device arrays; returns a checksum scalar."""
    leaves = [x for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "dtype")]
    if not leaves:
        return 0.0
    total = sum(jnp.sum(jnp.abs(leaf[(0,) * leaf.ndim])) for leaf in leaves)
    return float(total)


def enable_nan_checks(enable: bool = True) -> None:
    """Raise on NaNs produced inside jitted computations."""
    jax.config.update("jax_debug_nans", enable)


class ThroughputMeter:
    """Steady-state throughput: warm up, then time ``iters`` chained calls."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup

    def measure(self, fn, *args, iters: int = 10, items_per_call: int = 1):
        acc = None
        for _ in range(self.warmup):
            out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            acc = leaf.sum() if acc is None else acc + leaf.sum()
        float(acc)
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            acc = leaf.sum() if acc is None else acc + leaf.sum()
        float(acc)
        dt = (time.perf_counter() - t0) / iters
        return items_per_call / dt
