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
def trace(log_dir: str):
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


def op_stats(trace_dir: str, top: int = 0):
    """Per-op device self-time table from an xplane trace directory.

    Parses the ``framework_op_stats`` gviz-JSON table emitted by
    ``xprof.convert.raw_to_tool_data`` (NOT tensorboard_plugin_profile --
    protobuf clash in this environment).  Returns a list of dicts sorted by
    total device self-time, each with keys: op, type, occurrences,
    total_self_us, avg_self_us, flop_rate, bandwidth, bound_by.
    """
    import glob as _glob
    import json as _json

    from xprof.convert import raw_to_tool_data

    files = _glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        files, "framework_op_stats", {}
    )
    table = _json.loads(data.decode() if isinstance(data, bytes) else data)[0]
    cols = [c["id"] for c in table["cols"]]
    rows = []
    for r in table["rows"]:
        vals = dict(zip(cols, [c.get("v") if c else None for c in r["c"]]))
        if vals.get("host_or_device") != "Device":
            continue
        rows.append(
            dict(
                op=vals.get("operation"),
                type=vals.get("type"),
                occurrences=vals.get("occurrences"),
                total_self_us=float(vals.get("total_self_time") or 0.0),
                avg_self_us=float(vals.get("avg_self_time") or 0.0),
                flop_rate=vals.get("measured_flop_rate"),
                bandwidth=vals.get("measured_memory_bw"),
                bound_by=vals.get("bound_by"),
            )
        )
    rows.sort(key=lambda d: -d["total_self_us"])
    return rows[:top] if top else rows


class ThroughputMeter:
    """Steady-state throughput: warm up, then time ``iters`` chained calls.

    The chaining reduction is jitted ONCE and composed around ``fn``: an
    eager ``.sum()`` inside the timed loop would dispatch a fresh XLA
    computation per call through the remote compile service and corrupt
    the measurement (CLAUDE.md; removing exactly this pattern from
    bench.py changed the multimodal number from 8.4 to 14.2 clips/s).
    """

    def __init__(self, warmup: int = 3):
        self.warmup = warmup

    def measure(self, fn, *args, iters: int = 10, items_per_call: int = 1):
        @jax.jit
        def _step(acc, *a):
            out = fn(*a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return acc + jnp.sum(leaf.astype(jnp.float32))

        acc = jnp.float32(0.0)
        for _ in range(self.warmup):
            acc = _step(acc, *args)
        float(acc)
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for _ in range(iters):
            acc = _step(acc, *args)
        float(acc)  # single fetch = the completion barrier
        dt = (time.perf_counter() - t0) / iters
        return items_per_call / dt
