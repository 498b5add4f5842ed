"""Persistent XLA compilation cache.

Full-scale Perceiver compiles are expensive (the flow forward is minutes
even on a direct libtpu, and far worse through a remote compile service);
every process restart — serving rollouts, preempted training jobs resuming,
bench reruns — pays it again.  XLA ships a persistent disk cache keyed on
the HLO + compile options + platform; this helper turns it on in one line.

    from perceiverio_pytorch_tpu.utils.compilation_cache import (
        enable_compilation_cache)
    enable_compilation_cache()          # before the first jit dispatch

Measured here (v5e via remote compile): a model whose first-process
jit(init)+jit(forward) takes 7.6 s starts in 1.3 s in the next process;
the saving scales with compile time (the full-scale models are the point).
Call it before anything compiles — entries are written as compiles finish,
so a warm process also back-fills the cache for future ones.
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = [
    "add_cache_arg",
    "enable_cache_if_requested",
    "enable_compilation_cache",
]


def enable_compilation_cache(
    path: Optional[str] = None,
    *,
    min_compile_time_secs: float = 1.0,
) -> str:
    """Enable the on-disk compilation cache; returns the directory used.

    Args:
      path: cache directory (created if missing).  Defaults to
        ``$PERCEIVER_CACHE_DIR`` or ``~/.cache/perceiverio_pytorch_tpu/xla``.
      min_compile_time_secs: only persist computations that took at least
        this long to compile (keeps trivial dispatches from littering the
        directory; set 0.0 to cache everything).
    """
    import jax

    path = (
        path
        or os.environ.get("PERCEIVER_CACHE_DIR")
        or os.path.expanduser("~/.cache/perceiverio_pytorch_tpu/xla")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
    )
    if min_compile_time_secs <= 0.0:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path


def add_cache_arg(parser) -> None:
    """Add the shared ``--cache-dir`` flag to an argparse parser (the
    demos/serve scripts all expose the cache the same way)."""
    parser.add_argument(
        "--cache-dir",
        default=None,
        help="persistent XLA compilation cache (fast restart after"
        " preemption/resume; full-scale MLM measured 39 s -> 7.1 s)",
    )


def enable_cache_if_requested(args) -> Optional[str]:
    """Enable the cache when ``args.cache_dir`` is set; returns the dir."""
    cache_dir = getattr(args, "cache_dir", None)
    if cache_dir:
        return enable_compilation_cache(cache_dir)
    return None
