"""HBM sizing from the compiler, not from guesswork.

"What batch fits?" is the first production question on a 16 GB v5e chip
and the reference answers it by OOM-ing (torch's lazy allocator).  XLA
knows the exact buffer assignment at compile time, so we ask it: AOT-lower
the jitted function, compile, and read the ``CompiledMemoryStats`` — no
device execution, no allocation of the real batch.

Measured here (flagship ImageNet conv-prep forward, batch 4):
``peak_memory_in_bytes`` 293 MB = 205 MB arguments (params + batch)
+ 62 MB temporaries + code.  A remat-vs-no-remat A/B of the training
step shows up directly in ``temp_size_in_bytes`` — this is the tool the
round-3 "no-remat OOMs past batch 8" finding was chased with, packaged.

Costs one remote-compile RPC per call on this transport (~20-40 s for a
full-scale model, cached by the persistent compilation cache when
enabled) — cheap next to one OOM at step 40k.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict

import jax

__all__ = ["compiled_memory_stats", "hbm_headroom"]

# v5e: 16 GiB HBM per chip.
V5E_HBM_BYTES = 16 * 1024**3


def compiled_memory_stats(
    fn: Callable[..., Any], *example_args, donate_argnums=(), **jit_kwargs
) -> Dict[str, int]:
    """Compile ``fn`` for ``example_args`` and return its HBM budget.

    Args:
      fn: the function to size (NOT already jitted — it is jitted here so
        the lowering sees the real call signature).  Pass a train step,
        a forward, a serving call — anything jittable.
      *example_args: arrays or ShapeDtypeStructs; ``jax.eval_shape``-style
        abstract values are enough, no real data needed.
      donate_argnums / **jit_kwargs: forwarded to ``jax.jit`` — size the
        step EXACTLY as you will run it (donation changes peak memory:
        donated state buffers are reused for outputs).

    Returns:
      dict with ``argument_bytes`` (params + inputs resident for the call),
      ``output_bytes``, ``temp_bytes`` (activations/workspace — what remat
      shrinks), ``code_bytes`` (the executable), and ``peak_bytes`` (the
      compiler's high-water mark — compare against HBM).
    """
    jitted = jax.jit(fn, donate_argnums=donate_argnums, **jit_kwargs)
    stats = jitted.lower(*example_args).compile().memory_analysis()
    if stats is None:
        # "no data" must not masquerade as "uses 0 bytes" -- hbm_headroom
        # would turn it into a confident (and wrong) fits=True
        raise RuntimeError(
            "this backend exposes no compiled memory analysis; cannot size"
            " the program (TPU and CPU backends here both do)"
        )
    return {
        "argument_bytes": int(stats.argument_size_in_bytes),
        "output_bytes": int(stats.output_size_in_bytes),
        "temp_bytes": int(stats.temp_size_in_bytes),
        "code_bytes": int(stats.generated_code_size_in_bytes),
        "peak_bytes": int(stats.peak_memory_in_bytes),
    }


def hbm_headroom(
    fn: Callable[..., Any],
    *example_args,
    hbm_bytes: int = V5E_HBM_BYTES,
    **kwargs,
) -> Dict[str, Any]:
    """``compiled_memory_stats`` plus fit verdict against a chip's HBM.

    Returns the stats dict extended with ``hbm_bytes``, ``fits`` (bool) and
    ``headroom_bytes`` (negative = over budget by that much).  Note XLA
    reserves some HBM for infeed/runtime, so treat a headroom under ~5%
    of HBM as "does not fit in practice".
    """
    try:
        stats = compiled_memory_stats(fn, *example_args, **kwargs)
    except Exception as e:  # noqa: BLE001 -- compiler OOM is the answer
        # The TPU compiler REJECTS programs whose buffer assignment exceeds
        # HBM ("XLA:TPU compile permanent error. Ran out of memory in
        # memory space hbm. Used 28.87G of 15.75G...") -- for this
        # function that rejection IS the verdict, not a crash.  Measured
        # here: the classification batch-16 no-remat train step fails
        # exactly this way (the round-3 sweep's OOM).
        m = re.search(
            r"Ran out of memory in memory space hbm\.\s*Used\s*"
            r"([0-9.]+)([MG]) of", str(e)
        )
        if m is None:
            raise
        used = float(m.group(1)) * (1024**3 if m.group(2) == "G" else 1024**2)
        stats = {
            "argument_bytes": 0, "output_bytes": 0, "temp_bytes": 0,
            "code_bytes": 0, "peak_bytes": int(used),
        }
    stats["hbm_bytes"] = int(hbm_bytes)
    stats["headroom_bytes"] = int(hbm_bytes) - stats["peak_bytes"]
    stats["fits"] = stats["headroom_bytes"] > 0
    return stats
