"""Ahead-of-time export for deployment (jax.export / StableHLO).

The reference deploys by shipping the Python model code plus a pickled
``state_dict`` and re-running eager PyTorch (/root/reference/README.md:38-44,
utils/utils.py:25-40).  The TPU-native deployment unit is a compiled
artifact instead: ``jax.export`` serializes the traced computation
(StableHLO + calling convention) to bytes that a serving process can load
and execute with ONLY jax and the weights -- no model code, no flax, no
framework import, and no re-tracing at startup.

Typical flow::

    model = ClassificationPerceiver(policy=PERFORMANCE)
    blob = export_apply(model.apply, variables, example_img,
                        batch_polymorphic=True)
    Path("model.stablehlo").write_bytes(blob)

    # -- in the serving process (only needs jax) --
    serve = load_exported(Path("model.stablehlo").read_bytes())
    logits = serve(variables, batch_of_any_size)

Notes:
  * The first positional argument is conventionally the variables pytree;
    weights stay an argument (not baked into the artifact) so one artifact
    serves any checkpoint of the same architecture.
  * ``batch_polymorphic=True`` exports with a symbolic leading batch dim on
    every non-variables argument, so one artifact serves any batch size.
    Pallas kernels specialize on shapes; flash-attention sites only depend
    on the token axes, which stay static here, but if a config trips a
    symbolic-shape limitation export with a fixed batch instead.
  * ``platforms`` pins the target ("tpu", "cpu", ...); the default is the
    exporting process's backend.  A CPU process can build TPU artifacts by
    passing ``platforms=("tpu",)``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
from jax import export as jax_export


def export_apply(
    apply_fn: Callable[..., Any],
    variables: Any,
    *example_args: Any,
    batch_polymorphic: bool = False,
    platforms: Optional[Sequence[str]] = None,
    **static_kwargs: Any,
) -> bytes:
    """Serialize ``apply_fn(variables, *args, **static_kwargs)`` to bytes.

    Args:
      apply_fn: typically ``model.apply`` (any jit-compatible callable).
      variables: the weights pytree; becomes the artifact's first argument.
      *example_args: example inputs fixing shapes/dtypes (and rank, when
        ``batch_polymorphic``).
      batch_polymorphic: export with a symbolic leading dim shared by all
        example args, so the artifact accepts any batch size.
      platforms: lowering platforms (default: this process's backend).
      **static_kwargs: closed over (static) keyword arguments, e.g.
        ``deterministic=True`` or a subsampling spec.
    """
    fn = jax.jit(lambda v, *a: apply_fn(v, *a, **static_kwargs))
    if isinstance(platforms, str):
        # tuple("tpu") would become ('t','p','u') -- accept the natural
        # single-string spelling
        platforms = (platforms,)
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    if batch_polymorphic:
        specs = jax_export.symbolic_args_specs(
            (variables, *example_args),
            # variables keep concrete shapes; batch dim "b" on the inputs
            shapes_specs=(None,) + ("b, ...",) * len(example_args),
        )
        exported = jax_export.export(fn, **kwargs)(*specs)
    else:
        exported = jax_export.export(fn, **kwargs)(variables, *example_args)
    return bytes(exported.serialize())


def load_exported(blob: bytes) -> Callable[..., Any]:
    """Deserialize an ``export_apply`` artifact into ``fn(variables, *args)``.

    The returned callable runs the embedded StableHLO under jit; it needs
    only jax at call time (the model code never imports).
    """
    exported = jax_export.deserialize(blob)
    return exported.call
