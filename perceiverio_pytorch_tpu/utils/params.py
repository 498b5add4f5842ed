"""Parameter pytree utilities."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype=jnp.bfloat16):
    """Cast floating-point leaves of a pytree to ``dtype``.

    For inference, storing weights in bf16 halves HBM weight traffic; flax
    modules with a bf16 compute dtype then consume them without a cast, and
    fp32-normalisation layers upcast their (small) scale/bias vectors.
    """

    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)


def cast_variables_for_inference(variables, dtype=jnp.bfloat16):
    """Cast 'params' to ``dtype``; keep auxiliary collections (e.g. BatchNorm
    batch_stats) in fp32 for stable normalisation."""
    out = {}
    for collection, tree in variables.items():
        out[collection] = cast_floating(tree, dtype) if collection == "params" else tree
    return out
