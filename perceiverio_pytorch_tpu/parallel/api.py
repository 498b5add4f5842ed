"""High-level SPMD inference helpers.

``make_data_parallel_apply`` builds a jitted forward with replicated (or
TP-sharded) params and the batch sharded over the mesh's data axis -- the
idiomatic way to serve any of the model zoo across chips.  Used by
FlowInference to spread tile batches across a mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from perceiverio_pytorch_tpu.parallel.sharding import (
    batch_sharding,
    variables_shardings,
)


def make_data_parallel_apply(model, mesh: Mesh, tensor_parallel: bool = False):
    """Jitted ``fn(variables, *batch_arrays)`` with DP batch (+ optional TP).

    Args:
      model: a linen module whose ``apply(variables, *args)`` is the forward.
      mesh: device mesh with a ``data`` axis (and ``model`` if TP).
      tensor_parallel: shard attention/MLP kernels over the model axis too.

    Returns:
      (fn, place): call ``place(variables, *batch)`` to put arrays on the
      mesh, then ``fn(variables, *batch)``.  Batch arrays must have a leading
      axis divisible by the data-axis size.
    """
    b_sh = batch_sharding(mesh)

    def place(variables, *batch):
        if tensor_parallel:
            v_sh = variables_shardings(variables, mesh)
            variables = jax.tree_util.tree_map(
                lambda v, s: jax.device_put(v, s), variables, v_sh
            )
        else:
            variables = jax.device_put(variables, NamedSharding(mesh, P()))
        batch = tuple(jax.device_put(x, b_sh) for x in batch)
        return (variables,) + batch

    fn = jax.jit(
        model.apply,
        in_shardings=None,  # inferred from placed arguments
    )
    return fn, place


def pad_batch_to_multiple(array, multiple: int, axis: int = 0):
    """Pad the leading axis to a multiple (for even DP sharding).

    Returns (padded_array, original_size).
    """
    size = array.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return array, size
    pad_width = [(0, 0)] * array.ndim
    pad_width[axis] = (0, target - size)
    return np.pad(np.asarray(array), pad_width), size
