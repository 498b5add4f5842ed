"""Parameter/activation partition rules (Megatron-style TP in GSPMD form).

Rules are keyed on flax param paths.  The classic transformer TP layout:
  * q/k/v projection kernels [in, out]: column-parallel -> shard ``out``
    (heads) over the model axis;
  * attention output projection ``final`` and MLP ``fc2`` kernels
    [hidden, out]: row-parallel -> shard ``hidden``; XLA inserts the
    all-reduce (psum over ICI) on the output;
  * MLP ``fc1`` [in, hidden]: column-parallel;
  * everything else (layer norms, position tables, embeddings, biases of
    row-parallel layers) replicated; biases of column-parallel layers are
    sharded with their outputs.

Because XLA GSPMD propagates shardings, annotating the params (+ the batch
on the data axis) is sufficient -- no hand-written collectives.
"""

from __future__ import annotations

from typing import Tuple

import jax
from flax.traverse_util import flatten_dict, unflatten_dict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from perceiverio_pytorch_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

_COLUMN_PARALLEL = ("proj_q", "proj_k", "proj_v", "fc1")
_ROW_PARALLEL = ("final", "fc2")


def param_partition_spec(path: Tuple[str, ...], value) -> P:
    """PartitionSpec for one parameter, by its flax path."""
    if len(path) < 2:
        return P()
    parent, leaf = path[-2], path[-1]
    if parent in _COLUMN_PARALLEL:
        if leaf == "kernel" and value.ndim == 2:
            return P(None, MODEL_AXIS)
        if leaf == "bias":
            return P(MODEL_AXIS)
    if parent in _ROW_PARALLEL:
        if leaf == "kernel" and value.ndim == 2:
            return P(MODEL_AXIS, None)
        # row-parallel bias replicated (added after the all-reduce)
    return P()


def fsdp_param_partition_spec(
    path: Tuple[str, ...], value, data_size: int, base: P = None
) -> P:
    """Compose ZeRO-3 (FSDP) sharding onto a base TP spec.

    The reference has no distributed training of any kind (SURVEY.md 2.3);
    FSDP is the TPU-native memory-scaling axis for data-parallel training:
    every >=2-D parameter gets its largest still-unsharded, divisible dim
    sharded over the DATA axis, so each replica HOLDS 1/data_size of the
    weights (and, with the train-state builder's out-sharding constraints,
    of the optimizer moments).  GSPMD inserts the all-gather before each
    use and the reduce-scatter on the grads -- no hand-written collectives.

    1-D params (biases, layer-norm scales) stay on their base spec: the
    per-use all-gather latency outweighs the trivial memory they hold.
    """
    base = base if base is not None else param_partition_spec(path, value)
    if value.ndim < 2 or data_size <= 1:
        return base
    spec = list(base) + [None] * (value.ndim - len(base))
    candidates = [
        d for d in range(value.ndim)
        if spec[d] is None
        and value.shape[d] > 0  # zero-size pads (e.g. pos_embs [1, 0])
        and value.shape[d] % data_size == 0
    ]
    if not candidates:
        return base
    best = max(candidates, key=lambda d: value.shape[d])
    spec[best] = DATA_AXIS
    return P(*spec)


def shard_variables(variables, mesh: Mesh, fsdp: bool = False):
    """Place a variables pytree on the mesh according to the TP rules
    (+ ZeRO-3 data-axis weight sharding with ``fsdp=True``)."""
    # single source of truth for the rule walk: variables_shardings
    return jax.tree_util.tree_map(
        jax.device_put, variables, variables_shardings(variables, mesh, fsdp=fsdp)
    )


def variables_shardings(variables, mesh: Mesh, fsdp: bool = False):
    """NamedSharding pytree matching ``variables`` (for jit in_shardings).

    ``fsdp=True`` composes ZeRO-3 weight sharding over the data axis onto
    the TP rules (fsdp_param_partition_spec).
    """
    data_size = mesh.shape.get(DATA_AXIS, 1)
    out = {}
    for collection, tree in variables.items():
        flat = flatten_dict(tree)
        new_flat = {}
        for path, value in flat.items():
            if collection == "params":
                spec = param_partition_spec(path, value)
                if fsdp:
                    spec = fsdp_param_partition_spec(
                        path, value, data_size, base=spec
                    )
            else:
                spec = P()
            new_flat[path] = NamedSharding(mesh, spec)
        out[collection] = unflatten_dict(new_flat)
    return out


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
