"""Multi-host (multi-process) SPMD support.

The reference is strictly single-device (SURVEY.md 2.3); this framework
already scales over one host's chips via ``jax.sharding.Mesh`` + GSPMD
(parallel/mesh.py).  A TPU pod slice spans several hosts, one JAX process
per host, and three things change:

  * the runtime must be wired together once per process
    (``initialize_distributed``);
  * ``jax.devices()`` becomes GLOBAL while each process can only feed its
    own chips, so host batches must be assembled into global arrays
    (``shard_host_batch`` / ``local_batch_size``);
  * everything else — ``make_mesh`` over the global devices, the GSPMD
    train step, Orbax checkpointing — already operates on global arrays
    and works unchanged.

Single-process behaviour of every helper is the identity of the
single-host path, so the same training script runs anywhere.  On this
one-host environment the multi-process paths are exercised by the
single-process equivalences in tests/test_multihost.py (a real pod changes
process_count, not the code path shape).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from perceiverio_pytorch_tpu.parallel.mesh import DATA_AXIS

__all__ = [
    "initialize_distributed",
    "is_multihost",
    "local_batch_size",
    "shard_host_batch",
    "sync_hosts",
]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> bool:
    """Wire this process into the global JAX runtime; returns True if it did.

    On TPU pod VMs ``jax.distributed.initialize()`` auto-detects everything
    from the metadata server, so call this with no arguments.  Explicit
    coordinator/process arguments serve CPU/GPU clusters and tests.  The
    call is skipped — returning False — when the runtime is already
    initialized or when nothing indicates a multi-process launch (no
    arguments given and no TPU/cluster environment detected), so scripts
    can call it unconditionally and still run single-host.
    """
    if jax.distributed.is_initialized():
        return False
    explicit = coordinator_address is not None or num_processes is not None
    if not explicit:
        import os

        pod = any(
            os.environ.get(k)
            for k in (
                "TPU_WORKER_HOSTNAMES",  # multi-host TPU pod slice
                "MEGASCALE_COORDINATOR_ADDRESS",  # multislice
                "JAX_COORDINATOR_ADDRESS",
            )
        )
        if not pod:
            return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    return True


def is_multihost() -> bool:
    """True when more than one JAX process shares the runtime."""
    return jax.process_count() > 1


def local_batch_size(global_batch_size: int) -> int:
    """Examples this process must feed per global batch.

    Every process supplies an equal contiguous shard of the global batch
    (the assembly convention of ``shard_host_batch``); the global size must
    divide evenly — ragged per-host batches would break static shapes.
    """
    n = jax.process_count()
    if global_batch_size % n != 0:
        raise ValueError(
            f"global batch {global_batch_size} is not divisible by the"
            f" process count {n}"
        )
    return global_batch_size // n


def shard_host_batch(
    batch: Any,
    mesh: Mesh,
    *,
    spec: Optional[PartitionSpec] = None,
) -> Any:
    """Assemble per-process host data into global arrays on the mesh.

    Each leaf of ``batch`` is this process's local examples (leading axis =
    ``local_batch_size(global)``); the result is a global ``jax.Array``
    sharded by ``spec`` (default: batch axis over the mesh data axis,
    matching ``parallel.sharding.batch_sharding``), ready for the GSPMD
    train step.  With one process this is exactly
    ``jax.device_put(batch, NamedSharding(mesh, spec))``.
    """
    if spec is None:
        spec = PartitionSpec(DATA_AXIS)
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree_util.tree_map(
        lambda leaf: jax.make_array_from_process_local_data(sharding, leaf),
        batch,
    )


def sync_hosts(name: str = "sync_hosts") -> None:
    """Barrier across all processes (no-op single-process).

    Use around non-SPMD host side effects — e.g. after ``Trainer.fit`` so
    no process deletes/moves a checkpoint directory another process is
    still writing.
    """
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
