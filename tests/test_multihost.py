"""Multi-host helpers (parallel/multihost.py).

One host here, so the multi-process branches are certified by their
single-process equivalences plus monkeypatched process counts: on a real
pod only ``jax.process_count()`` changes, not the code-path shape.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec

from perceiverio_pytorch_tpu.parallel import (
    initialize_distributed,
    is_multihost,
    local_batch_size,
    make_mesh,
    shard_host_batch,
    sync_hosts,
)
from perceiverio_pytorch_tpu.parallel.mesh import DATA_AXIS


def test_initialize_distributed_is_noop_single_host(monkeypatch):
    """Without cluster env or explicit args nothing is initialized, so the
    same script runs unchanged on one host."""
    for k in (
        "TPU_WORKER_HOSTNAMES",
        "MEGASCALE_COORDINATOR_ADDRESS",
        "JAX_COORDINATOR_ADDRESS",
    ):
        monkeypatch.delenv(k, raising=False)
    assert initialize_distributed() is False
    assert not jax.distributed.is_initialized()
    assert is_multihost() is False
    sync_hosts()  # no-op, must not hang


def test_initialize_distributed_skips_when_already_initialized(monkeypatch):
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)
    # would raise inside jax.distributed.initialize if it were attempted
    assert initialize_distributed(coordinator_address="host:1234") is False


def test_local_batch_size():
    assert local_batch_size(16) == 16  # one process
    from perceiverio_pytorch_tpu.parallel import multihost

    real = jax.process_count
    try:
        jax.process_count = lambda: 4
        assert multihost.local_batch_size(16) == 4
        with pytest.raises(ValueError, match="not divisible"):
            multihost.local_batch_size(18)
    finally:
        jax.process_count = real


def test_shard_host_batch_matches_device_put_on_mesh():
    """Single-process shard_host_batch == device_put with the data-axis
    sharding, for a pytree batch, and lands sharded over the data axis."""
    mesh = make_mesh((8, 1))
    rng = np.random.RandomState(0)
    batch = {
        "x": rng.randn(16, 3).astype(np.float32),
        "y": rng.randint(0, 5, size=(16,)),
    }
    out = shard_host_batch(batch, mesh)
    ref = jax.device_put(batch, NamedSharding(mesh, PartitionSpec(DATA_AXIS)))
    for k in batch:
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(ref[k]))
        assert out[k].sharding.spec == PartitionSpec(DATA_AXIS)
        # genuinely distributed: each device holds 1/8 of the batch axis
        shard_rows = {s.data.shape[0] for s in out[k].addressable_shards}
        assert shard_rows == {2}

    # a custom spec passes through (replicated here)
    rep = shard_host_batch(batch["x"], mesh, spec=PartitionSpec())
    assert rep.sharding.spec == PartitionSpec()


def test_batch_iterator_shards_by_process(monkeypatch):
    """Two simulated processes with the same seed yield disjoint contiguous
    halves of every global batch; concatenated they equal the unsharded
    stream.  Ragged tails and non-divisible batches are rejected."""
    from perceiverio_pytorch_tpu.training.data import batch_iterator

    x = np.arange(48, dtype=np.float32).reshape(24, 2)
    y = np.arange(24)
    global_batches = list(
        batch_iterator((x, y), 8, shuffle=True, seed=7, epochs=2)
    )

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    shards = []
    for pid in (0, 1):
        monkeypatch.setattr(jax, "process_index", lambda pid=pid: pid)
        shards.append(
            list(
                batch_iterator(
                    (x, y), 8, shuffle=True, seed=7, epochs=2,
                    shard_by_process=True,
                )
            )
        )
    assert len(shards[0]) == len(global_batches)
    for (gx, gy), (ax, ay), (bx, by) in zip(global_batches, *shards):
        assert ax.shape == (4, 2) and bx.shape == (4, 2)
        np.testing.assert_array_equal(np.concatenate([ax, bx]), gx)
        np.testing.assert_array_equal(np.concatenate([ay, by]), gy)

    with pytest.raises(ValueError, match="not divisible"):
        next(batch_iterator((x,), 9, shard_by_process=True))
    with pytest.raises(ValueError, match="drop_remainder"):
        next(
            batch_iterator(
                (x,), 8, shard_by_process=True, drop_remainder=False
            )
        )


def test_prefetch_assembles_global_arrays_multiprocess(monkeypatch):
    """With process_count > 1, prefetch_to_device routes leaves through
    make_array_from_process_local_data instead of device_put."""
    from perceiverio_pytorch_tpu.training.data import prefetch_to_device

    mesh = make_mesh((8, 1))
    sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
    x = np.arange(32, dtype=np.float32).reshape(16, 2)

    calls = []
    real = jax.make_array_from_process_local_data

    def spy(s, leaf, *a, **kw):
        calls.append(leaf.shape)
        return real(s, leaf, *a, **kw)

    monkeypatch.setattr(jax, "make_array_from_process_local_data", spy)
    import perceiverio_pytorch_tpu.training.data as data_mod

    monkeypatch.setattr(
        data_mod.jax, "process_count", lambda: 2, raising=True
    )
    # process_count is monkeypatched but the data is still the full global
    # batch (single real process), so values must round-trip exactly.
    out = list(prefetch_to_device(iter([(x,)]), 2, sharding=sharding))
    assert calls == [(16, 2)]
    np.testing.assert_array_equal(np.asarray(out[0][0]), x)
