"""Host-side input pipeline: batching and async device prefetch.

The reference is inference-only and feeds tensors by hand (SURVEY.md 4);
a training framework needs the host input path to overlap with device
compute.  On TPU the recipe is: produce numpy batches on the host, issue
``jax.device_put`` from a background thread a few batches ahead of the
training loop, and let the async dispatch overlap the PCIe/ICI transfer
with the previous step's compute.  ``prefetch_to_device`` is that recipe;
``batch_iterator`` is the minimal epoch/shuffle batcher that feeds it.

Both compose with the mesh-sharded training path: pass
``parallel.sharding.batch_sharding(mesh)`` (or any ``jax.sharding.Sharding``,
or a pytree of them matching the batch structure) as ``sharding`` and each
batch lands on the mesh already laid out over the data axis — the train
step then consumes it without a second all-gather/reshard.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator, Optional, Sequence

import jax
import numpy as np

__all__ = ["batch_iterator", "prefetch_to_device"]


def _index_batches(
    n: int,
    batch_size: int,
    *,
    shuffle: bool,
    seed: int,
    epochs: Optional[int],
    drop_remainder: bool,
    start_batch: int,
) -> Iterator[np.ndarray]:
    """The shared epoch/shuffle/resume index stream: yields the GLOBAL index
    array of every batch.  ``batch_iterator`` (in-memory arrays) and
    ``training.datasets.dataset_iterator`` (file-backed) both consume this,
    so their data order, reshuffling and ``start_batch`` fast-forward
    semantics are identical by construction."""
    rng = np.random.default_rng(seed)
    if drop_remainder and n < batch_size:
        # would yield zero batches per epoch -- with epochs=None that is an
        # infinite empty generator (a hang at the first next()), so fail loud
        raise ValueError(
            f"dataset has {n} examples but batch_size={batch_size} with"
            " drop_remainder=True yields no batches; shrink the batch or"
            " pass drop_remainder=False"
        )
    epoch = 0
    to_skip = start_batch
    while epochs is None or epoch < epochs:
        idx = rng.permutation(n) if shuffle else np.arange(n)
        stop = n - (n % batch_size) if drop_remainder else n
        for start in range(0, stop, batch_size):
            if to_skip > 0:
                to_skip -= 1
                continue
            yield idx[start : min(start + batch_size, stop)]
        epoch += 1


def batch_iterator(
    arrays: Sequence[np.ndarray],
    batch_size: int,
    *,
    shuffle: bool = False,
    seed: int = 0,
    epochs: Optional[int] = 1,
    drop_remainder: bool = True,
    shard_by_process: bool = False,
    start_batch: int = 0,
) -> Iterator[tuple]:
    """Yield tuples of aligned ``batch_size`` slices from host arrays.

    Args:
      arrays: equal-length arrays (e.g. ``(images, labels)``); each yielded
        batch is a tuple of matching slices, ready for ``Trainer.fit``.
      shuffle: reshuffle indices every epoch (deterministic in ``seed``).
      epochs: number of passes; ``None`` repeats forever (bound the loop
        with ``Trainer.fit(num_steps=...)``).
      drop_remainder: drop the short tail batch so every batch has a static
        shape — one XLA compilation instead of one per tail size.  Set
        False only for host-side consumers (eval loops that tolerate a
        recompile).
      shard_by_process: multi-host pods.  ``batch_size`` is the GLOBAL
        batch; each process yields its own contiguous
        ``batch_size // process_count`` slice of every global batch —
        disjoint across processes because the epoch permutation is
        deterministic in ``seed`` (all hosts must hold the same ``arrays``
        and pass the same ``seed``; datasets too large for that should
        feed per-host files instead).  Feed the slices through
        ``parallel.shard_host_batch`` / ``Trainer(prefetch=...)`` to
        assemble global arrays.  Contiguous-slice order matches the
        default mesh construction over ``jax.devices()`` (process-major).
      start_batch: skip this many leading batches, reproducing the exact
        per-epoch shuffles along the way -- a resumed run
        (``fit(resume=True)``) that passes the restored step here sees the
        identical data order an uninterrupted run would have (the skip is
        index arithmetic, no array slicing; epoch boundaries handled).
    """
    arrays = tuple(np.asarray(a) for a in arrays)
    n = len(arrays[0])
    for a in arrays[1:]:
        if len(a) != n:
            raise ValueError(
                f"batch_iterator arrays must be equal length; got {len(a)} != {n}"
            )
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive; got {batch_size}")
    lo, hi = 0, batch_size
    if shard_by_process:
        if not drop_remainder:
            raise ValueError(
                "shard_by_process requires drop_remainder=True: a ragged"
                " tail batch cannot be split evenly across processes"
            )
        n_proc = jax.process_count()
        if batch_size % n_proc != 0:
            raise ValueError(
                f"global batch {batch_size} is not divisible by the process"
                f" count {n_proc}"
            )
        local = batch_size // n_proc
        lo = jax.process_index() * local
        hi = lo + local
    if start_batch < 0:
        raise ValueError(f"start_batch must be >= 0; got {start_batch}")
    for take in _index_batches(
        n,
        batch_size,
        shuffle=shuffle,
        seed=seed,
        epochs=epochs,
        drop_remainder=drop_remainder,
        start_batch=start_batch,
    ):
        yield tuple(a[take[lo : min(hi, len(take))]] for a in arrays)


class _Stop:
    pass


class _Raised:
    def __init__(self, exc: BaseException):
        self.exc = exc


def prefetch_to_device(
    batches: Iterable[Any],
    size: int = 2,
    *,
    sharding: Optional[Any] = None,
) -> Iterator[Any]:
    """Iterate ``batches`` with up to ``size`` batches already on device.

    A daemon thread pulls from the source iterator and issues
    ``jax.device_put`` (async on TPU) into a bounded queue, so the host
    input path — file reads, augmentation, the transfer itself — runs
    concurrently with the device executing the current step.  ``size=2``
    (double buffering) is enough to hide the transfer; larger only pays
    when individual host batches are slow and bursty.

    Args:
      sharding: optional ``jax.sharding.Sharding`` applied to every array
        leaf (e.g. ``batch_sharding(mesh)`` to land batches sharded over
        the mesh data axis), or a pytree of shardings matching each batch's
        structure.  ``None`` puts on the default device.

    The source iterator's exception (if any) is re-raised at the consuming
    site.  The thread stops when the source is exhausted or the consumer
    drops the iterator.
    """
    if size < 1:
        raise ValueError(f"prefetch size must be >= 1; got {size}")

    if sharding is None:
        _put = jax.device_put
    elif jax.process_count() > 1:
        # Multi-host: each process holds only its local examples; assemble
        # them into global arrays instead of device_put (which would demand
        # globally-addressable data).
        from jax.sharding import Sharding

        def _put(batch):
            if isinstance(sharding, Sharding):
                return jax.tree_util.tree_map(
                    lambda leaf: jax.make_array_from_process_local_data(
                        sharding, leaf
                    ),
                    batch,
                )
            return jax.tree_util.tree_map(
                lambda leaf, s: jax.make_array_from_process_local_data(s, leaf),
                batch,
                sharding,
            )
    else:
        def _put(batch):
            return jax.device_put(batch, sharding)

    q: "queue.Queue" = queue.Queue(maxsize=size)
    done = threading.Event()

    def _put_until_done(item) -> bool:
        """Timed put that gives up once the consumer is gone (the queue may
        be full forever after the generator is dropped)."""
        while not done.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _worker():
        try:
            for batch in batches:
                if not _put_until_done(_put(batch)):
                    return
            _put_until_done(_Stop())
        except BaseException as e:  # re-raised on the consumer thread
            _put_until_done(_Raised(e))

    thread = threading.Thread(target=_worker, daemon=True, name="prefetch_to_device")
    thread.start()

    try:
        while True:
            item = q.get()
            if isinstance(item, _Stop):
                return
            if isinstance(item, _Raised):
                raise item.exc
            yield item
    finally:
        done.set()
