"""Minimal input-pipeline utilities.

The reference has no data pipeline (examples read single media files);
these helpers cover the training story: host->device prefetch so input
transfer overlaps the previous step, optional mesh sharding, and a simple
epoch batcher over in-memory arrays.
"""

from __future__ import annotations

import collections
import itertools
from typing import Iterable, Iterator

import jax
import numpy as np


def prefetch_to_device(
    iterator: Iterable,
    size: int = 2,
    sharding=None,
) -> Iterator:
    """Prefetch ``size`` batches onto the device (or mesh sharding).

    Each batch is a pytree of arrays; transfer of batch N+1 overlaps the
    computation consuming batch N.
    """
    queue = collections.deque()

    def _put(batch):
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch
            )
        return jax.tree_util.tree_map(jax.device_put, batch)

    it = iter(iterator)
    for batch in itertools.islice(it, size):
        queue.append(_put(batch))
    while queue:
        yield queue.popleft()
        for batch in itertools.islice(it, 1):
            queue.append(_put(batch))


def epoch_batches(
    arrays,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    drop_remainder: bool = True,
) -> Iterator:
    """Yield batch tuples from same-length in-memory arrays."""
    arrays = tuple(np.asarray(a) for a in arrays)
    n = arrays[0].shape[0]
    order = np.arange(n)
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    end = n - (n % batch_size) if drop_remainder else n
    for start in range(0, end, batch_size):
        idx = order[start : start + batch_size]
        yield tuple(a[idx] for a in arrays)
