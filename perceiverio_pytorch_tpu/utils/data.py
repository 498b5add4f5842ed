"""Compatibility shim: the input pipeline lives in ``training.data``.

``prefetch_to_device`` here is the canonical threaded implementation
(async device_put from a background thread, optional mesh sharding);
``epoch_batches`` is the original single-epoch spelling of
``training.data.batch_iterator``.  Import from ``training`` in new code.
"""

from __future__ import annotations

from typing import Iterator

from perceiverio_pytorch_tpu.training.data import (  # noqa: F401
    batch_iterator,
    prefetch_to_device,
)


def epoch_batches(
    arrays,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    drop_remainder: bool = True,
) -> Iterator:
    """One epoch of batch tuples from same-length in-memory arrays."""
    return batch_iterator(
        arrays,
        batch_size,
        shuffle=shuffle,
        seed=seed,
        epochs=1,
        drop_remainder=drop_remainder,
    )
