"""File-backed datasets and a threaded decode loader.

The reference feeds hand-loaded tensors (its examples PIL-load one sample,
/root/reference/example_img_classify.py:41-60); ``batch_iterator`` covers
datasets that fit in host RAM.  This module is the third tier: datasets that
live on disk, decoded on demand by a thread pool while the TPU runs the
previous steps.

Design: a minimal map-style protocol (``__len__`` + ``__getitem__(i) ->
tuple of numpy fields``), one concrete dataset (``ImageFolderDataset``:
the standard ``root/<class>/*.png`` layout), and ``dataset_iterator`` which
shares ``batch_iterator``'s exact epoch/shuffle/``start_batch`` resume
semantics (same index stream, ``training.data._index_batches``) but fetches
items through a ``ThreadPoolExecutor`` with a bounded batch lookahead.
Decode runs in C (PIL) so Python threads genuinely overlap; device transfer
overlap is ``prefetch_to_device``'s job downstream:

    ds = ImageFolderDataset("/data/train", image_size=(224, 224))
    batches = dataset_iterator(ds, 64, shuffle=True, num_workers=8)
    trainer.fit(state, prefetch_to_device(batches, 2), ...)

Images are returned uint8 (channel-first, the reference's [C, H, W]
convention) -- ship uint8 to the device and normalize there; on this
transport fp32 payloads cost 4x the bandwidth for nothing
(PERFORMANCE.md, serving chain: 27.8 -> 49.2 req/s from this alone).
"""

from __future__ import annotations

import os
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional, Sequence, Tuple

import jax
import numpy as np

from perceiverio_pytorch_tpu.training.data import _index_batches

__all__ = ["ImageFolderDataset", "dataset_iterator"]

_IMAGE_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".gif")


class ImageFolderDataset:
    """``root/<class_name>/<image file>`` tree -> (uint8 [C,H,W], int label).

    Files and classes are enumerated in sorted order, so the index ->
    example mapping is deterministic across processes and runs (required
    for ``shard_by_process`` and exact resume).

    Args:
      root: dataset root; every subdirectory is a class.
      image_size: (H, W) after center-crop-resize (None: native size --
        only safe if all images match).
      classes: explicit class-name order (default: sorted subdirectories).
      transform: optional ``fn(uint8 HWC image) -> np.ndarray`` replacing
        the default center-crop-resize + CHW transpose.
    """

    def __init__(
        self,
        root: str,
        *,
        image_size: Optional[Tuple[int, int]] = (224, 224),
        classes: Optional[Sequence[str]] = None,
        transform: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    ):
        self.root = root
        if classes is None:
            classes = sorted(
                d for d in os.listdir(root)
                if os.path.isdir(os.path.join(root, d))
            )
        self.class_names = list(classes)
        if not self.class_names:
            raise ValueError(f"no class subdirectories under {root!r}")
        self._items = []
        for label, cls in enumerate(self.class_names):
            cdir = os.path.join(root, cls)
            for fname in sorted(os.listdir(cdir)):
                if fname.lower().endswith(_IMAGE_EXTENSIONS):
                    self._items.append((os.path.join(cdir, fname), label))
        if not self._items:
            raise ValueError(f"no image files under {root!r}")
        self.image_size = image_size
        self.transform = transform

    def __len__(self) -> int:
        return len(self._items)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        from PIL import Image

        path, label = self._items[i]
        img = np.asarray(Image.open(path).convert("RGB"), np.uint8)  # HWC
        if self.transform is not None:
            img = self.transform(img)
        else:
            if self.image_size is not None:
                h, w = img.shape[:2]
                m = min(h, w)
                top, left = (h - m) // 2, (w - m) // 2
                img = img[top : top + m, left : left + m]
                img = np.asarray(
                    Image.fromarray(img).resize(
                        (self.image_size[1], self.image_size[0]),
                        Image.BILINEAR,
                    ),
                    np.uint8,
                )
            img = np.transpose(img, (2, 0, 1))  # HWC -> CHW, ref convention
        return np.asarray(img), np.asarray(label, np.int32)


def dataset_iterator(
    dataset,
    batch_size: int,
    *,
    shuffle: bool = False,
    seed: int = 0,
    epochs: Optional[int] = 1,
    drop_remainder: bool = True,
    shard_by_process: bool = False,
    start_batch: int = 0,
    num_workers: int = 4,
    lookahead: int = 2,
) -> Iterator[tuple]:
    """Yield collated numpy batches from a map-style dataset.

    Same epoch/shuffle/resume contract as ``batch_iterator`` (the index
    stream is shared code): ``shuffle`` reshuffles per epoch deterministic
    in ``seed``; ``start_batch`` fast-forwards a resumed run to the exact
    data position; ``shard_by_process`` slices each global batch into this
    process's contiguous ``batch_size // process_count`` piece.

    ``num_workers`` threads decode items concurrently, ``lookahead`` whole
    batches ahead of the consumer (bounded memory); delivery order is
    deterministic regardless of thread timing.  ``num_workers=0`` decodes
    inline (debugging).
    """
    n = len(dataset)
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive; got {batch_size}")
    if start_batch < 0:
        raise ValueError(f"start_batch must be >= 0; got {start_batch}")
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

    indices = _index_batches(
        n,
        batch_size,
        shuffle=shuffle,
        seed=seed,
        epochs=epochs,
        drop_remainder=drop_remainder,
        start_batch=start_batch,
    )

    def _collate(items):
        fields = tuple(zip(*items))
        return tuple(np.stack(f) for f in fields)

    if num_workers <= 0:
        for take in indices:
            yield _collate([dataset[int(i)] for i in take[lo : min(hi, len(take))]])
        return

    executor = ThreadPoolExecutor(max_workers=num_workers)
    try:
        pending = deque()

        def _submit_next() -> bool:
            take = next(indices, None)
            if take is None:
                return False
            take = take[lo : min(hi, len(take))]
            pending.append([executor.submit(dataset.__getitem__, int(i))
                            for i in take])
            return True

        for _ in range(lookahead + 1):
            if not _submit_next():
                break
        while pending:
            futures = pending.popleft()
            batch = _collate([f.result() for f in futures])
            _submit_next()
            yield batch
    finally:
        executor.shutdown(wait=False, cancel_futures=True)
