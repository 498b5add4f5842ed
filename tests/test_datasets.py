"""File-backed datasets + threaded loader (training/datasets.py)."""

import numpy as np
import pytest

from perceiverio_pytorch_tpu.training import (
    ImageFolderDataset,
    batch_iterator,
    dataset_iterator,
)


@pytest.fixture(scope="module")
def image_tree(tmp_path_factory):
    """2 classes x 7 images of distinct solid colors, 12x10 px."""
    from PIL import Image

    root = tmp_path_factory.mktemp("imgs")
    k = 0
    for cls in ["cats", "dogs"]:
        d = root / cls
        d.mkdir()
        for i in range(7):
            arr = np.full((12, 10, 3), k, np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.png")
            k += 1
    return root


def test_image_folder_dataset_basics(image_tree):
    ds = ImageFolderDataset(str(image_tree), image_size=(8, 8))
    assert len(ds) == 14
    assert ds.class_names == ["cats", "dogs"]
    img, label = ds[0]
    assert img.shape == (3, 8, 8) and img.dtype == np.uint8
    assert int(label) == 0
    img, label = ds[13]
    assert int(label) == 1
    # solid-color images survive crop+resize exactly -> identity check
    assert int(img[0, 0, 0]) == 13


def test_threaded_matches_serial_order(image_tree):
    ds = ImageFolderDataset(str(image_tree), image_size=(8, 8))
    serial = list(dataset_iterator(ds, 4, shuffle=True, seed=3, epochs=2,
                                   num_workers=0))
    threaded = list(dataset_iterator(ds, 4, shuffle=True, seed=3, epochs=2,
                                     num_workers=3, lookahead=2))
    assert len(serial) == len(threaded) == 6  # 14//4 = 3 batches x 2 epochs
    for (ia, la), (ib, lb) in zip(serial, threaded):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(la, lb)


def test_order_matches_batch_iterator_semantics(image_tree):
    """dataset_iterator and batch_iterator share the index stream: the same
    seed must produce the same example order."""
    ds = ImageFolderDataset(str(image_tree), image_size=(8, 8))
    # identity of each image is its solid color == its global sorted index
    colors = [
        int(dataset_iterator(ds, 1, num_workers=0).__next__()[0][0, 0, 0, 0])
        for _ in range(1)
    ]
    assert colors[0] == 0
    ref = list(batch_iterator((np.arange(14),), 4, shuffle=True, seed=11))
    got = list(dataset_iterator(ds, 4, shuffle=True, seed=11, num_workers=2))
    for (ref_idx,), (imgs, labels) in zip(ref, got):
        np.testing.assert_array_equal(imgs[:, 0, 0, 0].astype(np.int64),
                                      ref_idx)


def test_start_batch_resume_equivalence(image_tree):
    ds = ImageFolderDataset(str(image_tree), image_size=(8, 8))
    full = list(dataset_iterator(ds, 4, shuffle=True, seed=5, epochs=3,
                                 num_workers=2))
    resumed = list(dataset_iterator(ds, 4, shuffle=True, seed=5, epochs=3,
                                    start_batch=4, num_workers=2))
    assert len(resumed) == len(full) - 4
    for (ia, la), (ib, lb) in zip(full[4:], resumed):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(la, lb)


def test_transform_override_and_validation(image_tree, tmp_path):
    ds = ImageFolderDataset(
        str(image_tree), transform=lambda img: img.astype(np.float32) / 255.0
    )
    img, _ = ds[3]
    assert img.dtype == np.float32 and img.shape == (12, 10, 3)

    (tmp_path / "empty_class").mkdir()
    with pytest.raises(ValueError, match="no image files"):
        ImageFolderDataset(str(tmp_path))
    with pytest.raises(ValueError, match="no class subdirectories"):
        ImageFolderDataset(str(tmp_path / "empty_class"))


def test_prefetch_compose_and_exception_propagation(image_tree):
    from perceiverio_pytorch_tpu.training import prefetch_to_device

    ds = ImageFolderDataset(str(image_tree), image_size=(8, 8))
    got = list(prefetch_to_device(
        dataset_iterator(ds, 4, num_workers=2), 2
    ))
    assert len(got) == 3 and got[0][0].shape == (4, 3, 8, 8)

    class Broken(ImageFolderDataset):
        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("corrupt file")
            return super().__getitem__(i)

    broken = Broken(str(image_tree), image_size=(8, 8))
    with pytest.raises(RuntimeError, match="corrupt file"):
        list(dataset_iterator(broken, 4, num_workers=2))
