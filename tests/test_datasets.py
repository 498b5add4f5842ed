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


# ---------------------------------------------------------------------------
# Per-family datasets: text/MLM, flow pairs, video clips
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def text_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    (root / "a.txt").write_text("abcdefghij" * 10)   # 100 bytes
    (root / "b.txt").write_text("KLMNO" * 7)          # 35 bytes
    return root


def test_text_file_dataset_windows(text_files):
    from perceiverio_pytorch_tpu.training import TextFileDataset
    from perceiverio_pytorch_tpu.utils.bytes_tokenizer import BytesTokenizer

    ds = TextFileDataset(str(text_files / "*.txt"), seq_len=32)
    # a.txt: 100 tokens -> 3 disjoint windows; b.txt: 35 -> 1; no straddle
    assert len(ds) == 4
    tok = BytesTokenizer()
    (win,) = ds[0]
    assert win.shape == (32,) and win.dtype == np.int32
    assert tok.to_string(win) == ("abcdefghij" * 10)[:32]
    (win3,) = ds[3]  # first window of b.txt, not a cross-file mix
    assert tok.to_string(win3) == ("KLMNO" * 7)[:32]

    overlapped = TextFileDataset(str(text_files / "a.txt"), seq_len=32,
                                 stride=16)
    assert len(overlapped) == 5  # starts 0,16,32,48,64
    with pytest.raises(ValueError, match="no window"):
        TextFileDataset(str(text_files / "b.txt"), seq_len=64)


def test_mlm_dataset_protocol(text_files):
    from perceiverio_pytorch_tpu.training import MLMDataset, TextFileDataset

    ds = MLMDataset(TextFileDataset(str(text_files / "a.txt"), seq_len=25),
                    mask_rate=0.2, seed=7)
    corrupted, targets, mask = ds[1]
    assert corrupted.shape == targets.shape == mask.shape == (25,)
    assert mask.any()
    np.testing.assert_array_equal(corrupted[mask], 3)          # MASK id
    np.testing.assert_array_equal(corrupted[~mask], targets[~mask])
    # static (deterministic) corruption: same item -> same mask
    c2, t2, m2 = ds[1]
    np.testing.assert_array_equal(corrupted, c2)
    np.testing.assert_array_equal(mask, m2)
    # different seed -> different mask (overwhelmingly)
    _, _, m_other = MLMDataset(ds.dataset, mask_rate=0.2, seed=8)[1]
    assert not np.array_equal(mask, m_other)
    # at least one position always masked, even at tiny rates
    _, _, m_tiny = MLMDataset(ds.dataset, mask_rate=1e-9)[0]
    assert m_tiny.sum() == 1


@pytest.fixture(scope="module")
def flow_scene(tmp_path_factory):
    from PIL import Image

    from perceiverio_pytorch_tpu.utils.flow_io import write_flo

    root = tmp_path_factory.mktemp("sintel") / "alley_1"
    (root / "frames").mkdir(parents=True)
    (root / "flow").mkdir()
    rng = np.random.RandomState(0)
    for i in range(1, 4):  # 3 frames -> 2 pairs
        img = rng.randint(0, 255, (20, 30, 3), np.uint8)
        Image.fromarray(img).save(root / "frames" / f"frame_{i:04d}.png")
    for i in range(1, 3):
        flow = rng.randn(20, 30, 2).astype(np.float32)
        write_flo(str(root / "flow" / f"frame_{i:04d}.flo"), flow)
    return root


def test_flow_pair_dataset(flow_scene):
    from perceiverio_pytorch_tpu.training import FlowPairDataset

    ds = FlowPairDataset(str(flow_scene))
    assert len(ds) == 2
    img1, img2, flow = ds[0]
    assert img1.shape == img2.shape == (3, 20, 30) and img1.dtype == np.uint8
    assert flow.shape == (2, 20, 30) and flow.dtype == np.float32
    # scene-tree scan finds the same scene one level down
    tree = FlowPairDataset(str(flow_scene.parent))
    assert len(tree) == 2
    np.testing.assert_array_equal(tree[0][0], img1)


def test_flow_pair_dataset_crop_and_augment(flow_scene):
    from PIL import Image

    from perceiverio_pytorch_tpu.training import FlowPairDataset

    ds = FlowPairDataset(str(flow_scene), crop_size=(8, 12))
    img1, img2, flow = ds[1]
    assert img1.shape == (3, 8, 12) and flow.shape == (2, 8, 12)
    # center crop content matches a direct slice of the source frame
    src = np.asarray(
        Image.open(flow_scene / "frames" / "frame_0002.png"), np.uint8
    )
    np.testing.assert_array_equal(
        img1, np.transpose(src[6:14, 9:21], (2, 0, 1))
    )
    aug = FlowPairDataset(str(flow_scene), crop_size=(8, 12), augment=True,
                          seed=1)
    a0 = aug[0]
    np.testing.assert_array_equal(a0[0], aug[0][0])  # deterministic in index
    with pytest.raises(ValueError, match="smaller than crop"):
        FlowPairDataset(str(flow_scene), crop_size=(64, 64))[0]


def test_flow_pair_dataset_missing_flow(flow_scene, tmp_path):
    import shutil

    from perceiverio_pytorch_tpu.training import FlowPairDataset

    scene = tmp_path / "scene"
    shutil.copytree(flow_scene, scene)
    (scene / "flow" / "frame_0002.flo").unlink()
    with pytest.raises(ValueError, match="missing ground truth"):
        FlowPairDataset(str(scene))
    ds = FlowPairDataset(str(scene), missing_flow="zeros")
    _, _, flow = ds[1]
    np.testing.assert_array_equal(flow, 0.0)


def test_video_clip_dataset(tmp_path):
    cv2 = pytest.importorskip("cv2")
    del cv2
    import json

    import scipy.io.wavfile

    from perceiverio_pytorch_tpu.training import VideoClipDataset
    from perceiverio_pytorch_tpu.utils.image import save_video

    rng = np.random.RandomState(0)
    (tmp_path / "5").mkdir()
    save_video(str(tmp_path / "5" / "a.avi"),
               rng.rand(4, 16, 16, 3).astype(np.float32))
    scipy.io.wavfile.write(
        str(tmp_path / "5" / "a.wav"), 48000,
        (rng.rand(300) * 2**14).astype(np.int16),
    )
    (tmp_path / "some_class").mkdir()
    save_video(str(tmp_path / "some_class" / "b.avi"),
               rng.rand(1, 16, 16, 3).astype(np.float32))  # short clip

    ds = VideoClipDataset(str(tmp_path), num_frames=2, image_size=(16, 16),
                          audio_samples_per_frame=128)
    assert len(ds) == 2
    video, audio, label = ds[0]
    assert video.shape == (2, 3, 16, 16) and video.dtype == np.uint8
    assert audio.shape == (256, 1) and audio.dtype == np.float32
    assert audio[:256].any()  # wav sidecar loaded (truncated to n_audio)
    assert int(label) == 5    # integer directory name
    video_b, audio_b, label_b = ds[1]
    # 1-frame clip pads by repeating the last frame; no wav -> silence
    np.testing.assert_array_equal(video_b[0], video_b[1])
    np.testing.assert_array_equal(audio_b, 0.0)
    assert int(label_b) == -1  # unresolvable name without class_names

    named = VideoClipDataset(
        str(tmp_path), num_frames=2, image_size=(16, 16),
        audio_samples_per_frame=128,
        class_names=["other", "some class"],
    )
    assert int(named[1][2]) == 1
    with open(tmp_path / "labels.json", "w") as f:
        json.dump({"a": 9}, f)
    mapped = VideoClipDataset(
        str(tmp_path), num_frames=2, image_size=(16, 16),
        audio_samples_per_frame=128,
        labels_file=str(tmp_path / "labels.json"),
    )
    assert int(mapped[0][2]) == 9
    # string labels-file values: underscore-style names normalize like
    # directory names (underscores -> spaces, lowercased)
    with open(tmp_path / "labels.json", "w") as f:
        json.dump({"a": "Some_Class"}, f)
    mapped_str = VideoClipDataset(
        str(tmp_path), num_frames=2, image_size=(16, 16),
        audio_samples_per_frame=128,
        class_names=["other", "some class"],
        labels_file=str(tmp_path / "labels.json"),
    )
    assert int(mapped_str[0][2]) == 1


def test_per_epoch_dynamic_masks_and_crops(text_files, flow_scene):
    """The getitem_at_epoch protocol: epoch 0 reproduces the historical
    static masks/crops bit-exactly, later epochs draw fresh ones, the
    iterator feeds the ABSOLUTE epoch (start_batch included) so resume is
    exact, and dynamic_masks=False restores the static behaviour."""
    from perceiverio_pytorch_tpu.training import (
        FlowPairDataset,
        MLMDataset,
        TextFileDataset,
        dataset_iterator,
    )

    base = TextFileDataset(str(text_files / "a.txt"), seq_len=20)
    dyn = MLMDataset(base, seed=5)
    static = MLMDataset(base, seed=5, dynamic_masks=False)

    # epoch 0 == __getitem__ == historical static masks
    np.testing.assert_array_equal(dyn.getitem_at_epoch(0, 0)[2], dyn[0][2])
    np.testing.assert_array_equal(dyn[0][2], static.getitem_at_epoch(0, 1)[2])
    # later epochs: fresh positions (targets unchanged)
    c0, t0, m0 = dyn.getitem_at_epoch(0, 0)
    c1, t1, m1 = dyn.getitem_at_epoch(0, 1)
    assert (m0 != m1).any()
    np.testing.assert_array_equal(t0, t1)
    # deterministic per (seed, epoch, index)
    np.testing.assert_array_equal(m1, dyn.getitem_at_epoch(0, 1)[2])

    # the iterator derives the epoch from the absolute batch counter:
    # a 2-epoch run's later batches equal a start_batch resume's first ones
    n_batches = len(base) // 2
    full = list(dataset_iterator(dyn, 2, epochs=2, num_workers=2))
    resumed = list(dataset_iterator(dyn, 2, epochs=2, num_workers=0,
                                    start_batch=n_batches))
    assert len(full) == 2 * n_batches and len(resumed) == n_batches
    for a, b in zip(full[n_batches:], resumed):
        for fa, fb in zip(a, b):
            np.testing.assert_array_equal(fa, fb)
    # and epoch-1 batches differ from epoch-0 batches in mask positions
    assert (full[0][2] != full[n_batches][2]).any()

    # FlowPairDataset: augmented crops move across epochs, epoch 0 stable
    flow = FlowPairDataset(str(flow_scene), crop_size=(8, 12), augment=True)
    a0 = flow.getitem_at_epoch(0, 0)
    np.testing.assert_array_equal(a0[0], flow[0][0])
    diffs = [
        (flow.getitem_at_epoch(0, e)[0] != a0[0]).any() for e in (1, 2, 3)
    ]
    assert any(diffs)  # some epoch picks a different crop origin


def test_family_datasets_through_iterator(flow_scene, text_files):
    """The new datasets collate through the shared threaded iterator."""
    from perceiverio_pytorch_tpu.training import (
        FlowPairDataset,
        MLMDataset,
        TextFileDataset,
        dataset_iterator,
    )

    flow_batches = list(dataset_iterator(
        FlowPairDataset(str(flow_scene), crop_size=(8, 12)), 2,
        num_workers=2,
    ))
    assert len(flow_batches) == 1
    i1, i2, fl = flow_batches[0]
    assert i1.shape == (2, 3, 8, 12) and fl.shape == (2, 2, 8, 12)

    mlm = MLMDataset(TextFileDataset(str(text_files / "a.txt"), seq_len=20))
    c, t, m = next(iter(dataset_iterator(mlm, 4, shuffle=True, seed=2,
                                         num_workers=2)))
    assert c.shape == t.shape == m.shape == (4, 20)
    assert m.dtype == bool
