"""Smoke tests for the per-family training demos (examples/train_*.py).

Each example's tiny default config must run a couple of optimizer steps end
to end on CPU: model init, loss wiring, Trainer loop, metrics JSONL.  The
--full-scale paths are exercised on TPU hardware (PERFORMANCE.md); here we
certify the code path the docs tell users to start from.
"""

import importlib.util
import json
import os

import pytest

_EXAMPLES = os.path.join(os.path.dirname(__file__), os.pardir, "examples")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_EXAMPLES, name + ".py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _read_metrics(path):
    assert os.path.exists(path), f"missing metrics file {path}"
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_train_mlm_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    mod = _load("train_mlm")
    mod.main(steps=2, batch_size=2, seq_len=64)
    rows = _read_metrics("mlm_metrics.jsonl")
    assert any("loss" in r for r in rows)


def test_train_flow_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    mod = _load("train_flow")
    state = mod.main(steps=2, batch_size=2)
    assert int(state.step) == 2
    _read_metrics("flow_metrics.jsonl")


def test_train_classification_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    mod = _load("train_classification")
    mod.main(steps=2, batch_size=4)
    rows = _read_metrics("classification_metrics.jsonl")
    assert any("loss" in r for r in rows)


def test_train_multimodal_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    mod = _load("train_multimodal")
    state = mod.main(steps=2, batch_size=1, n_chunks=2)
    assert int(state.step) == 2
    _read_metrics("multimodal_metrics.jsonl")


def test_evaluate_classification_smoke(tmp_path, monkeypatch):
    """The eval harness end to end on a real (tmp) image tree: train a few
    steps via --data-dir, checkpoint, evaluate the checkpoint -- accuracy on
    the trivially separable color classes must beat chance."""
    import numpy as np
    from PIL import Image

    rng = np.random.RandomState(0)
    for ci, cls in enumerate(["r", "g", "b"]):
        d = tmp_path / "data" / cls
        d.mkdir(parents=True)
        for i in range(12):
            arr = (rng.rand(36, 36, 3) * 60).astype(np.uint8)
            arr[..., ci] = np.clip(arr[..., ci].astype(np.int32) + 160, 0, 255)
            Image.fromarray(arr).save(d / f"i{i}.png")

    monkeypatch.chdir(tmp_path)
    train = _load("train_classification")
    train.main(steps=40, batch_size=8, data_dir=str(tmp_path / "data"),
               checkpoint_dir=str(tmp_path / "ck"))
    from perceiverio_pytorch_tpu.training.checkpoint import latest_checkpoint

    ck = latest_checkpoint(str(tmp_path / "ck"))
    assert ck is not None
    ev = _load("evaluate_classification")
    result = ev.main(data_dir=str(tmp_path / "data"), batch_size=8,
                     checkpoint=ck)
    assert result["images"] == 32
    assert result["top1"] > 0.6
    rows = _read_metrics("classification_metrics.jsonl")
    # the held-out split is scored during training (BN eval pathway)
    assert any("eval_top1" in r for r in rows)


def test_train_flow_from_files_smoke(tmp_path, monkeypatch):
    """train_flow --data-dir: Sintel-style scene -> uint8 crops -> steps."""
    import numpy as np
    from PIL import Image

    from perceiverio_pytorch_tpu.utils.flow_io import write_flo

    scene = tmp_path / "data" / "scene_a"
    (scene / "frames").mkdir(parents=True)
    (scene / "flow").mkdir()
    rng = np.random.RandomState(0)
    for i in range(1, 5):  # 4 frames -> 3 pairs
        Image.fromarray(rng.randint(0, 255, (40, 56, 3), np.uint8)).save(
            scene / "frames" / f"frame_{i:04d}.png"
        )
    for i in range(1, 4):
        write_flo(str(scene / "flow" / f"frame_{i:04d}.flo"),
                  rng.randn(40, 56, 2).astype(np.float32))

    monkeypatch.chdir(tmp_path)
    mod = _load("train_flow")
    state = mod.main(steps=2, batch_size=2, data_dir=str(tmp_path / "data"))
    assert int(state.step) == 2
    rows = _read_metrics("flow_metrics.jsonl")
    assert all(np.isfinite(r["loss"]) for r in rows if "loss" in r)
    # a held-out pair is scored during training (center crop, no augment)
    assert any("eval_epe" in r for r in rows)


def test_train_mlm_from_text_smoke(tmp_path, monkeypatch):
    """train_mlm --text-file: byte windows + static MLM corruption, with a
    held-out eval split scored by the Trainer's eval_fn."""
    import numpy as np

    corpus = tmp_path / "corpus.txt"
    corpus.write_text("the quick brown fox jumps over the lazy dog. " * 40)

    monkeypatch.chdir(tmp_path)
    mod = _load("train_mlm")
    mod.main(steps=2, batch_size=2, seq_len=64, text_file=str(corpus))
    rows = _read_metrics("mlm_metrics.jsonl")
    assert any("loss" in r for r in rows)
    assert any("eval_loss" in r for r in rows)  # held-out windows scored
    assert all(np.isfinite(r["loss"]) for r in rows if "loss" in r)


def test_train_multimodal_from_clips_smoke(tmp_path, monkeypatch):
    """train_multimodal --data-dir: real clip decode incl. an unlabeled
    clip (label -1 masked out of the CE)."""
    cv2 = pytest.importorskip("cv2")
    del cv2
    import numpy as np
    import scipy.io.wavfile

    from perceiverio_pytorch_tpu.utils.image import save_video

    rng = np.random.RandomState(0)
    d = tmp_path / "data" / "7"
    d.mkdir(parents=True)
    save_video(str(d / "a.avi"), rng.rand(2, 16, 16, 3).astype(np.float32))
    scipy.io.wavfile.write(str(d / "a.wav"), 48000,
                           (rng.rand(300) * 2**14).astype(np.int16))
    u = tmp_path / "data" / "unlabeled"
    u.mkdir()
    save_video(str(u / "b.avi"), rng.rand(2, 16, 16, 3).astype(np.float32))

    monkeypatch.chdir(tmp_path)
    mod = _load("train_multimodal")
    state = mod.main(steps=2, batch_size=2, n_chunks=2,
                     data_dir=str(tmp_path / "data"))
    assert int(state.step) == 2
    rows = _read_metrics("multimodal_metrics.jsonl")
    assert all(np.isfinite(r["loss"]) for r in rows if "loss" in r)
