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
