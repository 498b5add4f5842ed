"""Multimodal evaluation harness (examples/evaluate_multimodal.py)."""

import importlib.util
import json
import os

import numpy as np
import pytest


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name,
        os.path.join(os.path.dirname(__file__), os.pardir, "examples",
                     f"{name}.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def clip_dir(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    del cv2
    import scipy.io.wavfile

    from perceiverio_pytorch_tpu.utils.image import save_video

    root = tmp_path_factory.mktemp("clips")
    rng = np.random.RandomState(0)
    # clip a: video + audio; clip b: video only (silence)
    for stem, with_audio in [("a", True), ("b", False)]:
        video = rng.rand(2, 16, 16, 3).astype(np.float32)
        save_video(str(root / f"{stem}.avi"), video)
        if with_audio:
            wav = (rng.rand(256) * 2 - 1) * 0.5
            scipy.io.wavfile.write(
                str(root / f"{stem}.wav"), 48000,
                (wav * 2**15).astype(np.int16),
            )
    with open(root / "labels.json", "w") as f:
        json.dump({"a": 3, "b": 7}, f)
    return root


def test_small_eval_reports_all_metrics(clip_dir):
    mod = _load("evaluate_multimodal")
    result = mod.main(str(clip_dir), small=True,
                      labels_file=str(clip_dir / "labels.json"))
    assert result["clips"] == 2
    assert result["labeled_clips"] == 2
    assert np.isfinite(result["video_psnr"])
    assert np.isfinite(result["audio_psnr"])  # only clip a contributes
    assert 0.0 <= result["top1"] <= result["top5"] <= 1.0


def test_torch_checkpoint_roundtrip_reproduces_metrics(clip_dir, tmp_path):
    """restore_eval_variables' .pth path must load weights correctly:
    exporting the PRNGKey(0) init and reloading it through the adapter has
    to reproduce the no-checkpoint run's metrics exactly (regression for
    the un-unpacked convert_state_dict tuple)."""
    mod = _load("evaluate_multimodal")
    base = mod.main(str(clip_dir), small=True)

    import jax
    import jax.numpy as jnp

    from perceiverio_pytorch_tpu.models import MultiModalPerceiver
    from perceiverio_pytorch_tpu.utils.torch_checkpoint import (
        save_torch_checkpoint,
    )

    model = MultiModalPerceiver(
        img_size=(16, 16), num_frames=2, num_classes=11,
        audio_samples_per_frame=128, audio_samples_per_patch=16,
        num_self_attends_per_block=1, num_latents=8,
        num_latent_channels=512,
    )
    variables = jax.jit(lambda k, i, a: model.init(k, i, a, 4))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 3, 16, 16), jnp.float32),
        jnp.zeros((1, 256, 1), jnp.float32),
    )
    pth = str(tmp_path / "mm.pth")
    save_torch_checkpoint(pth, variables)

    reloaded = mod.main(str(clip_dir), small=True, torch_checkpoint=pth)
    assert reloaded["video_psnr"] == base["video_psnr"]
    assert reloaded["audio_psnr"] == base["audio_psnr"]


def test_resolve_label_cases():
    """Label resolution: labels-file values (int and case-insensitive name),
    parent-directory integers/names, and None when unresolvable."""
    mod = _load("evaluate_multimodal")
    name_to_idx = {"playing piano": 42}
    r = mod._resolve_label
    assert r("clip", "x", {"clip": 7}, name_to_idx) == 7
    # string values resolve through the (lowercased) class-name index
    assert r("clip", "x", {"clip": "Playing Piano"}, name_to_idx) == 42
    # underscore-style names normalize the same way as directory names
    assert r("clip", "x", {"clip": "Playing_Piano"}, name_to_idx) == 42
    assert r("clip", "5", None, name_to_idx) == 5
    assert r("clip", "playing_piano", None, name_to_idx) == 42
    assert r("clip", "unknown_class", None, name_to_idx) is None
