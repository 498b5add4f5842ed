"""Generate frozen golden oracles from the live PyTorch reference.

The parity suite oracles against /root/reference imported at test time
(conftest.py).  If that tree ever diverges or disappears, the oracle would
silently thin to the auto-skipping pretrained tests.  This script freezes
the evidence: for each family's small-scale parity config it randomises the
torch reference's weights (tests/parity_utils.randomize_state_dict — the
same protocol the live tests use), runs the torch forward on fixed inputs,
and writes weights + inputs + outputs to ``tests/goldens/<family>.npz``.
``tests/test_frozen_goldens.py`` then replays our side against the frozen
arrays WITHOUT importing the reference.

Run (only needs doing when a config/seed here changes):

    /opt/venv/bin/python tests/make_goldens.py

Configs/seeds mirror tests/test_models_parity.py exactly, so the frozen
and live oracles certify the same computation.  Reference configs:
/root/reference/perceiver_io/{language,classification,flow,multimodal}_perceiver.py.
"""

import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "_refshim"))
sys.path.insert(0, os.path.dirname(_HERE))
if os.path.isdir("/root/reference"):
    sys.path.insert(0, "/root/reference")

import numpy as np

from parity_utils import randomize_state_dict, to_numpy  # noqa: E402

GOLDEN_DIR = os.path.join(_HERE, "goldens")


def _round_weights_f16(torch_model):
    """Round every float tensor to the f16 grid (kept in fp32).

    Done BEFORE the torch forward, so both sides of the oracle compute from
    the identical rounded weights and the frozen .npz can store exact
    float16 halving the file size.  The compute itself stays fp32; random
    N(0, 0.05) weights lose nothing that matters at parity tolerances.
    """
    import torch

    with torch.no_grad():
        for v in torch_model.state_dict().values():
            if v.dtype.is_floating_point:
                v.copy_(v.half().float())


def _save(name, sd, inputs, outputs, kwargs, extra=None, grads=None):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    payload = {}
    for k, v in sd.items():
        a = to_numpy(v)
        if a.dtype == np.float32:
            h = a.astype(np.float16)
            assert (h.astype(np.float32) == a).all(), k  # exact by rounding
            a = h
        payload[f"sd::{k}"] = a
    payload.update({f"in::{k}": v for k, v in inputs.items()})
    payload.update({f"out::{k}": v for k, v in outputs.items()})
    # gradients stay fp32: they are NOT on the f16 grid, and the parity
    # tolerance (rtol 2e-4) is finer than f16 resolution
    payload.update(
        {f"grad::{k}": to_numpy(v) for k, v in (grads or {}).items()}
    )
    payload["meta"] = np.frombuffer(
        json.dumps({"kwargs": kwargs, **(extra or {})}).encode(), np.uint8
    )
    np.savez_compressed(os.path.join(GOLDEN_DIR, f"{name}.npz"), **payload)
    size = os.path.getsize(os.path.join(GOLDEN_DIR, f"{name}.npz"))
    print(f"{name}: {size/1e6:.2f} MB, {len(sd)} tensors")


def language():
    import torch
    from perceiver_io.language_perceiver import LanguagePerceiver

    kwargs = dict(vocab_size=262, max_seq_len=32, embed_dim=16,
                  num_self_attends_per_block=2, num_blocks=1, num_latents=8,
                  num_latent_channels=64)
    m = LanguagePerceiver(**kwargs).eval()
    randomize_state_dict(m, seed=0)
    _round_weights_f16(m)
    sd = m.state_dict()
    rng = np.random.RandomState(0)
    tokens = rng.randint(0, 262, (2, 32)).astype(np.int64)
    mask = np.ones((2, 32), bool)
    mask[:, 20:] = False
    with torch.inference_mode():
        out = to_numpy(m(torch.from_numpy(tokens), torch.from_numpy(mask)))
    _save("language", sd, {"tokens": tokens, "mask": mask},
          {"logits": out}, kwargs)


def classification():
    import torch
    from perceiver_io.classification_perceiver import (
        ClassificationPerceiver, PrepType)

    kwargs = dict(num_classes=7, img_size=(32, 32),
                  num_self_attends_per_block=2, num_blocks=2, num_latents=8,
                  num_latent_channels=32)
    for prep in ("FOURIER_POS_CONVNET", "LEARNED_POS_1X1CONV",
                 "FOURIER_POS_PIXEL"):
        m = ClassificationPerceiver(
            prep_type=getattr(PrepType, prep), **kwargs).eval()
        randomize_state_dict(m, seed=1)
        _round_weights_f16(m)
        sd = m.state_dict()
        rng = np.random.RandomState(1)
        img = rng.randn(2, 3, 32, 32).astype(np.float32)
        with torch.inference_mode():
            out = to_numpy(m(torch.from_numpy(img)))
        _save(f"classification_{prep.lower()}", sd, {"img": img},
              {"logits": out}, kwargs, {"prep": prep})


def flow():
    import torch
    from perceiver_io.flow_perceiver import FlowPerceiver

    kwargs = dict(img_size=(16, 24), num_latents=8, num_latent_channels=32,
                  num_self_attends_per_block=2, num_blocks=1)
    m = FlowPerceiver(**kwargs).eval()
    randomize_state_dict(m, seed=2)
    _round_weights_f16(m)
    sd = m.state_dict()
    rng = np.random.RandomState(2)
    img1 = rng.uniform(-1, 1, (1, 3, 16, 24)).astype(np.float32)
    img2 = rng.uniform(-1, 1, (1, 3, 16, 24)).astype(np.float32)
    with torch.inference_mode():
        out = to_numpy(m(torch.from_numpy(img1), torch.from_numpy(img2),
                         test_mode=False))
    _save("flow", sd, {"img1": img1, "img2": img2}, {"flow": out}, kwargs)


def multimodal():
    import torch
    from perceiver_io.multimodal_perceiver import MultiModalPerceiver

    kwargs = dict(img_size=(16, 16), num_frames=2, num_classes=11,
                  audio_samples_per_frame=128, audio_samples_per_patch=16,
                  num_self_attends_per_block=1, num_blocks=1, num_latents=8,
                  num_latent_channels=512)
    m = MultiModalPerceiver(**kwargs).eval()
    randomize_state_dict(m, seed=4)
    _round_weights_f16(m)
    sd = m.state_dict()
    rng = np.random.RandomState(4)
    images = rng.rand(1, 2, 3, 16, 16).astype(np.float32)
    audio = rng.uniform(-1, 1, (1, 256, 1)).astype(np.float32)
    with torch.inference_mode():
        out = m(torch.from_numpy(images), torch.from_numpy(audio), n_chunks=4)
    _save("multimodal", sd, {"images": images, "audio": audio},
          {k: to_numpy(v) for k, v in out.items()}, kwargs)


def language_grads():
    """Freeze the language GRADIENT oracle (mirrors
    test_models_parity.test_language_gradient_parity: seed 3, MSE loss,
    tied-embedding double accumulation through torch autograd)."""
    import torch
    from perceiver_io.language_perceiver import LanguagePerceiver

    kwargs = dict(vocab_size=262, max_seq_len=32, embed_dim=16,
                  num_self_attends_per_block=2, num_blocks=1, num_latents=8,
                  num_latent_channels=64)
    m = LanguagePerceiver(**kwargs).train()
    randomize_state_dict(m, seed=3)
    _round_weights_f16(m)
    sd = {k: v.clone() for k, v in m.state_dict().items()}
    rng = np.random.RandomState(3)
    tokens = rng.randint(0, 262, (2, 32)).astype(np.int64)
    mask = np.ones((2, 32), bool)
    mask[:, 24:] = False
    target = rng.randn(2, 32, 262).astype(np.float32)
    out = m(torch.from_numpy(tokens), torch.from_numpy(mask))
    loss = ((out - torch.from_numpy(target)) ** 2).mean()
    loss.backward()
    grads = {
        k: v.grad.clone()
        for k, v in m.state_dict(keep_vars=True).items()
        if v.grad is not None
    }
    _save("language_grads", sd,
          {"tokens": tokens, "mask": mask, "target": target},
          {"loss": np.float32(loss.detach().numpy())}, kwargs, grads=grads)


def classification_grads():
    """Freeze the conv-classification GRADIENT oracle (mirrors
    test_models_parity.test_classification_gradient_parity_convnet: seed 4,
    eval-mode BatchNorm, MSE loss through the conv/maxpool pathway)."""
    import torch
    from perceiver_io.classification_perceiver import (
        ClassificationPerceiver, PrepType)

    kwargs = dict(num_classes=7, img_size=(32, 32),
                  num_self_attends_per_block=2, num_blocks=1, num_latents=8,
                  num_latent_channels=32)
    m = ClassificationPerceiver(
        prep_type=PrepType.FOURIER_POS_CONVNET, **kwargs).eval()
    randomize_state_dict(m, seed=4)
    _round_weights_f16(m)
    sd = {k: v.clone() for k, v in m.state_dict().items()}
    rng = np.random.RandomState(4)
    img = rng.randn(2, 3, 32, 32).astype(np.float32)
    target = rng.randn(2, 7).astype(np.float32)
    out = m(torch.from_numpy(img))
    loss = ((out - torch.from_numpy(target)) ** 2).mean()
    loss.backward()
    grads = {
        # BN running stats are buffers without grads; zero-fill so the
        # adapter's template walk (which expects every leaf) stays happy
        k: (v.grad.clone() if getattr(v, "grad", None) is not None
            else torch.zeros_like(v))
        for k, v in m.state_dict(keep_vars=True).items()
    }
    _save("classification_convnet_grads", sd,
          {"img": img, "target": target},
          {"loss": np.float32(loss.detach().numpy())}, kwargs, grads=grads)


if __name__ == "__main__":
    language()
    classification()
    flow()
    multimodal()
    language_grads()
    classification_grads()
