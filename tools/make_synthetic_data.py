"""Generate synthetic datasets like the ones behind the round-4 certifications.

PERFORMANCE.md's int8 task-accuracy tables and file-backed-training
throughput rows were measured on trees with these exact statistics
(class-conditional oriented gratings + Gaussian noise; template-grammar
text).  The original throwaway scripts seeded from Python's ``hash()`` of
string tuples, which is randomized per process, so those trees are not
bit-reproducible; this committed version draws the same distributions
from stable ``zlib.crc32`` seeds.  Re-running the measurement recipe on a
fresh tree reproduces the table values up to sampling noise.

    /opt/venv/bin/python tools/make_synthetic_data.py --root /tmp/data

Produces:
  <root>/imagenet_synth/{train,val}/class_XX/*.png   10 easy classes
  <root>/imagenet_med/{train,val}/class_XX/*.png     16 classes, mid SNR
  <root>/imagenet_med_valhard/val/class_XX/*.png     degraded-SNR val
  <root>/text/corpus_{train,val}.txt                 ~3 MB template text

Measurement recipe (see PERFORMANCE.md "int8 task-accuracy certification"):
  python examples/train_classification.py --full-scale \
      --data-dir <root>/imagenet_med/train --steps 1200 --batch-size 8 \
      --checkpoint-dir /tmp/ckpt
  python examples/evaluate_classification.py --full-scale \
      --data-dir <root>/imagenet_med/val --checkpoint /tmp/ckpt/step_... \
      [--quant dynamic|static]
  python examples/train_mlm.py --full-scale \
      --text-file <root>/text/corpus_train.txt --steps 6000 --batch-size 16 \
      --checkpoint-dir /tmp/ckpt_mlm
  python examples/evaluate_mlm.py --full-scale \
      --text-file <root>/text/corpus_val.txt --checkpoint ... [--quant ...]
"""

import argparse
import os
import zlib

import numpy as np
from PIL import Image

H = W = 224
_YY, _XX = np.mgrid[0:H, 0:W].astype(np.float32)


def _seed(*parts) -> int:
    return zlib.crc32("/".join(str(p) for p in parts).encode()) & 0x7FFFFFFF


def _grating(theta, freq, amplitude, r):
    phase = r.uniform(0, 2 * np.pi)
    g = np.sin(
        (np.cos(theta) * _XX + np.sin(theta) * _YY) * freq * 2 * np.pi + phase
    )
    return g * amplitude + 128


def make_easy(root):
    """10 well-separated classes (orientation x frequency), high SNR."""
    for split, per in (("train", 150), ("val", 40)):
        for c in range(10):
            d = os.path.join(root, "imagenet_synth", split, f"class_{c:02d}")
            os.makedirs(d, exist_ok=True)
            theta, freq = np.pi * c / 10.0, 0.05 + 0.02 * (c % 5)
            for i in range(per):
                r = np.random.RandomState(_seed("easy", split, c, i))
                base = _grating(theta, freq, 60, r)
                img = np.stack([
                    base + r.normal(0, 25, (H, W)),
                    base * (0.8 + 0.4 * r.rand()) + r.normal(0, 25, (H, W)),
                    base * (0.8 + 0.4 * r.rand()) + r.normal(0, 25, (H, W)),
                ], -1)
                Image.fromarray(
                    np.clip(img, 0, 255).astype(np.uint8)
                ).save(os.path.join(d, f"{i:04d}.png"))
    print("imagenet_synth done")


def make_gratings(root, name, *, n_classes, amplitude, noise, per_split,
                  splits):
    """Close orientations at a fixed frequency; SNR sets the difficulty."""
    for split in splits:
        for c in range(n_classes):
            d = os.path.join(root, name, split, f"class_{c:02d}")
            os.makedirs(d, exist_ok=True)
            theta = np.pi * c / n_classes
            for i in range(per_split[split]):
                r = np.random.RandomState(_seed(name, split, c, i))
                base = _grating(theta, 0.06, amplitude, r)
                img = np.stack(
                    [base + r.normal(0, noise, (H, W)) for _ in range(3)], -1
                )
                Image.fromarray(
                    np.clip(img, 0, 255).astype(np.uint8)
                ).save(os.path.join(d, f"{i:04d}.png"))
    print(f"{name} done")


def make_text(root):
    subjects = ["the model", "a perceiver", "the encoder", "our decoder",
                "the latent array", "a transformer", "the attention head",
                "this framework", "the compiler", "a kernel"]
    verbs = ["computes", "attends to", "projects", "normalizes", "decodes",
             "encodes", "compresses", "reconstructs", "predicts", "samples"]
    objects = ["the input tokens", "a query vector", "the output logits",
               "masked positions", "fourier features", "latent channels",
               "the byte sequence", "spatial patches", "audio samples",
               "position encodings"]
    adverbs = ["quickly", "exactly", "in parallel", "on the device",
               "per layer", "with residuals", "at scale", "in bfloat16",
               "per head", "once per block"]
    r = np.random.RandomState(1)
    parts, total = [], 0
    while total < 3_000_000:
        s = (f"{r.choice(subjects)} {r.choice(verbs)} {r.choice(objects)}"
             f" {r.choice(adverbs)}. ")
        parts.append(s)
        total += len(s)
    text = "".join(parts)
    os.makedirs(os.path.join(root, "text"), exist_ok=True)
    with open(os.path.join(root, "text", "corpus_train.txt"), "w") as f:
        f.write(text[: int(len(text) * 0.9)])
    with open(os.path.join(root, "text", "corpus_val.txt"), "w") as f:
        f.write(text[int(len(text) * 0.9):])
    print("text done", len(text))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/data")
    args = p.parse_args()
    make_easy(args.root)
    make_gratings(args.root, "imagenet_med", n_classes=16, amplitude=40,
                  noise=48, per_split={"train": 100, "val": 25},
                  splits=("train", "val"))
    make_gratings(args.root, "imagenet_med_valhard", n_classes=16,
                  amplitude=20, noise=58, per_split={"val": 25},
                  splits=("val",))
    make_text(args.root)
