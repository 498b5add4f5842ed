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
  <root>/flow_synth/{train,val}/scene_XX/{frames,flow}/   Sintel-style
  <root>/kinetics_synth/{train,val}/<class idx>/*.avi+.wav  labeled clips

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

Flow / multimodal full-scale certification recipe (PERFORMANCE.md "flow +
multimodal training certification"):
  python examples/train_flow.py --full-scale \
      --data-dir <root>/flow_synth/train --steps 3000 \
      --checkpoint-dir /tmp/ckpt_flow
  python examples/evaluate_flow.py \
      --data-dir <root>/flow_synth/val/scene_00 --checkpoint /tmp/ckpt_flow/...
  python examples/train_multimodal.py --full-scale \
      --data-dir <root>/kinetics_synth/train --steps 2000 \
      --checkpoint-dir /tmp/ckpt_mm
  python examples/evaluate_multimodal.py \
      --data-dir <root>/kinetics_synth/val --checkpoint /tmp/ckpt_mm/...
"""

import argparse
import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def make_flow(root, *, hw=(368, 496), max_shift=3):
    """Sintel-style scenes: frame i+1 = integer roll of frame i.

    Frames are 4x-upsampled noise quantized to uint8 BEFORE rolling, so
    frame pairs are related by an EXACT integer translation and the
    committed .flo ground truth (constant field, channel 0 horizontal) is
    exact except at the <1% wrap border.  Same distribution as
    examples/train_flow.synthetic_flow_pairs, but file-backed — this is
    the tree behind the full-scale flow training certification.
    """
    h, w = hw
    for split, n_scenes, n_frames in (("train", 12, 13), ("val", 2, 7)):
        for s in range(n_scenes):
            d = os.path.join(root, "flow_synth", split, f"scene_{s:02d}")
            os.makedirs(os.path.join(d, "frames"), exist_ok=True)
            os.makedirs(os.path.join(d, "flow"), exist_ok=True)
            r = np.random.RandomState(_seed("flow", split, s))
            base = r.uniform(0, 255, (3, h // 4 + 1, w // 4 + 1))
            frame = np.kron(base, np.ones((1, 4, 4)))[:, :h, :w]
            frame = np.clip(frame, 0, 255).astype(np.uint8)  # [3, H, W]
            for i in range(n_frames):
                Image.fromarray(np.transpose(frame, (1, 2, 0))).save(
                    os.path.join(d, "frames", f"frame_{i + 1:04d}.png")
                )
                if i == n_frames - 1:
                    break
                dy, dx = r.randint(-max_shift, max_shift + 1, 2)
                flow = np.zeros((2, h, w), np.float32)
                flow[0], flow[1] = dx, dy
                from perceiverio_pytorch_tpu.utils.flow_io import write_flo

                write_flo(
                    os.path.join(d, "flow", f"frame_{i + 1:04d}.flo"), flow
                )
                frame = np.roll(frame, (dy, dx), axis=(1, 2))
    print("flow_synth done")


def make_clips(root, *, n_classes=9, num_frames=16, hw=(224, 224),
               sample_rate=48000, samples_per_frame=1920):
    """Labeled video clips: drifting gratings + class-keyed sine audio.

    Class c (directories named by the integer label so VideoClipDataset /
    evaluate_multimodal resolve it without a labels file) renders a
    grating at orientation pi*c/n drifting over the 16 frames, with a wav
    sidecar sine at a class-keyed frequency — the label is recoverable
    from either modality, which is what the masked-label autoencoding
    objective (input_mask_probs[label]=1.0) has to learn.
    """
    import scipy.io.wavfile

    h, w = hw
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    n_audio = num_frames * samples_per_frame
    t_audio = np.arange(n_audio, dtype=np.float32) / sample_rate
    from perceiverio_pytorch_tpu.utils.image import save_video

    for split, per in (("train", 60), ("val", 2)):
        for c in range(n_classes):
            d = os.path.join(root, "kinetics_synth", split, str(c))
            os.makedirs(d, exist_ok=True)
            theta = np.pi * c / n_classes
            # coarse grating (wavelength ~90 px) so the latent bottleneck
            # can represent it; orientation carries the class
            carrier = (np.cos(theta) * xx + np.sin(theta) * yy) * 0.07
            for i in range(per):
                r = np.random.RandomState(_seed("clips", split, c, i))
                speed = r.uniform(0.5, 1.5) * (1 if r.rand() < 0.5 else -1)
                phase0 = r.uniform(0, 2 * np.pi)
                frames = []
                for f in range(num_frames):
                    g = np.sin(carrier + phase0 + speed * f)
                    rgb = np.stack([
                        0.5 + 0.35 * g,
                        0.5 + 0.35 * g * r.uniform(0.8, 1.0),
                        0.5 + 0.35 * g * r.uniform(0.8, 1.0),
                    ], -1)
                    frames.append(np.clip(rgb, 0, 1))
                save_video(os.path.join(d, f"clip_{i:03d}.avi"),
                           np.asarray(frames, np.float32))
                # class-keyed LOW frequencies (30-103 Hz: phase advances
                # <0.22 rad per 16-sample patch, so the waveform is smooth
                # in the decoder's patch-index fourier features — higher
                # frequencies measured unlearnable at certification scale)
                freq = 30.0 * (1.167 ** c) * r.uniform(0.98, 1.02)
                wav = 0.5 * np.sin(2 * np.pi * freq * t_audio)
                scipy.io.wavfile.write(
                    os.path.join(d, f"clip_{i:03d}.wav"), sample_rate,
                    (wav * 2**15).astype(np.int16),
                )
    print("kinetics_synth done")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/data")
    p.add_argument("--only", default=None,
                   choices=["imagenet", "text", "flow", "clips"],
                   help="generate one tree instead of all of them")
    args = p.parse_args()
    if args.only in (None, "imagenet"):
        make_easy(args.root)
        make_gratings(args.root, "imagenet_med", n_classes=16, amplitude=40,
                      noise=48, per_split={"train": 100, "val": 25},
                      splits=("train", "val"))
        make_gratings(args.root, "imagenet_med_valhard", n_classes=16,
                      amplitude=20, noise=58, per_split={"val": 25},
                      splits=("val",))
    if args.only in (None, "text"):
        make_text(args.root)
    if args.only in (None, "flow"):
        make_flow(args.root)
    if args.only in (None, "clips"):
        make_clips(args.root)
