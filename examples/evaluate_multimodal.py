"""Multimodal (Kinetics autoencoding) evaluation: reconstruction + labels.

Scores the MultiModalPerceiver over a directory of clips -- video PSNR and
audio PSNR for the autoencoded modalities, plus top-1/top-5 Kinetics label
accuracy when ground truth is available.  Matches the reference example's
protocol (/root/reference/example_multimodal.py:53-158): the first
``num_frames``-frame chunk of each clip is auto-encoded with the label
query fully masked.

Data layout (recursively scanned):

    data_dir/<class name>/<clip>.avi      # label from the directory name
    data_dir/<clip>.avi  +  <clip>.wav    # audio optional (silence if absent)

Labels resolve from --labels-file (JSON: clip stem -> class index or name),
else from the parent directory name (an integer, or a Kinetics-700 class
name with '_' for spaces).  Clips with no resolvable label still count for
reconstruction metrics.

    python examples/evaluate_multimodal.py --data-dir /data/kinetics_val \\
        [--torch-checkpoint video_autoencoding_checkpoint.pth |
         --checkpoint ckpt | random init] [--small]

Prints one JSON line: video_psnr, audio_psnr, top1, top5, clips, clips/s.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import glob
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from perceiverio_pytorch_tpu import PERFORMANCE
from perceiverio_pytorch_tpu.models import MultiModalPerceiver
from perceiverio_pytorch_tpu.utils.image import load_video
from perceiverio_pytorch_tpu.utils.labels import kinetics700_labels


def _resolve_label(stem, parent, labels_file_map, name_to_idx):
    if labels_file_map is not None and stem in labels_file_map:
        v = labels_file_map[stem]
        if isinstance(v, str):
            # Same normalization as the parent-directory path below:
            # underscore-style class names ("playing_piano") resolve too.
            return name_to_idx.get(v.replace("_", " ").lower())
        return int(v)
    try:
        return int(parent)
    except ValueError:
        return name_to_idx.get(parent.replace("_", " ").lower())


def _clips(data_dir, labels_file_map, name_to_idx):
    paths = sorted(
        glob.glob(os.path.join(data_dir, "**", "*.avi"), recursive=True)
        + glob.glob(os.path.join(data_dir, "**", "*.mp4"), recursive=True)
    )
    if not paths:
        raise ValueError(f"no .avi/.mp4 clips under {data_dir}")
    for path in paths:
        stem = os.path.splitext(os.path.basename(path))[0]
        wav = os.path.splitext(path)[0] + ".wav"
        label = _resolve_label(
            stem, os.path.basename(os.path.dirname(path)),
            labels_file_map, name_to_idx,
        )
        yield path, (wav if os.path.exists(wav) else None), label


def _psnr(mse, peak):
    return float(10.0 * np.log10(peak * peak / max(mse, 1e-12)))


def main(data_dir, checkpoint=None, torch_checkpoint=None, small=False,
         labels_file=None, limit=None, n_chunks=None):
    if small:
        # tiny config for demos/smoke tests (random weights, real pipeline)
        model = MultiModalPerceiver(
            img_size=(16, 16), num_frames=2, num_classes=11,
            audio_samples_per_frame=128, audio_samples_per_patch=16,
            num_self_attends_per_block=1, num_latents=8,
            num_latent_channels=512,
        )
        n_chunks = n_chunks or 4
    else:
        model = MultiModalPerceiver(policy=PERFORMANCE)
        n_chunks = n_chunks or 16  # measured throughput optimum

    h, w = model.img_size
    t = model.num_frames
    n_audio = t * model.audio_samples_per_frame

    labels_file_map = json.load(open(labels_file)) if labels_file else None
    names = kinetics700_labels() if model.num_classes == 700 else []
    name_to_idx = {n.lower(): i for i, n in enumerate(names)}

    variables = jax.jit(
        lambda k, i, a: model.init(k, i, a, n_chunks)
    )(
        jax.random.PRNGKey(0),
        jnp.zeros((1, t, 3, h, w), jnp.float32),
        jnp.zeros((1, n_audio, 1), jnp.float32),
    )
    from perceiverio_pytorch_tpu.training.checkpoint import (
        restore_eval_variables,
    )

    variables = restore_eval_variables(variables, checkpoint, torch_checkpoint)

    fwd = jax.jit(lambda v, i, a: model.apply(v, i, a, n_chunks))

    video_se = video_n = 0.0
    audio_se = audio_n = 0.0
    top1 = top5 = n_labeled = 0
    n_clips = 0
    t0, timed = None, 0
    for path, wav_path, label in _clips(data_dir, labels_file_map,
                                        name_to_idx):
        video = load_video(path, max_frames=t, resize=(w, h))  # [T,H,W,3]
        if video.shape[0] == 0:
            continue
        if video.shape[0] < t:  # pad short clips by repeating the last frame
            video = np.concatenate(
                [video, np.repeat(video[-1:], t - video.shape[0], axis=0)]
            )
        if wav_path is not None:
            import scipy.io.wavfile

            _, audio = scipy.io.wavfile.read(wav_path)
            if audio.dtype == np.int16:
                audio = audio.astype(np.float32) / 2**15
            audio = np.asarray(audio, np.float32).reshape(audio.shape[0], -1)
            audio = audio[:n_audio, :1]
            if audio.shape[0] < n_audio:
                audio = np.pad(audio, ((0, n_audio - audio.shape[0]), (0, 0)))
        else:
            audio = np.zeros((n_audio, 1), np.float32)

        video_in = jnp.asarray(np.moveaxis(video, -1, -3)[None])  # [1,T,C,H,W]
        audio_in = jnp.asarray(audio[None])
        out = fwd(variables, video_in, audio_in)
        rec_video = np.asarray(out["image"][0], np.float32)  # [T,C,H,W]
        rec_audio = np.asarray(out["audio"][0], np.float32)
        logits = np.asarray(out["label"][0], np.float32)
        if t0 is None:
            t0 = time.perf_counter()  # exclude the compile
        else:
            timed += 1

        video_se += float(
            ((np.clip(rec_video, 0, 1) - np.moveaxis(video, -1, -3)) ** 2).sum()
        )
        video_n += rec_video.size
        if wav_path is not None:
            audio_se += float(((rec_audio - audio) ** 2).sum())
            audio_n += rec_audio.size
        if label is not None:
            order = np.argsort(-logits)
            top1 += int(order[0] == label)
            top5 += int(label in order[:5])
            n_labeled += 1
        n_clips += 1
        if limit and n_clips >= limit:
            break

    elapsed = time.perf_counter() - t0 if t0 else 0.0
    result = {"clips": n_clips}
    if video_n:
        result["video_psnr"] = round(_psnr(video_se / video_n, 1.0), 3)
    if audio_n:
        # waveform in [-1, 1] -> peak-to-peak 2
        result["audio_psnr"] = round(_psnr(audio_se / audio_n, 2.0), 3)
    if n_labeled:
        result["top1"] = round(top1 / n_labeled, 4)
        result["top5"] = round(top5 / n_labeled, 4)
        result["labeled_clips"] = n_labeled
    if timed and elapsed > 0:
        result["clips_per_sec"] = round(timed / elapsed, 2)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", required=True,
                        help="directory scanned recursively for clips")
    parser.add_argument("--checkpoint", default=None,
                        help="orbax variables dir or Trainer checkpoint")
    parser.add_argument("--torch-checkpoint", default=None,
                        help="reference video_autoencoding_checkpoint.pth")
    parser.add_argument("--small", action="store_true",
                        help="tiny random-weight config (pipeline demo)")
    parser.add_argument("--labels-file", default=None,
                        help="JSON: clip stem -> class index or name")
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--n-chunks", type=int, default=None)
    from perceiverio_pytorch_tpu.utils.compilation_cache import (
        add_cache_arg,
        enable_cache_if_requested,
    )

    add_cache_arg(parser)
    args = parser.parse_args()
    enable_cache_if_requested(args)
    main(args.data_dir, checkpoint=args.checkpoint,
         torch_checkpoint=args.torch_checkpoint, small=args.small,
         labels_file=args.labels_file, limit=args.limit,
         n_chunks=args.n_chunks)
