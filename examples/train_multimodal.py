"""End-to-end training demo: multimodal (video+audio+label) autoencoding.

Trains MultiModalPerceiver with the rematted encode-once + scanned chunk
decode on a synthetic clip task: reconstruct smooth video/audio and
classify a planted label, driving the weighted autoencode loss down.

The immutable "consts" collection (precomputed Fourier query/position
tables -- large at full scale) rides in ``TrainState.model_state`` so it
enters the jitted step as a runtime argument, never a trace-time constant
(see CLAUDE.md: a 188 MB captured table costs minutes of compile).

Default config is tiny (runs anywhere in seconds).  ``--full-scale``
trains the exact shipped Kinetics config
(/root/reference/perceiver_io/multimodal_perceiver.py:30-41) with remat:
~214 ms/step at batch 1, n_chunks=16 on one v5e chip with selective remat
(PERFORMANCE.md item 12).

    python examples/train_multimodal.py --steps 20 [--full-scale]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from perceiverio_pytorch_tpu import PERFORMANCE
from perceiverio_pytorch_tpu.models import MultiModalPerceiver
from perceiverio_pytorch_tpu.training import (
    Trainer,
    build_optimizer,
    multimodal_autoencode_loss,
)
from perceiverio_pytorch_tpu.utils.data import (
    batch_iterator,
    epoch_batches,
    prefetch_to_device,
)


def synthetic_clips(n: int, num_frames, hw, n_audio, num_classes, seed=0):
    """Smooth video + sine audio, label = dominant hue bucket."""
    h, w = hw
    rng = np.random.RandomState(seed)
    base = rng.rand(n, num_frames, 3, max(h // 4, 1), max(w // 4, 1))
    video = np.stack(
        [np.kron(clip, np.ones((1, 1, 4, 4)))[:, :, :h, :w] for clip in base]
    ).astype(np.float32)
    t = np.arange(n_audio) / n_audio
    freqs = rng.randint(2, 10, n)
    audio = np.sin(2 * np.pi * freqs[:, None] * t)[..., None].astype(np.float32)
    labels = (video.mean(axis=(1, 3, 4)).argmax(axis=1) * num_classes // 3).astype(
        np.int32
    )
    return video, audio, labels


def main(steps=20, batch_size=1, n_chunks=None, full_scale=False,
         checkpoint_dir=None, resume=False, data_dir=None, labels_file=None,
         lr=None, checkpoint_every=None):
    if full_scale:
        # dots_saveable measured 214.3 vs 227.1 ms/step full-remat here
        # (PERFORMANCE.md item 12); the other model families keep full remat.
        policy = dataclasses.replace(PERFORMANCE, remat_policy="dots_saveable")
        model = MultiModalPerceiver(policy=policy, remat=True)
        if n_chunks not in (None, 16):
            print(f"--full-scale forces n_chunks=16 (requested {n_chunks})")
        num_frames, hw, num_classes, n_chunks = 16, (224, 224), 700, 16
        n_audio = 16 * (48000 // 25)
    else:
        n_chunks = 4 if n_chunks is None else n_chunks
        model = MultiModalPerceiver(
            img_size=(16, 16), num_frames=2, num_classes=11,
            audio_samples_per_frame=128, audio_samples_per_patch=16,
            num_self_attends_per_block=1, num_blocks=1,
            num_latents=8, num_latent_channels=512, remat=True,
        )
        num_frames, hw, num_classes = 2, (16, 16), 11
        n_audio = 2 * 128

    dataset = None
    if data_dir is not None:
        # real clips: .avi/.mp4 + .wav sidecars (the evaluate_multimodal
        # layout); labels from directory names or --labels-file, -1 when
        # unresolvable (excluded from the label loss).  Video ships uint8.
        from perceiverio_pytorch_tpu.training import (
            VideoClipDataset,
            dataset_iterator,
        )
        from perceiverio_pytorch_tpu.utils.labels import kinetics700_labels

        dataset = VideoClipDataset(
            data_dir, num_frames=num_frames, image_size=hw,
            audio_samples_per_frame=n_audio // num_frames,
            labels_file=labels_file,
            class_names=kinetics700_labels() if num_classes == 700 else None,
        )
        print(f"{len(dataset)} clips from {data_dir}")
        video, audio, labels = next(
            dataset_iterator(dataset, batch_size, num_workers=0)
        )
    else:
        video, audio, labels = synthetic_clips(
            4 * batch_size, num_frames, hw, n_audio, num_classes
        )

    def _prep(video):
        """uint8 [B,T,3,H,W] -> [0, 1] float (on device, inside the jit)."""
        if video.dtype == jnp.uint8:
            return video.astype(jnp.float32) / 255.0
        return video

    variables = jax.jit(
        lambda k, i, a: model.init(k, _prep(i), a, n_chunks)
    )(jax.random.PRNGKey(0), video[:batch_size], audio[:batch_size])
    consts = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(params, model_state, video, audio, labels):
        v = _prep(video)
        out = model.apply({"params": params, **model_state}, v, audio,
                          n_chunks, deterministic=False)
        loss = multimodal_autoencode_loss(
            out, {"image": v, "audio": audio, "label": labels},
            weights={"image": 1.0, "audio": 1.0, "label": 0.01},
        )
        return loss, model_state

    trainer = Trainer(
        loss_fn,
        build_optimizer(
            lr or (1e-4 if full_scale else 1e-3), schedule="cosine",
            total_steps=steps, warmup_steps=max(steps // 10, 1),
            clip_norm=1.0,
        ),
        num_batch_args=3,
        with_model_state=True,
        metrics_path="./multimodal_metrics.jsonl",
        log_every=5,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=0 if checkpoint_dir is None else (
            checkpoint_every or max(steps // 2, 1)),
    )
    state = trainer.init_state(variables["params"], model_state=consts)

    # epochs=None reshuffles every epoch (a fresh epoch_batches() per
    # loop iteration would replay the same seed-0 permutation)
    def batches(start_step=0):
        if dataset is not None:
            from perceiverio_pytorch_tpu.training import dataset_iterator

            return dataset_iterator(dataset, batch_size, shuffle=True,
                                    epochs=None, start_batch=start_step,
                                    num_workers=4)
        return batch_iterator((video, audio, labels), batch_size,
                              shuffle=True, epochs=None,
                              start_batch=start_step)

    state = trainer.fit(
        state, lambda s: prefetch_to_device(batches(s), 2),
        num_steps=steps, resume=resume,
    )
    print(f"finished at step {int(state.step)}")
    return state


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--n-chunks", type=int, default=None,
                        help="default 4 (tiny); --full-scale forces 16")
    parser.add_argument("--full-scale", action="store_true",
                        help="exact shipped Kinetics config, remat + bf16")
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--resume", action="store_true",
                        help="continue from the newest checkpoint in --checkpoint-dir")
    parser.add_argument("--data-dir", default=None,
                        help="clip directory (.avi/.mp4 + .wav sidecars);"
                             " default: synthetic clips")
    parser.add_argument("--labels-file", default=None,
                        help="JSON: clip stem -> class index or name")
    parser.add_argument("--lr", type=float, default=None,
                        help="peak learning rate (default 1e-4 full-scale,"
                             " 1e-3 tiny)")
    parser.add_argument("--checkpoint-every", type=int, default=None,
                        help="steps between checkpoints (default steps//2;"
                             " set lower on flaky transports so --resume"
                             " loses less work)")
    from perceiverio_pytorch_tpu.utils.compilation_cache import (
        add_cache_arg,
        enable_cache_if_requested,
    )

    add_cache_arg(parser)
    args = parser.parse_args()
    enable_cache_if_requested(args)
    main(args.steps, args.batch_size, n_chunks=args.n_chunks,
         full_scale=args.full_scale, checkpoint_dir=args.checkpoint_dir,
         resume=args.resume, data_dir=args.data_dir,
         labels_file=args.labels_file, lr=args.lr,
         checkpoint_every=args.checkpoint_every)
