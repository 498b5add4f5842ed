"""Multimodal Kinetics autoencoding example (reference: example_multimodal.py).

Auto-encodes video + audio (+ a fully masked label query) in 16-frame clips,
reconstructing both modalities and predicting the Kinetics-700 class.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from perceiverio_pytorch_tpu.models import MultiModalPerceiver
from perceiverio_pytorch_tpu.utils.image import load_video, save_video
from perceiverio_pytorch_tpu.utils.labels import kinetics700_labels
from perceiverio_pytorch_tpu.utils.torch_checkpoint import (
    convert_state_dict,
    load_torch_checkpoint,
)

CKPT_FILE = "./pytorch_checkpoints/video_autoencoding_checkpoint.pth"

FRAMES_PER_SECOND = 25
SAMPLING_RATE = 48000
NUM_FRAMES = 16
AUDIO_SAMPLES_PER_FRAME = SAMPLING_RATE // FRAMES_PER_SECOND
SAMPLES_PER_PATCH = 16
NUM_CLASSES = 700
IMG_SZ = 224



from perceiverio_pytorch_tpu.utils.image import (  # shared fallback
    resolve_sample_path as _resolve_sample,
)

def multimodal_example(
    video_path: str = "./sample_data/video.avi",
    audio_path: str = "./sample_data/audio.wav",
    random_init: bool = False,
):
    import scipy.io.wavfile

    if not random_init and not os.path.isfile(CKPT_FILE):
        raise ValueError(
            "Please download the converted checkpoint and place it in"
            " ./pytorch_checkpoints (see README), or pass --random-init for"
            " an untrained demo run."
        )

    sample_rate, audio = scipy.io.wavfile.read(_resolve_sample(audio_path))
    if audio.dtype == np.int16:
        audio = audio.astype(np.float32) / 2**15
    elif audio.dtype != np.float32:
        raise ValueError("Model expects sound samples in [-1, 1]")

    video = load_video(_resolve_sample(video_path), resize=(IMG_SZ, IMG_SZ))

    # Outputs are chunk-count invariant (tested); 16 is the measured
    # throughput sweet spot (the reference example uses 128).
    n_chunks = 16

    model = MultiModalPerceiver(
        num_frames=NUM_FRAMES,
        audio_samples_per_frame=AUDIO_SAMPLES_PER_FRAME,
        audio_samples_per_patch=SAMPLES_PER_PATCH,
        num_classes=NUM_CLASSES,
        img_size=(IMG_SZ, IMG_SZ),
    )

    video_input = jnp.asarray(
        np.moveaxis(video[None, :NUM_FRAMES], -1, -3), jnp.float32
    )
    audio_input = jnp.asarray(
        audio[None, : NUM_FRAMES * AUDIO_SAMPLES_PER_FRAME, 0:1], jnp.float32
    )

    # Jitted init (NOT eval_shape): the template must carry CONCRETE values
    # for the derived "consts" Fourier tables, which convert_state_dict
    # keeps from the template (no torch counterpart).
    variables = jax.jit(
        lambda k, i, a: model.init(k, i, a, n_chunks)
    )(jax.random.PRNGKey(0), video_input, audio_input)
    if not random_init:
        variables, _ = convert_state_dict(
            load_torch_checkpoint(CKPT_FILE), variables
        )

    fwd = jax.jit(lambda v, i, a: model.apply(v, i, a, n_chunks))
    reconstruction = fwd(variables, video_input, audio_input)

    scipy.io.wavfile.write(
        "./audio_reconstruction.wav",
        SAMPLING_RATE,
        (np.asarray(reconstruction["audio"][0]) * 2**15).astype(np.int16),
    )
    save_video(
        "./video_reconstruction.avi",
        np.clip(np.moveaxis(np.asarray(reconstruction["image"][0]), -3, -1), 0, 1),
    )

    probs = jax.nn.softmax(reconstruction["label"], axis=-1)
    top5 = np.argsort(-np.asarray(probs[0]))[:5]
    labels = kinetics700_labels()
    for idx in top5:
        print(f"{labels[idx]}: {float(probs[0, idx]) * 100:.1f}%")
    return reconstruction


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--random-init", action="store_true")
    multimodal_example(random_init=parser.parse_args().random_init)
