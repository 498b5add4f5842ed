"""ImageNet classification example (reference: example_img_classify.py).

Three converted checkpoints map to the three PrepType variants.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from perceiverio_pytorch_tpu.models import ClassificationPerceiver, PrepType
from perceiverio_pytorch_tpu.utils.image import (
    center_crop_resize,
    load_image,
    normalize_imagenet,
)
from perceiverio_pytorch_tpu.utils.labels import imagenet_labels
from perceiverio_pytorch_tpu.utils.torch_checkpoint import (
    convert_state_dict,
    load_torch_checkpoint,
)

CKPT_FILES = {
    PrepType.FOURIER_POS_CONVNET: "./pytorch_checkpoints/imagenet_conv_preprocessing.pth",
    PrepType.LEARNED_POS_1X1CONV: "./pytorch_checkpoints/imagenet_learned_position_encoding.pth",
    PrepType.FOURIER_POS_PIXEL: "./pytorch_checkpoints/imagenet_fourier_position_encoding.pth",
}



from perceiverio_pytorch_tpu.utils.image import (  # shared fallback
    resolve_sample_path as _resolve_sample,
)

def img_classify_example(
    prep_type: PrepType = PrepType.FOURIER_POS_CONVNET,
    image_path: str = "./sample_data/dalmation.jpg",
    random_init: bool = False,
):
    ckpt_file = CKPT_FILES[prep_type]
    if not random_init and not os.path.isfile(ckpt_file):
        raise ValueError(
            "Please download the converted checkpoint and place it in"
            " ./pytorch_checkpoints (see README), or pass --random-init for"
            " an untrained demo run."
        )

    img_size = (224, 224)
    model = ClassificationPerceiver(
        num_classes=1000, img_size=img_size, prep_type=prep_type
    )

    img = load_image(_resolve_sample(image_path))
    img_norm = normalize_imagenet(center_crop_resize(img, img_size))
    img_norm = jnp.asarray(img_norm)

    # Jitted init (NOT eval_shape): the template must carry CONCRETE values
    # for the derived "consts" collection (the Fourier position tables) --
    # convert_state_dict keeps them from the template since torch
    # checkpoints have no counterpart.  Jitted init is ~1 s on TPU.
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img_norm)
    if not random_init:
        variables, _ = convert_state_dict(
            load_torch_checkpoint(ckpt_file), variables
        )

    logits = np.asarray(jax.jit(model.apply)(variables, img_norm))
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    top5 = np.argsort(-logits[0])[:5]

    labels = imagenet_labels()
    print("Top 5 labels:")
    for idx in top5:
        print(f"{labels[idx]}: {float(probs[0, idx]) * 100:.1f}%")
    return [labels[i] for i in top5]


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--random-init", action="store_true")
    parser.add_argument("--prep", default="FOURIER_POS_CONVNET",
                        choices=[p.name for p in PrepType])
    args = parser.parse_args()
    img_classify_example(prep_type=PrepType[args.prep],
                         random_init=args.random_init)
