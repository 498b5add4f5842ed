"""Optical flow example (reference: example_opt_flow.py).

Tiled test-mode inference over the Sintel sample frame pair, rendered with
the Middlebury color wheel.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from perceiverio_pytorch_tpu.models import FlowInference, FlowPerceiver
from perceiverio_pytorch_tpu.utils.flow_viz import flow_to_image
from perceiverio_pytorch_tpu.utils.image import load_image
from perceiverio_pytorch_tpu.utils.torch_checkpoint import (
    convert_state_dict,
    load_torch_checkpoint,
)

CKPT_FILE = "./pytorch_checkpoints/optical_flow_checkpoint.pth"



from perceiverio_pytorch_tpu.utils.image import (  # shared fallback
    resolve_sample_path as _resolve_sample,
)

def flow_example(
    frame1_path: str = "./sample_data/frame_0016.png",
    frame2_path: str = "./sample_data/frame_0017.png",
    output_path: str = "./flow_prediction.png",
    random_init: bool = False,
):
    if not random_init and not os.path.isfile(CKPT_FILE):
        raise ValueError(
            "Please download the converted checkpoint and place it in"
            " ./pytorch_checkpoints (see README), or pass --random-init for"
            " an untrained demo run."
        )

    model = FlowPerceiver(img_size=(368, 496))

    img1 = load_image(_resolve_sample(frame1_path))
    img2 = load_image(_resolve_sample(frame2_path))
    # Normalise to [-1, 1]
    img1_norm = jnp.asarray(2 * (img1 / 255.0) - 1.0)
    img2_norm = jnp.asarray(2 * (img2 / 255.0) - 1.0)

    h, w = model.img_size
    # Jitted init (NOT eval_shape): the template must carry CONCRETE values
    # for the derived "consts" Fourier tables, which convert_state_dict
    # keeps from the template (no torch counterpart).
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, h, w)), jnp.zeros((1, 3, h, w))
    )
    if not random_init:
        variables, _ = convert_state_dict(
            load_torch_checkpoint(CKPT_FILE), variables
        )

    infer = FlowInference(model, variables)
    flow = np.asarray(infer(img1_norm, img2_norm, test_mode=True))

    flow_img = flow_to_image(np.transpose(flow[0], (1, 2, 0)))
    try:
        from PIL import Image

        Image.fromarray(flow_img).save(output_path)
        print(f"Flow visualisation written to {output_path}")
    except Exception:
        pass
    return flow


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--random-init", action="store_true")
    flow_example(random_init=parser.parse_args().random_init)
