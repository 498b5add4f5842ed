"""Literal pretrained-checkpoint oracles (auto-skip when weights absent).

The reference's de-facto spec is its examples run against the converted
DeepMind checkpoints (/root/reference/README.md:38-41): the language model
fills the masked span with " missing." (example_language.py:43-70) and the
conv-prep classifier puts Dalmatian top-1 on sample_data/dalmation.jpg
(example_img_classify.py:53-77).  Those .pth files are distributed via
Google Drive and are not bundled here, so these tests SKIP unless the
files are placed in ./pytorch_checkpoints (repo root) or exist under
/root/reference/pytorch_checkpoints.  Everything else about parity is
certified with randomized weights elsewhere in the suite; this module is
the last-mile check that runs the moment real weights are available.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

_CKPT_DIRS = [
    os.path.join(os.path.dirname(__file__), os.pardir, "pytorch_checkpoints"),
    "/root/reference/pytorch_checkpoints",
]


def _find_ckpt(name):
    for d in _CKPT_DIRS:
        path = os.path.join(d, name)
        if os.path.isfile(path):
            return path
    pytest.skip(
        f"pretrained checkpoint {name} not available -- download it from the"
        " reference README's Google-Drive folder into ./pytorch_checkpoints"
        " and this test runs with zero extra work (exact commands:"
        " docs/WEIGHTS.md)"
    )


@pytest.mark.slow
def test_pretrained_language_fills_missing_span():
    ckpt = _find_ckpt("language_perceiver_io_bytes.pth")
    from perceiverio_pytorch_tpu.models import LanguagePerceiver
    from perceiverio_pytorch_tpu.utils.bytes_tokenizer import (
        BytesTokenizer,
        pad_sequence,
    )
    from perceiverio_pytorch_tpu.utils.torch_checkpoint import (
        LANGUAGE_OVERRIDES,
        convert_state_dict,
        load_torch_checkpoint,
    )

    tokenizer = BytesTokenizer()
    model = LanguagePerceiver(vocab_size=tokenizer.vocab_size)

    input_tokens = tokenizer.to_int(
        "This is an incomplete sentence where some words are missing."
    )
    input_tokens[51:60] = tokenizer.mask_token  # masks " missing."
    inputs, input_mask = pad_sequence(
        2048, input_tokens[None], np.ones((1, len(input_tokens)), np.int64),
        tokenizer.pad_token,
    )
    inputs = jnp.asarray(inputs, jnp.int32)
    input_mask = jnp.asarray(input_mask, bool)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inputs, input_mask)
    variables, _ = convert_state_dict(
        load_torch_checkpoint(ckpt), variables, LANGUAGE_OVERRIDES
    )
    logits = jax.jit(model.apply)(variables, inputs, input_mask)
    pred = np.asarray(logits)[0, 51:60].argmax(-1)
    assert tokenizer.to_string(pred) == " missing."


@pytest.mark.slow
def test_pretrained_classification_top1_dalmatian():
    ckpt = _find_ckpt("imagenet_conv_preprocessing.pth")
    img_path = "/root/reference/sample_data/dalmation.jpg"
    if not os.path.isfile(img_path):
        pytest.skip("sample image not available")

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

    model = ClassificationPerceiver(
        num_classes=1000, img_size=(224, 224),
        prep_type=PrepType.FOURIER_POS_CONVNET,
    )
    img = jnp.asarray(
        normalize_imagenet(center_crop_resize(load_image(img_path), (224, 224)))
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    variables, _ = convert_state_dict(load_torch_checkpoint(ckpt), variables)
    logits = np.asarray(jax.jit(model.apply)(variables, img))
    top1 = imagenet_labels()[int(logits[0].argmax())]
    assert "dalmatian" in top1.lower()
