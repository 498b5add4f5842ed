"""Byte-level MLM example (reference: /root/reference/example_language.py).

Loads the converted DeepMind checkpoint
(pytorch_checkpoints/language_perceiver_io_bytes.pth) through the torch
adapter, masks a span of bytes and greedy-decodes the predictions.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from perceiverio_pytorch_tpu.models import LanguagePerceiver
from perceiverio_pytorch_tpu.utils.bytes_tokenizer import BytesTokenizer, pad_sequence
from perceiverio_pytorch_tpu.utils.torch_checkpoint import (
    LANGUAGE_OVERRIDES,
    convert_state_dict,
    load_torch_checkpoint,
)

CKPT_FILE = "./pytorch_checkpoints/language_perceiver_io_bytes.pth"
MAX_SEQ_LEN = 2048


def language_example(random_init: bool = False):
    tokenizer = BytesTokenizer()
    model = LanguagePerceiver(vocab_size=tokenizer.vocab_size)

    if not random_init and not os.path.isfile(CKPT_FILE):
        raise ValueError(
            "Please download the converted checkpoint and place it in"
            " ./pytorch_checkpoints (see README), or pass --random-init for"
            " an untrained demo run."
        )

    input_str = "This is an incomplete sentence where some words are missing."
    input_tokens = tokenizer.to_int(input_str)
    # Mask " missing.". The model performs much better if the masked chunk
    # starts with a space.
    input_tokens[51:60] = tokenizer.mask_token
    print("Tokenized string without masked bytes:")
    print(tokenizer.to_string(input_tokens))

    inputs = input_tokens[None]
    input_mask = np.ones_like(inputs)
    inputs, input_mask = pad_sequence(
        MAX_SEQ_LEN, inputs, input_mask, tokenizer.pad_token
    )
    inputs = jnp.asarray(inputs, jnp.int32)
    input_mask = jnp.asarray(input_mask, bool)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inputs, input_mask)
    if not random_init:
        variables, _ = convert_state_dict(
            load_torch_checkpoint(CKPT_FILE), variables, LANGUAGE_OVERRIDES
        )

    out = jax.jit(model.apply)(variables, inputs, input_mask)

    masked_tokens_predictions = np.asarray(out)[0, 51:60].argmax(axis=-1)
    print("Greedy predictions:")
    print(masked_tokens_predictions)
    print("Predicted string:")
    print(tokenizer.to_string(masked_tokens_predictions))
    return tokenizer.to_string(masked_tokens_predictions)


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--random-init", action="store_true",
                        help="run with untrained weights (demo/smoke mode)")
    language_example(random_init=parser.parse_args().random_init)
