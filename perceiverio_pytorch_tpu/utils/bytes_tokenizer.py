"""UTF-8 byte tokenizer with 6 reserved tokens.

Capability match for /root/reference/utils/bytes_tokenizer.py: token ids are
raw UTF-8 bytes shifted by the 6 reserved ids (PAD=0, BOS=1, EOS=2, MASK=3,
CLS=4, SEP=5); vocab size 262.
"""

from __future__ import annotations

from typing import Union

import numpy as np

NUM_RESERVED_TOKENS = 6  # PAD, BOS, EOS, MASK, CLS, SEP


class BytesTokenizer:
    """Tokenizes strings to their UTF-8 bytes (shifted past reserved ids)."""

    def to_string(self, inputs: np.ndarray) -> str:
        inputs = np.asarray(inputs)
        inputs_no_special = (
            inputs[inputs >= NUM_RESERVED_TOKENS] - NUM_RESERVED_TOKENS
        )
        return inputs_no_special.astype(np.uint8).tobytes().decode(
            "utf-8", errors="replace"
        )

    def to_int(self, inputs: Union[str, bytes]) -> np.ndarray:
        if isinstance(inputs, str):
            inputs = inputs.encode("utf-8")
        encoded = np.frombuffer(inputs, np.uint8).astype(np.int32)
        return (encoded + NUM_RESERVED_TOKENS).astype(np.int32)

    @property
    def vocab_size(self) -> int:
        return 256 + NUM_RESERVED_TOKENS

    @property
    def pad_token(self) -> int:
        return 0

    @property
    def bos_token(self) -> int:
        return 1

    @property
    def eos_token(self) -> int:
        return 2

    @property
    def mask_token(self) -> int:
        return 3

    @property
    def cls_token(self) -> int:
        return 4

    @property
    def sep_token(self) -> int:
        return 5


def pad_sequence(max_sequence_length: int, inputs, input_mask, pad_token: int = 0):
    """Right-pad token ids and mask to ``max_sequence_length``."""
    input_len = inputs.shape[1]
    assert input_len <= max_sequence_length
    pad_len = max_sequence_length - input_len
    padded_inputs = np.pad(
        inputs, ((0, 0), (0, pad_len)), constant_values=pad_token
    )
    padded_mask = np.pad(input_mask, ((0, 0), (0, pad_len)), constant_values=0)
    return padded_inputs, padded_mask
