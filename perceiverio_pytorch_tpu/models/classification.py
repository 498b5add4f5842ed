"""ImageNet classification Perceiver.

Reference: /root/reference/perceiver_io/classification_perceiver.py -- three
preprocessing variants matching the three converted DeepMind checkpoints,
512 latents x 1024 channels, 8 weight-shared blocks x 6 self-attends, a
trainable 1000-point query and a take-row-0 classification postprocessor.
"""

from __future__ import annotations

import enum
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from perceiverio_pytorch_tpu.config import DEFAULT, Policy
from perceiverio_pytorch_tpu.core.perceiver import PerceiverIO
from perceiverio_pytorch_tpu.core.position_encoding import PosEncodingType
from perceiverio_pytorch_tpu.core.queries import TrainableQuery
from perceiverio_pytorch_tpu.io_processors.postprocessors import (
    ClassificationPostprocessor,
)
from perceiverio_pytorch_tpu.io_processors.preprocessors import ImagePreprocessor


class PrepType(enum.Enum):
    FOURIER_POS_CONVNET = 1
    LEARNED_POS_1X1CONV = 2
    FOURIER_POS_PIXEL = 3


class ClassificationPerceiver(nn.Module):
    """Perceiver for image classification (classification_perceiver.py:21-131)."""

    num_classes: int = 1000
    img_size: Sequence[int] = (224, 224)
    img_channels: int = 3
    prep_type: PrepType = PrepType.FOURIER_POS_CONVNET
    num_self_attends_per_block: int = 6
    num_blocks: int = 8
    num_latents: int = 512
    num_latent_channels: int = 1024
    policy: Policy = DEFAULT
    remat: bool = False
    # The reference decodes all 1000 trainable queries and then keeps only
    # row 0 (classification_perceiver.py:103-125 + postprocessors.py:187).
    # Attention/LayerNorm/Dense are row-independent, so decoding only query
    # row 0 is mathematically exact and deletes the dead 999-row decode
    # (~2% of total FLOPs at the shipped config).  Param shapes (the full
    # [1000, 1024] query table) are unchanged -- checkpoints stay
    # compatible; unused rows get zero gradients either way.
    single_query_decode: bool = True

    def setup(self):
        if self.prep_type == PrepType.FOURIER_POS_CONVNET:
            input_preprocessor = ImagePreprocessor(
                img_size=tuple(self.img_size),
                input_channels=self.img_channels,
                position_encoding_type=PosEncodingType.FOURIER,
                fourier_position_encoding_kwargs=dict(
                    concat_pos=True,
                    max_resolution=(56, 56),
                    num_bands=64,
                    sine_only=False,
                ),
                prep_type="conv",
            )
        elif self.prep_type == PrepType.LEARNED_POS_1X1CONV:
            input_preprocessor = ImagePreprocessor(
                img_size=tuple(self.img_size),
                input_channels=self.img_channels,
                position_encoding_type=PosEncodingType.TRAINABLE,
                trainable_position_encoding_kwargs=dict(
                    init_scale=0.02,
                    num_channels=256,
                ),
                prep_type="conv1x1",
                project_pos_dim=256,
                num_channels=256,
                spatial_downsample=1,
                concat_or_add_pos="concat",
            )
        elif self.prep_type == PrepType.FOURIER_POS_PIXEL:
            input_preprocessor = ImagePreprocessor(
                img_size=tuple(self.img_size),
                input_channels=self.img_channels,
                position_encoding_type=PosEncodingType.FOURIER,
                fourier_position_encoding_kwargs=dict(
                    concat_pos=True,
                    max_resolution=(224, 224),
                    num_bands=64,
                    sine_only=False,
                ),
                prep_type="pixels",
                spatial_downsample=1,
            )
        else:
            raise ValueError(f"Unknown prep_type type: {self.prep_type}")

        # The learned-position variant was trained without a decoder query
        # residual (classification_perceiver.py:97).
        decoder_query_residual = self.prep_type != PrepType.LEARNED_POS_1X1CONV

        output_query = TrainableQuery(
            output_index_dims=self.num_classes,
            num_channels=1024,
            init_scale=0.02,
        )
        output_postprocessor = ClassificationPostprocessor(
            num_classes=self.num_classes,
            num_input_channels=self.num_classes,
            project=False,
        )

        self.perceiver = PerceiverIO(
            num_blocks=self.num_blocks,
            num_self_attends_per_block=self.num_self_attends_per_block,
            num_latents=self.num_latents,
            num_latent_channels=self.num_latent_channels,
            input_preprocessors=input_preprocessor,
            perceiver_encoder_kwargs=dict(
                num_self_attend_heads=8,
                use_query_residual=True,
            ),
            output_queries=output_query,
            perceiver_decoder_kwargs=dict(
                use_query_residual=decoder_query_residual,
            ),
            final_project_out_channels=self.num_classes,
            output_postprocessors=output_postprocessor,
            policy=self.policy,
            remat=self.remat,
        )

    def __call__(self, img, *, deterministic: bool = True):
        """img: [B, 3, H, W] (reference channel-first convention)."""
        subsampled = None
        if self.single_query_decode:
            subsampled = {"__default": jnp.arange(1)}
        return self.perceiver(
            img,
            subsampled_output_points=subsampled,
            deterministic=deterministic,
        )
