"""Output postprocessors (reference: io_processors/postprocessors.py).

Interface contract: ``__call__(inputs, *, pos=None, modality_sizes=None)``.

The reference leaves the "conv"/"conv1x1"/"raft" ImagePostprocessor variants
as NotImplementedError stubs over commented-out haiku scaffolding
(postprocessors.py:66-88, processor_utils.py:182-274); here the "conv"
variant is functional via the Conv2D/3DUpsample modules.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from perceiverio_pytorch_tpu.io_processors.processor_utils import (
    Conv2DUpsample,
    Conv3DUpsample,
    reverse_space_to_depth,
)
from perceiverio_pytorch_tpu.utils.initializers import lecun_normal


class EmbeddingPostprocessor(nn.Module):
    """Tied-weight decode: ``out @ embedding.T + bias`` (postprocessors.py:12-34).

    ``embedding`` is the shared ``nn.Embed`` module from the preprocessor.
    """

    embedding: nn.Module
    vocab_size: int

    @nn.compact
    def __call__(self, inputs, *, pos=None, modality_sizes=None):
        bias = self.param("bias", nn.initializers.zeros, (self.vocab_size,))
        # nn.Embed.attend computes inputs @ embedding.T with shared weights.
        output = self.embedding.attend(inputs)
        return output + bias


class ImagePostprocessor(nn.Module):
    """Image postprocessing (postprocessors.py:37-122)."""

    img_size: Sequence[int]
    input_channels: int = 3
    postproc_type: str = "pixels"
    spatial_upsample: int = 1
    temporal_upsample: int = 1
    n_outputs: int = -1
    input_reshape_size: Optional[Sequence[int]] = None

    def setup(self):
        if self.postproc_type not in ("conv", "patches", "pixels", "raft", "conv1x1"):
            raise ValueError("Invalid postproc_type!")
        if self.postproc_type == "pixels":
            if self.temporal_upsample != 1 or self.spatial_upsample != 1:
                raise ValueError("Pixels postprocessing should not currently upsample.")
        elif self.postproc_type == "conv1x1":
            if self.n_outputs == -1:
                raise ValueError("Expected value for n_outputs")
            assert self.temporal_upsample == 1, "conv1x1 does not upsample in time."
            self.conv1x1 = nn.Conv(
                features=self.n_outputs,
                kernel_size=(1, 1),
                strides=(self.spatial_upsample, self.spatial_upsample),
            )
        elif self.postproc_type == "conv":
            if self.n_outputs == -1:
                raise ValueError("Expected value for n_outputs")
            if self.temporal_upsample != 1:

                def int_log2(x):
                    return int(round(float(jnp.log2(x))))

                self.convnet = Conv3DUpsample(
                    n_outputs=self.n_outputs,
                    n_time_upsamples=int_log2(self.temporal_upsample),
                    n_space_upsamples=int_log2(self.spatial_upsample),
                )
            else:
                self.convnet = Conv2DUpsample(n_outputs=self.n_outputs)

    def __call__(self, inputs, *, pos=None, modality_sizes=None):
        """inputs: [B, N, C] or already-shaped spatial array (channel-last)."""
        if self.input_reshape_size is not None:
            inputs = inputs.reshape(
                (inputs.shape[0],)
                + tuple(self.input_reshape_size)
                + (inputs.shape[-1],)
            )

        if self.postproc_type in ("conv", "raft"):
            has_temp_dim = inputs.ndim == 5
            if has_temp_dim and self.temporal_upsample == 1:
                b, t = inputs.shape[:2]
                inputs = inputs.reshape((b * t,) + inputs.shape[2:])
                inputs = self.convnet(inputs)
                inputs = inputs.reshape((b, t) + inputs.shape[1:])
            else:
                inputs = self.convnet(inputs)
        elif self.postproc_type == "conv1x1":
            inputs = self.conv1x1(inputs)
        elif self.postproc_type == "patches":
            inputs = reverse_space_to_depth(
                inputs, self.temporal_upsample, self.spatial_upsample
            )
        return inputs


class AudioPostprocessor(nn.Module):
    """Linear to waveform patches, flattened (postprocessors.py:125-149)."""

    postproc_type: str = "patches"
    in_channels: int = 1024
    samples_per_patch: int = 96

    @nn.compact
    def __call__(self, inputs, *, pos=None, modality_sizes=None):
        if self.postproc_type not in ("patches",):
            raise ValueError("Invalid postproc_type!")
        out = nn.Dense(
            self.samples_per_patch,
            kernel_init=lecun_normal(),
            bias_init=nn.initializers.zeros,
            name="linear",
        )(inputs)
        return out.reshape(inputs.shape[0], -1)


class IdentityPostprocessor(nn.Module):
    """Passes inputs through unchanged."""

    def __call__(self, inputs, *, pos=None, modality_sizes=None):
        return inputs


class ClassificationPostprocessor(nn.Module):
    """Optional projection, then take index 0 (postprocessors.py:164-187)."""

    num_input_channels: int
    num_classes: int
    project: bool = True

    @nn.compact
    def __call__(self, inputs, *, pos=None, modality_sizes=None):
        logits = inputs
        if self.project:
            logits = nn.Dense(
                self.num_classes,
                kernel_init=lecun_normal(),
                bias_init=nn.initializers.zeros,
                name="linear",
            )(logits)
        return logits[:, 0, :]


class ProjectionPostprocessor(nn.Module):
    """Linear projection (e.g. 512 -> 3 RGB) (postprocessors.py:190-208)."""

    num_inputs: int
    num_outputs: int

    @nn.compact
    def __call__(self, inputs, *, pos=None, modality_sizes=None):
        return nn.Dense(
            self.num_outputs,
            kernel_init=lecun_normal(),
            bias_init=nn.initializers.zeros,
            name="projection",
        )(inputs)


class FlowPostprocessor(nn.Module):
    """Scale and reshape [B, N, 2] -> [B, 2, H, W] (postprocessors.py:211-230)."""

    img_size: Sequence[int]
    flow_scale_factor: float = 1.0

    def __call__(self, inputs, *, pos=None, modality_sizes=None):
        batch_size = inputs.shape[0]
        inputs = inputs * self.flow_scale_factor
        flow = inputs.reshape(batch_size, *self.img_size, 2)
        return jnp.transpose(flow, (0, 3, 1, 2))
