"""Input preprocessors: embedding, image, one-hot, audio.

Re-implementation of /root/reference/perceiver_io/io_processors/preprocessors.py.
Public interface contract per preprocessor:
  ``__call__(inputs, *, pos=None) -> (inputs_with_pos, inputs_without_pos)``
and a static ``n_output_channels()``.

Inputs follow the reference's channel-FIRST convention at the boundary
([B, C, H, W] images, [B, T, C, H, W] video) and are transposed to
channel-last internally -- channel-last is TPU/XLA's native conv layout, so
the hot path never pays a transpose after the first op.

The reference's ``n_extra_pos_mlp > 0`` path is broken (preprocessors.py:191
calls a Linear on an int, then calls the result); we implement the intended
residual-MLP semantics instead: ``pos = pos + linear_i(pos)`` with ReLU
between stacked layers.
"""

from __future__ import annotations

import math
from typing import Any, Mapping, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from perceiverio_pytorch_tpu.core import position_encoding
from perceiverio_pytorch_tpu.core.position_encoding import PosEncodingType
from perceiverio_pytorch_tpu.io_processors.processor_utils import (
    Conv2DDownsample,
    space_to_depth,
)
from perceiverio_pytorch_tpu.utils.initializers import lecun_normal, trunc_normal

PreprocessorOutput = Tuple[jnp.ndarray, jnp.ndarray]


class EmbeddingPreprocessor(nn.Module):
    """Token embedding + trainable position encoding (preprocessors.py:18-54).

    ``embed`` may be passed in to share the table with an
    ``EmbeddingPostprocessor`` (tied weights, language_perceiver.py:58).
    """

    vocab_size: int
    max_seq_len: int
    embedding_dims: int
    embed: Optional[nn.Module] = None

    def setup(self):
        self.input_pos_encoding = position_encoding.TrainablePositionEncoding(
            index_dim=self.max_seq_len,
            num_channels=self.embedding_dims,
        )
        if self.embed is None:
            self.embedding = nn.Embed(
                num_embeddings=self.vocab_size,
                features=self.embedding_dims,
                name="embed",
            )
        else:
            self.embedding = self.embed

    def n_output_channels(self) -> int:
        return self.embedding_dims

    def __call__(self, inputs, *, pos=None, train: bool = False) -> PreprocessorOutput:
        del train  # no train-dependent state; part of the uniform protocol
        batch_size = inputs.shape[0]
        embedding_inputs = self.embedding(inputs)
        input_pos_encoding = self.input_pos_encoding(batch_size)
        return embedding_inputs + input_pos_encoding, embedding_inputs


class _ExtraPosMLP(nn.Module):
    """Residual linear stack over a position encoding (intended semantics of
    the reference's broken ``n_extra_pos_mlp`` path, preprocessors.py:143-152,
    190-193)."""

    n_layers: int
    channels: int

    @nn.compact
    def __call__(self, pos_enc):
        for i in range(self.n_layers):
            delta = nn.Dense(
                self.channels,
                kernel_init=lecun_normal(),
                bias_init=nn.initializers.zeros,
                name=f"linear_{i}",
            )(pos_enc)
            pos_enc = pos_enc + delta
            if i < self.n_layers - 1:
                pos_enc = nn.relu(pos_enc)
        return pos_enc


class ImagePreprocessor(nn.Module):
    """Image featurization: conv / conv1x1 / patches / pixels
    (preprocessors.py:57-258)."""

    img_size: Sequence[int]
    num_frames: int = 1
    input_channels: int = 3
    prep_type: str = "conv"
    spatial_downsample: int = 4
    temporal_downsample: int = 1
    position_encoding_type: PosEncodingType = PosEncodingType.FOURIER
    n_extra_pos_mlp: int = 0
    num_channels: int = 64
    conv_after_patching: bool = False
    conv2d_use_batchnorm: bool = True
    concat_or_add_pos: str = "concat"
    project_pos_dim: int = -1
    trainable_position_encoding_kwargs: Optional[Mapping[str, Any]] = None
    fourier_position_encoding_kwargs: Optional[Mapping[str, Any]] = None

    def _index_dims(self):
        # ceil division: the pixels path's strided slice ([::k]) and the
        # SAME-padded convs both produce ceil(d/k) positions, so floor
        # would mis-size the position grid whenever d % k != 0 (the
        # patches path requires exact divisibility and errors upstream)
        dims = [-(-d // self.spatial_downsample) for d in self.img_size]
        if self.num_frames > 1:
            dims = [
                -(-self.num_frames // self.temporal_downsample)
            ] + dims
        return dims

    def _pos_enc_channels(self) -> int:
        if self.project_pos_dim > 0:
            return self.project_pos_dim
        if self.position_encoding_type == PosEncodingType.TRAINABLE:
            return self.trainable_position_encoding_kwargs["num_channels"]
        kw = dict(self.fourier_position_encoding_kwargs)
        resolution = kw.get("max_resolution") or self._index_dims()
        num = kw["num_bands"] * (1 if kw.get("sine_only", False) else 2)
        num *= len(resolution)
        if kw.get("concat_pos", True):
            num += len(resolution)
        return num

    def n_output_channels(self) -> int:
        if self.prep_type == "pixels":
            out = self.input_channels
        elif self.prep_type == "patches":
            if self.conv_after_patching:
                out = self.num_channels
            else:
                out = (
                    self.input_channels
                    * self.spatial_downsample**2
                    * self.temporal_downsample
                )
        else:
            out = self.num_channels
        if self.concat_or_add_pos == "concat":
            out += self._pos_enc_channels()
        return out

    def setup(self):
        if self.prep_type not in ("conv", "patches", "pixels", "conv1x1"):
            raise ValueError("Invalid prep_type!")
        if self.concat_or_add_pos not in ("concat", "add"):
            raise ValueError(
                f"Invalid value {self.concat_or_add_pos} for concat_or_add_pos."
            )

        if self.prep_type == "conv":
            convnet_num_layers = math.log(self.spatial_downsample, 4)
            if (
                convnet_num_layers != round(convnet_num_layers)
                or self.temporal_downsample != 1
            ):
                raise ValueError(
                    "Only powers of 4 expected for spatial and 1 expected for"
                    " temporal downsampling with conv."
                )
            self.convnet = Conv2DDownsample(
                num_layers=int(convnet_num_layers),
                num_channels=self.num_channels,
                use_batchnorm=self.conv2d_use_batchnorm,
            )
        elif self.prep_type == "conv1x1":
            assert self.temporal_downsample == 1, "conv1x1 does not downsample in time."
            self.convnet_1x1 = nn.Conv(
                features=self.num_channels,
                kernel_size=(1, 1),
                strides=(self.spatial_downsample, self.spatial_downsample),
                kernel_init=trunc_normal(0.01),
                bias_init=nn.initializers.zeros,
            )

        self.positional_encoding = position_encoding.build_position_encoding(
            position_encoding_type=self.position_encoding_type,
            index_dims=self._index_dims(),
            project_pos_dim=self.project_pos_dim,
            trainable_position_encoding_kwargs=self.trainable_position_encoding_kwargs,
            fourier_position_encoding_kwargs=self.fourier_position_encoding_kwargs,
        )

        if self.n_extra_pos_mlp > 0:
            self.extra_pos_mlp = _ExtraPosMLP(
                n_layers=self.n_extra_pos_mlp,
                channels=self._pos_enc_channels(),
            )

        if self.conv_after_patching:
            self.conv_after_patch_layer = nn.Dense(
                self.num_channels,
                kernel_init=lecun_normal(),
                bias_init=nn.initializers.zeros,
            )

    def _build_network_inputs(self, inputs, pos) -> PreprocessorOutput:
        """Flatten index dims to one axis and attach the position encoding."""
        batch_size = inputs.shape[0]
        if inputs.ndim > 3:
            inputs = inputs.reshape(
                batch_size, int(np.prod(self._index_dims())), -1
            )

        pos_enc = self.positional_encoding(batch_size, pos=pos)
        if self.n_extra_pos_mlp > 0:
            pos_enc = self.extra_pos_mlp(pos_enc)

        pos_enc = pos_enc.astype(inputs.dtype)
        if self.concat_or_add_pos == "concat":
            inputs_with_pos = jnp.concatenate([inputs, pos_enc], axis=-1)
        else:
            inputs_with_pos = inputs + pos_enc
        return inputs_with_pos, inputs

    def __call__(self, inputs, *, pos=None, train: bool = False) -> PreprocessorOutput:
        """inputs: channel-first [B, C, H, W] or [B, T, C, H, W] (reference
        convention, preprocessors.py:205)."""
        if self.prep_type in ("conv", "conv1x1"):
            has_temp_dim = inputs.ndim == 5
            if has_temp_dim:
                b, t = inputs.shape[:2]
                inputs = inputs.reshape((b * t,) + inputs.shape[2:])
            # NCHW -> NHWC once; conv runs in TPU-native channel-last.
            inputs = jnp.moveaxis(inputs, -3, -1)
            if self.prep_type == "conv":
                inputs = self.convnet(inputs, train=train)
            else:
                inputs = self.convnet_1x1(inputs)
            if has_temp_dim:
                inputs = inputs.reshape((b, t) + inputs.shape[1:])
        elif self.prep_type == "patches":
            inputs = jnp.moveaxis(inputs, -3, -1)
            inputs = space_to_depth(
                inputs,
                temporal_block_size=self.temporal_downsample,
                spatial_block_size=self.spatial_downsample,
            )
            if inputs.ndim == 5 and inputs.shape[1] == 1:
                # Optical flow: both frames folded into channels.
                inputs = jnp.squeeze(inputs, axis=1)
            if self.conv_after_patching:
                inputs = self.conv_after_patch_layer(inputs)
        elif self.prep_type == "pixels":
            inputs = jnp.moveaxis(inputs, -3, -1)
            if inputs.ndim == 4:
                inputs = inputs[
                    :, :: self.spatial_downsample, :: self.spatial_downsample
                ]
            elif inputs.ndim == 5:
                inputs = inputs[
                    :,
                    :: self.temporal_downsample,
                    :: self.spatial_downsample,
                    :: self.spatial_downsample,
                ]
            else:
                raise ValueError("Unsupported data format for pixels.")

        return self._build_network_inputs(inputs, pos)


class OneHotPreprocessor(nn.Module):
    """Adds a dummy index dim: [B, C] -> [B, 1, C] (preprocessors.py:261-282)."""

    input_channels: int

    def n_output_channels(self) -> int:
        return self.input_channels

    def __call__(self, inputs, *, pos=None, train: bool = False) -> PreprocessorOutput:
        del train  # no train-dependent state; part of the uniform protocol
        inputs = inputs[:, None, :]
        return inputs, inputs


class AudioPreprocessor(nn.Module):
    """Waveform -> patch tokens + position encoding (preprocessors.py:285-364)."""

    samples_per_batch: int
    prep_type: str = "patches"
    samples_per_patch: int = 96
    position_encoding_type: PosEncodingType = PosEncodingType.FOURIER
    n_extra_pos_mlp: int = 0
    concat_or_add_pos: str = "concat"
    project_pos_dim: int = -1
    trainable_position_encoding_kwargs: Optional[Mapping[str, Any]] = None
    fourier_position_encoding_kwargs: Optional[Mapping[str, Any]] = None

    def _index_dims(self):
        return [self.samples_per_batch // self.samples_per_patch]

    def _pos_enc_channels(self) -> int:
        if self.project_pos_dim > 0:
            return self.project_pos_dim
        if self.position_encoding_type == PosEncodingType.TRAINABLE:
            return self.trainable_position_encoding_kwargs["num_channels"]
        kw = dict(self.fourier_position_encoding_kwargs)
        resolution = kw.get("max_resolution") or self._index_dims()
        num = kw["num_bands"] * (1 if kw.get("sine_only", False) else 2)
        num *= len(resolution)
        if kw.get("concat_pos", True):
            num += len(resolution)
        return num

    def n_output_channels(self) -> int:
        out = self.samples_per_patch
        if self.concat_or_add_pos == "concat":
            out += self._pos_enc_channels()
        return out

    def setup(self):
        if self.prep_type not in ("patches",):
            raise ValueError("Invalid prep_type!")
        if self.concat_or_add_pos not in ("concat", "add"):
            raise ValueError(
                f"Invalid value {self.concat_or_add_pos} for concat_or_add_pos."
            )
        self.positional_encoding = position_encoding.build_position_encoding(
            position_encoding_type=self.position_encoding_type,
            index_dims=self._index_dims(),
            project_pos_dim=self.project_pos_dim,
            trainable_position_encoding_kwargs=self.trainable_position_encoding_kwargs,
            fourier_position_encoding_kwargs=self.fourier_position_encoding_kwargs,
        )
        if self.n_extra_pos_mlp > 0:
            self.extra_pos_mlp = _ExtraPosMLP(
                n_layers=self.n_extra_pos_mlp,
                channels=self._pos_enc_channels(),
            )

    def __call__(self, inputs, *, pos=None, train: bool = False) -> PreprocessorOutput:
        del train  # no train-dependent state; part of the uniform protocol
        inputs = inputs.reshape(inputs.shape[0], -1, self.samples_per_patch)
        batch_size = inputs.shape[0]

        pos_enc = self.positional_encoding(batch_size, pos=pos)
        if self.n_extra_pos_mlp > 0:
            pos_enc = self.extra_pos_mlp(pos_enc)
        pos_enc = pos_enc.astype(inputs.dtype)

        if self.concat_or_add_pos == "concat":
            inputs_with_pos = jnp.concatenate([inputs, pos_enc], axis=-1)
        else:
            inputs_with_pos = inputs + pos_enc
        return inputs_with_pos, inputs
