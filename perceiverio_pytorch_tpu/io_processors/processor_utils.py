"""Tensor-shuffling utilities for IO processors.

Re-implementation of /root/reference/perceiver_io/io_processors/processor_utils.py
in channel-last JAX (TPU's native layout):
  * ``space_to_depth`` / ``reverse_space_to_depth`` (:21-56) -- einops
    rearranges for rank-4 images and rank-5 video.
  * ``extract_patches`` (:59-95) -- conv-style patch extraction; the channel
    order of the flattened patch is (ph, pw, c) exactly as the reference's
    rearrange produces from F.unfold.  Implemented as statically unrolled
    strided slices, which XLA fuses into the consumer (no gather, no unfold
    buffer).
  * ``patches_for_flow`` (:98-116) -- pad 1px + 3x3 patches per frame.
  * ``Conv2DDownsample`` (:124-180) -- per layer: TF-SAME pad, 7x7 stride-2
    conv (no bias), BatchNorm, ReLU, SAME pad, 3x3 stride-2 max-pool.
  * ``Conv2DUpsample`` / ``Conv3DUpsample`` -- implemented here (they are
    dead commented-out scaffolding in the reference :182-274) so the "conv"
    image postprocessor family is usable.

All functions take/return channel-LAST arrays except where noted; the
preprocessors convert from the reference's channel-first public interface at
their boundary.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import einops
import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from perceiverio_pytorch_tpu.utils.conv_shapes import conv_output_shape, same_padding
from perceiverio_pytorch_tpu.utils.initializers import trunc_normal


def space_to_depth(
    frames: jnp.ndarray,
    temporal_block_size: int = 1,
    spatial_block_size: int = 1,
) -> jnp.ndarray:
    """Stack spatial/temporal blocks into the channel dim (channel-last)."""
    if frames.ndim == 4:
        return einops.rearrange(
            frames,
            "b (h dh) (w dw) c -> b h w (dh dw c)",
            dh=spatial_block_size,
            dw=spatial_block_size,
        )
    if frames.ndim == 5:
        return einops.rearrange(
            frames,
            "b (t dt) (h dh) (w dw) c -> b t h w (dt dh dw c)",
            dt=temporal_block_size,
            dh=spatial_block_size,
            dw=spatial_block_size,
        )
    raise ValueError(
        "Frames should be of rank 4 (batch, height, width, channels)"
        " or rank 5 (batch, time, height, width, channels)"
    )


def reverse_space_to_depth(
    frames: jnp.ndarray,
    temporal_block_size: int = 1,
    spatial_block_size: int = 1,
) -> jnp.ndarray:
    """Inverse of ``space_to_depth``."""
    if frames.ndim == 4:
        return einops.rearrange(
            frames,
            "b h w (dh dw c) -> b (h dh) (w dw) c",
            dh=spatial_block_size,
            dw=spatial_block_size,
        )
    if frames.ndim == 5:
        return einops.rearrange(
            frames,
            "b t h w (dt dh dw c) -> b (t dt) (h dh) (w dw) c",
            dt=temporal_block_size,
            dh=spatial_block_size,
            dw=spatial_block_size,
        )
    raise ValueError(
        "Frames should be of rank 4 (batch, height, width, channels)"
        " or rank 5 (batch, time, height, width, channels)"
    )


def _pair(v: Union[int, Sequence[int]]) -> tuple:
    if isinstance(v, (int, np.integer)):
        return (int(v), int(v))
    return tuple(int(x) for x in v)


def extract_patches(
    images: jnp.ndarray,
    size: Sequence[int],
    stride: Union[int, Sequence[int]] = 1,
    dilation: Union[int, Sequence[int]] = 1,
    padding: str = "VALID",
) -> jnp.ndarray:
    """Extract patches, stacked into channels in (ph, pw, c) order.

    Args:
      images: [B, H, W, C] channel-last input.
      size: [patch_height, patch_width].
    Returns:
      [B, out_h, out_w, ph * pw * C].
    """
    if padding != "VALID":
        raise ValueError(f"Only valid padding is supported. Got {padding}")
    if images.ndim != 4:
        raise ValueError(
            f"Rank of images must be 4 (got tensor of shape {images.shape})"
        )
    ph, pw = _pair(size)
    sh, sw = _pair(stride)
    dh, dw = _pair(dilation)
    _, h, w, _ = images.shape
    out_h, out_w = conv_output_shape((h, w), (ph, pw), (sh, sw), 0, (dh, dw))

    # Statically unrolled shifted strided slices; XLA fuses these into the
    # consumer so no intermediate unfold buffer is materialised.
    pieces = []
    for i in range(ph):
        for j in range(pw):
            top, left = i * dh, j * dw
            pieces.append(
                images[
                    :,
                    top : top + (out_h - 1) * sh + 1 : sh,
                    left : left + (out_w - 1) * sw + 1 : sw,
                    :,
                ]
            )
    return jnp.concatenate(pieces, axis=-1)


def patches_for_flow(inputs: jnp.ndarray) -> jnp.ndarray:
    """3x3 patch features per frame for flow inputs.

    Args:
      inputs: [N, T, H, W, C] channel-last frame stack.
    Returns:
      [N, T, H, W, 9*C].
    """
    n, t = inputs.shape[:2]
    flat = inputs.reshape((n * t,) + inputs.shape[2:])
    padded = jnp.pad(flat, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = extract_patches(padded, size=(3, 3), stride=1, dilation=1)
    return patches.reshape((n, t) + patches.shape[1:])


class Conv2DDownsample(nn.Module):
    """Downsample 4x per layer: SAME-pad 7x7 s2 conv, BN, ReLU, 3x3 s2 pool."""

    num_layers: int = 1
    num_channels: int = 64
    use_batchnorm: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        """inputs: [B, H, W, C] channel-last."""
        out = inputs
        for layer in range(self.num_layers):
            pad = same_padding(out.shape[1:3], 7, 2, dims=2)
            # same_padding returns [left, right, ...] pairs in reverse-dim
            # (torch F.pad) order: ((w_l, w_r), (h_l, h_r)).
            out = jnp.pad(
                out,
                ((0, 0), tuple(pad[2:4]), tuple(pad[0:2]), (0, 0)),
            )
            out = nn.Conv(
                features=self.num_channels,
                kernel_size=(7, 7),
                strides=(2, 2),
                padding="VALID",
                use_bias=False,
                kernel_init=trunc_normal(0.01),
                dtype=self.dtype,
                name=f"convs_{layer}",
            )(out)
            if self.use_batchnorm:
                out = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=jnp.float32,
                    name=f"norms_{layer}",
                )(out)
            out = nn.relu(out)
            pad = same_padding(out.shape[1:3], 3, 2, dims=2)
            # Constant-0 padding before max-pool matches the reference
            # (processor_utils.py:176-178); post-ReLU activations are >= 0 so
            # the padded zeros never win incorrectly at the border.
            out = jnp.pad(
                out,
                ((0, 0), tuple(pad[2:4]), tuple(pad[0:2]), (0, 0)),
            )
            out = nn.max_pool(out, window_shape=(3, 3), strides=(2, 2), padding="VALID")
        return out


class Conv2DUpsample(nn.Module):
    """Upsample 4x with two stride-2 transposed convolutions.

    The reference declares but never implements this (processor_utils.py:182-236);
    provided here so the "conv" ImagePostprocessor variant is functional.
    """

    n_outputs: int

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        out = nn.ConvTranspose(
            features=self.n_outputs * 2,
            kernel_size=(4, 4),
            strides=(2, 2),
            padding="SAME",
            name="transp_conv1",
        )(inputs)
        out = nn.relu(out)
        out = nn.ConvTranspose(
            features=self.n_outputs,
            kernel_size=(4, 4),
            strides=(2, 2),
            padding="SAME",
            name="transp_conv2",
        )(out)
        return out


class Conv3DUpsample(nn.Module):
    """Progressive 3-D transposed-conv upsampler (time + space)."""

    n_outputs: int
    n_time_upsamples: int = 2
    n_space_upsamples: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n_upsamples = max(self.n_time_upsamples, self.n_space_upsamples)
        for i in range(n_upsamples):
            time_stride = 2 if i < self.n_time_upsamples else 1
            space_stride = 2 if i < self.n_space_upsamples else 1
            channels = self.n_outputs * pow(2, n_upsamples - 1 - i)
            x = nn.ConvTranspose(
                features=channels,
                kernel_size=(4, 4, 4),
                strides=(time_stride, space_stride, space_stride),
                padding="SAME",
                name=f"conv3d_transpose_{i}",
            )(x)
            if i != n_upsamples - 1:
                x = nn.relu(x)
        return x
