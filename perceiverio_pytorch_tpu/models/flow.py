"""Optical-flow Perceiver with tiled test-mode inference.

Reference: /root/reference/perceiver_io/flow_perceiver.py -- 3x3 patch
features over 2 stacked frames, 2048 latents x 512, 24 self-attends with 16
heads, a zero-initialised decoder projection, flow scale 0.2, and
test-mode spatial tiling with centre-weighted overlap blending.

Split TPU-first:
  * ``FlowPerceiver`` (linen module): the jittable train-size single-tile
    forward -- the 182k-token cross-attend / decode hot path.
  * ``FlowInference`` (host wrapper): arbitrary-size images tiled into
    train-size patches on the host, one jitted tile function compiled once,
    centre-weighted blending accumulated on device.
"""

from __future__ import annotations

import itertools
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from perceiverio_pytorch_tpu.config import DEFAULT, Policy
from perceiverio_pytorch_tpu.core.perceiver import PerceiverIO
from perceiverio_pytorch_tpu.core.position_encoding import PosEncodingType
from perceiverio_pytorch_tpu.core.queries import FlowQuery
from perceiverio_pytorch_tpu.io_processors.postprocessors import FlowPostprocessor
from perceiverio_pytorch_tpu.io_processors.preprocessors import ImagePreprocessor
from perceiverio_pytorch_tpu.io_processors.processor_utils import patches_for_flow


class FlowPerceiver(nn.Module):
    """Perceiver for optical flow (flow_perceiver.py:20-97)."""

    img_size: Sequence[int] = (368, 496)
    flow_scale_factor: float = 20 / 100
    num_latents: int = 2048
    num_latent_channels: int = 512
    num_self_attends_per_block: int = 24
    num_blocks: int = 1
    policy: Policy = DEFAULT
    remat: bool = False

    def setup(self):
        channels = 3
        patch_size = 3
        preprocessor_channels = 64

        input_preprocessor = ImagePreprocessor(
            img_size=tuple(self.img_size),
            input_channels=channels * patch_size**2,
            position_encoding_type=PosEncodingType.FOURIER,
            fourier_position_encoding_kwargs=dict(
                num_bands=64,
                max_resolution=tuple(self.img_size),
                sine_only=False,
                concat_pos=True,
            ),
            n_extra_pos_mlp=0,
            prep_type="patches",
            spatial_downsample=1,
            conv_after_patching=True,
            temporal_downsample=2,
            num_channels=preprocessor_channels,
        )

        output_query = FlowQuery(
            preprocessed_input_channels=input_preprocessor.n_output_channels(),
            output_img_size=tuple(self.img_size),
            output_num_channels=2,
        )
        postprocessor = FlowPostprocessor(
            img_size=tuple(self.img_size),
            flow_scale_factor=self.flow_scale_factor,
        )

        self.perceiver = PerceiverIO(
            final_project_out_channels=2,
            num_blocks=self.num_blocks,
            num_self_attends_per_block=self.num_self_attends_per_block,
            num_latents=self.num_latents,
            num_latent_channels=self.num_latent_channels,
            perceiver_encoder_kwargs=dict(num_self_attend_heads=16),
            perceiver_decoder_kwargs=dict(output_w_init="zeros"),
            output_queries=output_query,
            input_preprocessors=input_preprocessor,
            output_postprocessors=postprocessor,
            policy=self.policy,
            remat=self.remat,
        )

    def __call__(self, image1, image2, *, deterministic: bool = True):
        """Flow for a train-size frame pair.

        Args:
          image1, image2: [B, 3, H, W] with (H, W) == img_size, normalised to
            [-1, 1].
        Returns:
          [B, 2, H, W] flow field.
        """
        h, w = self.img_size
        assert image1.shape[-2:] == (h, w), (
            f"Images must have size {self.img_size}; use FlowInference for"
            f" arbitrary sizes (got {image1.shape})."
        )
        # Stack frames in a time dim, then 3x3 patch features per frame
        # (flow_perceiver.py:127-133); channel-last internally.
        inputs = jnp.stack([image1, image2], axis=1)  # [B, 2, 3, H, W]
        inputs = jnp.moveaxis(inputs, -3, -1)  # [B, 2, H, W, 3]
        patches = patches_for_flow(inputs)  # [B, 2, H, W, 27]
        patches = jnp.moveaxis(patches, -1, -3)  # [B, 2, 27, H, W]
        return self.perceiver(patches, deterministic=deterministic)


def compute_grid_indices(
    image_shape: Sequence[int], patch_size: Sequence[int], min_overlap: int = 20
):
    """Top-left coordinates of train-size tiles covering ``image_shape``
    (flow_perceiver.py:101-125)."""
    ph, pw = patch_size
    if min_overlap >= ph or min_overlap >= pw:
        raise ValueError(
            f"Overlap should be less than size of patch (got {min_overlap}"
            f"for patch size {(ph, pw)})."
        )
    ys = list(range(0, image_shape[0], ph - min_overlap))
    xs = list(range(0, image_shape[1], pw - min_overlap))
    # Clamp EVERY origin so its tile stays inside the image, then dedupe
    # preserving order.  The reference clamps only the last origin
    # (flow_perceiver.py:113-117), so an image dimension in
    # (k*step, k*step + min_overlap) emits an intermediate tile that
    # overflows the boundary and crashes the tile slice -- a reference bug
    # not reproduced here (SURVEY.md: implement the intended semantics).
    ys = list(dict.fromkeys(min(y, image_shape[0] - ph) for y in ys))
    xs = list(dict.fromkeys(min(x, image_shape[1] - pw) for x in xs))
    return list(itertools.product(ys, xs))


class FlowInference:
    """Arbitrary-size flow inference: host tiling + jitted tile forward.

    All tiles of an image are stacked into one batched forward (better MXU
    utilisation and a single dispatch instead of one per tile); the per-grid
    function is compiled once per (image-size, batch) and reused.  Blending
    weights (centre-weighted, flow_perceiver.py:177-189) are precomputed.
    """

    def __init__(
        self,
        model: FlowPerceiver,
        params,
        min_overlap: int = 20,
        batch_tiles: bool = True,
        mesh=None,
        wave_size: int = 0,
    ):
        """``wave_size``: when >0 and the stacked tile batch exceeds it,
        run the tiles as fixed-size waves inside ONE jitted ``lax.scan``
        instead of a single wide batched call.  Throughput is NEUTRAL on a
        v5e chip (436x1024/6 tiles: 203 ms wide vs 200 ms waves-of-2), but
        the scan bounds live activation memory to one wave, which is what
        lets very large tile grids (e.g. 1080p -> 15+ tiles of 182k tokens
        each) fit HBM.  0 (default) = single wide batched call."""
        self.model = model
        self.min_overlap = min_overlap
        self.batch_tiles = batch_tiles
        self.mesh = mesh
        self.wave_size = wave_size or 0
        if self.wave_size and not batch_tiles:
            raise ValueError(
                "wave_size requires batch_tiles=True: waves are scanned "
                "slices of the stacked tile batch; the per-tile loop path "
                "would silently drop the requested memory bound."
            )
        self._wave_fn = None
        self._dp_size = 1
        if mesh is not None:
            # Data-parallel tiles: the stacked tile batch shards over the
            # mesh's data axis (padded to a multiple of its size in __call__).
            from jax.sharding import NamedSharding, PartitionSpec as P

            from perceiverio_pytorch_tpu.parallel.mesh import DATA_AXIS
            from perceiverio_pytorch_tpu.parallel.sharding import batch_sharding

            self._dp_size = mesh.shape[DATA_AXIS]
            self.params = jax.device_put(params, NamedSharding(mesh, P()))
            batch_sh = batch_sharding(mesh)
            jitted = jax.jit(model.apply)
            self._tile_fn = lambda p, i1, i2: jitted(
                p,
                jax.device_put(i1, batch_sh),
                jax.device_put(i2, batch_sh),
            )
        else:
            self.params = params
            self._tile_fn = jax.jit(
                lambda p, i1, i2: model.apply(p, i1, i2)
            )
        if self.wave_size:
            if self._dp_size > 1:
                # Each wave's batch shards over the data axis, so the wave
                # must be divisible by it; round up rather than silently
                # dropping the memory bound.
                self.wave_size = (
                    -(-self.wave_size // self._dp_size) * self._dp_size
                )
                wave_sh = NamedSharding(mesh, P(None, DATA_AXIS))
                _put = lambda t: jax.device_put(t, wave_sh)
            else:
                _put = lambda t: t

            def scan_tiles(p, tiles1, tiles2):
                def body(carry, ab):
                    return carry, model.apply(p, ab[0], ab[1])

                _, flows = jax.lax.scan(body, 0, (tiles1, tiles2))
                return flows

            jitted_scan = jax.jit(scan_tiles)
            self._wave_fn = lambda p, t1, t2: jitted_scan(
                p, _put(t1), _put(t2)
            )
        h, w = model.img_size
        wy, wx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        wx = np.minimum(wx + 1, w - wx)
        wy = np.minimum(wy + 1, h - wy)
        weights = np.minimum(wx, wy)[None, None].astype(np.float32)
        self._weights = jnp.asarray(weights / weights.max())

    def __call__(self, image1, image2, test_mode: bool = True):
        """image1/image2: [B, 3, H, W] in [-1, 1]; returns [B, 2, H, W]."""
        h, w = self.model.img_size
        height, width = image1.shape[-2:]
        if height < h or width < w:
            raise ValueError(
                f"Image size {(height, width)} must be at least {(h, w)};"
                " pad or resize to the minimum dimension."
            )
        if not test_mode:
            assert (height, width) == (h, w), (
                "In training mode images must have size equal to specified"
                f" img_size {(h, w)}"
            )
            return self._tile_fn(self.params, image1, image2)

        grid = compute_grid_indices((height, width), (h, w), self.min_overlap)
        batch = image1.shape[0]

        if self.batch_tiles:
            tiles1 = jnp.concatenate(
                [image1[..., y : y + h, x : x + w] for y, x in grid], axis=0
            )
            tiles2 = jnp.concatenate(
                [image2[..., y : y + h, x : x + w] for y, x in grid], axis=0
            )
            if self._dp_size > 1 and tiles1.shape[0] % self._dp_size != 0:
                # Even DP sharding needs a divisible tile batch; pad with
                # cyclic repeats (pad_n can exceed the tile count on a wide
                # mesh with a small grid) and drop the extras afterwards.
                pad_n = -tiles1.shape[0] % self._dp_size
                idx = jnp.arange(pad_n) % tiles1.shape[0]
                tiles1 = jnp.concatenate([tiles1, tiles1[idx]], axis=0)
                tiles2 = jnp.concatenate([tiles2, tiles2[idx]], axis=0)
            n_stacked = tiles1.shape[0]
            if self._wave_fn is not None and n_stacked > self.wave_size:
                # Fixed-size waves under one lax.scan: per-wave batch stays
                # at the measured sweet spot, one dispatch for all tiles.
                pad_n = -n_stacked % self.wave_size
                if pad_n:
                    tiles1 = jnp.concatenate([tiles1, tiles1[:pad_n]], axis=0)
                    tiles2 = jnp.concatenate([tiles2, tiles2[:pad_n]], axis=0)
                waves = tiles1.shape[0] // self.wave_size
                shape = (waves, self.wave_size) + tiles1.shape[1:]
                flow_tiles = self._wave_fn(
                    self.params,
                    tiles1.reshape(shape),
                    tiles2.reshape(shape),
                )
                flow_tiles = flow_tiles.reshape(
                    (waves * self.wave_size,) + flow_tiles.shape[2:]
                )[:n_stacked]
            else:
                flow_tiles = self._tile_fn(self.params, tiles1, tiles2)
            pieces = [
                flow_tiles[i * batch : (i + 1) * batch]
                for i in range(len(grid))
            ]
        else:
            pieces = [
                self._tile_fn(
                    self.params,
                    image1[..., y : y + h, x : x + w],
                    image2[..., y : y + h, x : x + w],
                )
                for y, x in grid
            ]

        flows = jnp.zeros((batch, 2, height, width), jnp.float32)
        flow_count = jnp.zeros((1, 1, height, width), jnp.float32)
        for (y, x), flow_piece in zip(grid, pieces):
            flows = flows.at[..., y : y + h, x : x + w].add(
                flow_piece * self._weights
            )
            flow_count = flow_count.at[..., y : y + h, x : x + w].add(
                self._weights
            )
        return flows / flow_count
