"""Multimodal (video + audio + label) autoencoding Perceiver.

Reference: /root/reference/perceiver_io/multimodal_perceiver.py -- Kinetics
autoencoder with audio/image/label preprocessors, per-modality queries,
input channel padding (+4), query padding (+2), and label-token masking
(prob 1.0).  The reference decodes 805k output queries in 128 chunks by
re-running the FULL forward (re-encoding the ~53k-token input) once per chunk
(multimodal_perceiver.py:146-157).

TPU-native redesign: encode ONCE, then ``nn.scan`` the decoder over chunk
indices -- a single compiled decode body executed 128x on device, with the
latents held in HBM.  Outputs are bit-identical to re-encoding (the encoder
is deterministic in eval) at ~1/64th the encoder cost.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from perceiverio_pytorch_tpu.config import DEFAULT, Policy, resolve_remat_policy
from perceiverio_pytorch_tpu.core.perceiver import PerceiverIO
from perceiverio_pytorch_tpu.core.position_encoding import PosEncodingType
from perceiverio_pytorch_tpu.core.queries import FourierQuery, TrainableQuery
from perceiverio_pytorch_tpu.io_processors.postprocessors import (
    AudioPostprocessor,
    ClassificationPostprocessor,
    ProjectionPostprocessor,
)
from perceiverio_pytorch_tpu.io_processors.preprocessors import (
    AudioPreprocessor,
    ImagePreprocessor,
    OneHotPreprocessor,
)


class MultiModalPerceiver(nn.Module):
    """Perceiver auto-encoding video+audio+label (multimodal_perceiver.py:14-167)."""

    img_size: Sequence[int] = (224, 224)
    img_channels: int = 3
    num_frames: int = 16
    num_classes: int = 700
    audio_samples_per_frame: int = 48000 // 25
    audio_samples_per_patch: int = 16
    num_self_attends_per_block: int = 8
    num_blocks: int = 1
    num_latents: int = 28 * 28 * 1
    num_latent_channels: int = 512
    policy: Policy = DEFAULT
    remat: bool = False

    def setup(self):
        h, w = self.img_size
        n_audio_samples = self.num_frames * self.audio_samples_per_frame
        self._n_audio_samples = n_audio_samples

        input_preprocessors = {
            "audio": AudioPreprocessor(
                samples_per_batch=n_audio_samples,
                position_encoding_type=PosEncodingType.FOURIER,
                fourier_position_encoding_kwargs=dict(
                    num_bands=192,
                    max_resolution=(n_audio_samples,),
                    sine_only=False,
                    concat_pos=True,
                ),
                n_extra_pos_mlp=0,
                prep_type="patches",
                samples_per_patch=self.audio_samples_per_patch,
            ),
            "image": ImagePreprocessor(
                img_size=(h, w),
                input_channels=self.img_channels,
                num_frames=self.num_frames,
                position_encoding_type=PosEncodingType.FOURIER,
                fourier_position_encoding_kwargs=dict(
                    num_bands=32,
                    max_resolution=(self.num_frames, h // 4, w // 4),
                    sine_only=False,
                    concat_pos=True,
                ),
                n_extra_pos_mlp=0,
                prep_type="patches",
                spatial_downsample=4,
                temporal_downsample=1,
            ),
            "label": OneHotPreprocessor(input_channels=self.num_classes),
        }

        output_postprocessors = {
            "audio": AudioPostprocessor(
                in_channels=512, samples_per_patch=self.audio_samples_per_patch
            ),
            "image": ProjectionPostprocessor(num_inputs=512, num_outputs=3),
            "label": ClassificationPostprocessor(
                num_input_channels=512, num_classes=self.num_classes
            ),
        }

        output_queries = {
            "image": FourierQuery(
                concat_preprocessed_input=False,
                output_index_dims=(self.num_frames, h, w),
                num_bands=32,
                max_resolution=(self.num_frames, h // 4, w // 4),
                sine_only=False,
                concat_pos=True,
            ),
            "audio": FourierQuery(
                concat_preprocessed_input=False,
                output_index_dims=(n_audio_samples // self.audio_samples_per_patch,),
                num_bands=192,
                max_resolution=(n_audio_samples,),
                sine_only=False,
                concat_pos=True,
            ),
            "label": TrainableQuery(
                output_index_dims=(1,),
                concat_preprocessed_input=False,
                num_channels=1024,
                init_scale=0.02,
            ),
        }

        self.perceiver = PerceiverIO(
            num_self_attends_per_block=self.num_self_attends_per_block,
            num_blocks=self.num_blocks,
            num_latents=self.num_latents,
            num_latent_channels=self.num_latent_channels,
            input_preprocessors=input_preprocessors,
            output_postprocessors=output_postprocessors,
            output_queries=output_queries,
            input_padding_channels=4,
            output_query_padding_channels=2,
            input_mask_probs={"image": 0.0, "audio": 0.0, "label": 1.0},
            policy=self.policy,
            remat=self.remat,
        )

    def __call__(
        self,
        images,
        audio,
        n_chunks: int = 128,
        *,
        chunk_mesh=None,
        deterministic=True,
    ):
        """Auto-encode one clip.

        Args:
          images: [B, T, C, H, W] video in [0, 1].
          audio: [B, n_audio_samples, 1] waveform in [-1, 1].
          n_chunks: output queries are decoded in this many equal chunks.
          chunk_mesh: optional jax.sharding.Mesh; when given, the chunk axis
            -- embarrassingly parallel (each chunk cross-attends the same
            latents with disjoint queries) -- is decoded in waves of
            ``mesh.shape['data']`` concurrent chunks, sharded over the data
            axis.  This is how the 805k-query decode
            (/root/reference/perceiver_io/multimodal_perceiver.py:137-167)
            scales across chips; single-device results are unchanged.

        Returns:
          dict with "image" [B, T, C, H, W], "audio" [B, n_samples, 1],
          "label" [B, num_classes].
        """
        batch_size, t, c, h, w = images.shape
        n_audio_patches = audio.shape[1] // self.audio_samples_per_patch
        if (t * h * w) % n_chunks or n_audio_patches % n_chunks:
            raise ValueError(
                f"n_chunks ({n_chunks}) must divide both the image query"
                f" count ({t * h * w} = t*h*w) and the audio patch count"
                f" ({n_audio_patches}) -- otherwise the decoded chunks"
                " cannot be stitched back to the input shapes"
            )
        image_chunk_size = t * h * w // n_chunks
        audio_chunk_size = n_audio_patches // n_chunks

        inputs = {
            "image": images,
            "audio": audio,
            "label": jnp.zeros((batch_size, self.num_classes), images.dtype),
        }

        # Encode once; the reference re-encodes per chunk
        # (multimodal_perceiver.py:146-157).
        latents, state = self.perceiver.encode(
            inputs, deterministic=deterministic
        )

        def decode_one(perceiver, chunk_idx):
            subsampling = {
                "image": chunk_idx * image_chunk_size
                + jnp.arange(image_chunk_size),
                "audio": chunk_idx * audio_chunk_size
                + jnp.arange(audio_chunk_size),
                "label": None,
            }
            return perceiver.decode(
                latents,
                state,
                subsampled_output_points=subsampling,
                deterministic=deterministic,
            )

        n_par = 1 if chunk_mesh is None else int(chunk_mesh.shape["data"])
        if n_par > 1 and n_chunks % n_par != 0:
            raise ValueError(
                f"n_chunks ({n_chunks}) must be a multiple of the mesh's "
                f"data axis ({n_par}) for chunk-parallel decoding"
            )

        # With remat, recompute each chunk's decode in the backward pass:
        # without it the scan stores every chunk's decoder activations
        # ([n_chunks, B, 50k, 1026] fp32 several times over -- 12+ GB at
        # full Kinetics scale), which cannot fit one chip's HBM.
        decode_body = (
            nn.remat(
                decode_one,
                prevent_cse=False,
                policy=resolve_remat_policy(self.policy),
            )
            if self.remat
            else decode_one
        )

        if self.policy.quant == "int8_static" and (
            self.is_initializing() or self.is_mutable_collection("quant_stats")
        ):
            # int8_static init/calibration: flax cannot CREATE the carried
            # "quant_stats" collection inside nn.scan, so these passes
            # decode the chunks in an unrolled loop over the same shared
            # module (amax variables are created and max-folded across
            # chunks); ordinary applies below scan with the stats as
            # read-only broadcast.  Calibration ignores chunk_mesh.
            outs_list = [
                decode_body(self.perceiver, jnp.asarray(i))
                for i in range(n_chunks)
            ]
            outs = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *outs_list
            )
        elif n_par == 1:

            def decode_chunk(perceiver, carry, chunk_idx):
                return carry, decode_body(perceiver, chunk_idx)

            scan_fn = nn.scan(
                decode_chunk,
                variable_broadcast=["params", "consts", "quant_stats"],
                split_rngs={"params": False},
                in_axes=0,
                out_axes=0,
            )
            _, outs = scan_fn(self.perceiver, 0, jnp.arange(n_chunks))
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            chunk_shard = NamedSharding(chunk_mesh, P("data"))

            def decode_wave(perceiver, carry, wave_idxs):
                wave_idxs = jax.lax.with_sharding_constraint(
                    wave_idxs, chunk_shard
                )
                vm = nn.vmap(
                    decode_body,
                    in_axes=0,
                    out_axes=0,
                    variable_axes={
                        "params": None,
                        "consts": None,
                        "quant_stats": None,
                    },
                    split_rngs={"params": False},
                )
                outs = vm(perceiver, wave_idxs)
                outs = jax.tree_util.tree_map(
                    lambda x: jax.lax.with_sharding_constraint(x, chunk_shard),
                    outs,
                )
                return carry, outs

            scan_fn = nn.scan(
                decode_wave,
                variable_broadcast=["params", "consts", "quant_stats"],
                split_rngs={"params": False},
                in_axes=0,
                out_axes=0,
            )
            waves = jnp.arange(n_chunks).reshape(n_chunks // n_par, n_par)
            _, outs = scan_fn(self.perceiver, 0, waves)
            # [n_waves, n_par, B, ...] -> [n_chunks, B, ...] (row-major
            # wave order matches the sequential chunk order exactly)
            outs = jax.tree_util.tree_map(
                lambda x: x.reshape(n_chunks, *x.shape[2:]), outs
            )

        # outs[k]: [n_chunks, B, ...] -> stitch chunk axis back together.
        image = jnp.moveaxis(outs["image"], 0, 1)  # [B, n_chunks, chunk, 3]
        image = image.reshape(batch_size, t, h, w, c)
        image = jnp.moveaxis(image, -1, -3)  # [B, T, C, H, W]

        audio_out = jnp.moveaxis(outs["audio"], 0, 1).reshape(audio.shape)
        label = jnp.mean(jnp.moveaxis(outs["label"], 0, 1), axis=1)

        return {"image": image, "audio": audio_out, "label": label}
