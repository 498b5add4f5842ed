"""Decoder output queries (reference: /root/reference/perceiver_io/output_queries.py).

``BasicQuery`` builds the decoder-side query array from a position encoding,
optionally concatenating the preprocessed input.  ``subsampled_points`` is the
decoder-side chunking mechanism (output_queries.py:55-64): flat indices are
unravelled to N-D coordinates, mapped to [-1, 1] and fed to the (Fourier)
encoding as explicit positions.  Here that path is fully jit-traceable --
indices may be traced arrays, so chunked decoding runs as a single compiled
``lax.map`` over chunks instead of the reference's host loop that re-encodes
the input for every chunk (multimodal_perceiver.py:146-157).

``TrainableQuery`` / ``FourierQuery`` / ``FlowQuery`` mirror the reference's
classes as thin factories configuring ``BasicQuery``.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from perceiverio_pytorch_tpu.core import position_encoding
from perceiverio_pytorch_tpu.core.position_encoding import PosEncodingType


def _as_tuple(dims) -> tuple:
    if dims is None:
        return ()
    if isinstance(dims, (int, np.integer)):
        return (int(dims),)
    return tuple(int(d) for d in dims)


class BasicQuery(nn.Module):
    """Query built from a positional encoding (output_queries.py:11-81)."""

    output_index_dims: Union[int, Sequence[int], None] = None
    concat_preprocessed_input: bool = False
    preprocessed_input_channels: Optional[int] = None
    position_encoding_type: PosEncodingType = PosEncodingType.TRAINABLE
    project_pos_dim: int = -1
    trainable_position_encoding_kwargs: Optional[Mapping[str, Any]] = None
    fourier_position_encoding_kwargs: Optional[Mapping[str, Any]] = None

    def setup(self):
        if self.position_encoding_type not in (PosEncodingType.NONE, None):
            self.position_enc = position_encoding.build_position_encoding(
                self.position_encoding_type,
                index_dims=_as_tuple(self.output_index_dims),
                project_pos_dim=self.project_pos_dim,
                trainable_position_encoding_kwargs=self.trainable_position_encoding_kwargs,
                fourier_position_encoding_kwargs=self.fourier_position_encoding_kwargs,
            )
        else:
            self.position_enc = None
            assert self.concat_preprocessed_input, (
                "concat_preprocessed_input must be True if position_encoding_type"
                " is None"
            )

    def n_query_channels(self) -> int:
        if self.position_encoding_type in (PosEncodingType.NONE, None):
            channels = 0
        elif self.project_pos_dim > 0:
            channels = self.project_pos_dim
        elif self.position_encoding_type == PosEncodingType.TRAINABLE:
            # default mirrors TrainablePositionEncoding.num_channels (128,
            # as in the reference) so omitting the kwarg stays legal
            channels = (self.trainable_position_encoding_kwargs or {}).get(
                "num_channels", 128
            )
        else:
            kw = dict(self.fourier_position_encoding_kwargs)
            dims = _as_tuple(self.output_index_dims)
            resolution = kw.get("max_resolution") or dims
            num = kw["num_bands"] * (1 if kw.get("sine_only", False) else 2)
            num *= len(resolution)
            if kw.get("concat_pos", True):
                num += len(resolution)
            channels = num
        if self.concat_preprocessed_input:
            assert self.preprocessed_input_channels is not None, (
                "preprocessed_input_channels must be set if"
                " concat_preprocessed_input is True"
            )
            channels += self.preprocessed_input_channels
        return channels

    def __call__(self, inputs, inputs_without_pos=None, subsampled_points=None):
        batch_size = inputs.shape[0]

        if self.position_enc is not None:
            if (
                subsampled_points is not None
                and self.position_encoding_type == PosEncodingType.TRAINABLE
            ):
                # Deliberate divergence: the reference maps the indices to
                # [-1, 1] coords that TrainablePositionEncoding then silently
                # IGNORES (position_encoding.py:104-124 drops `pos`), so
                # subsampling a trainable query is a latent no-op there (never
                # hit by a shipped config).  Here the indices select rows of
                # the (optionally projected) table -- the semantics the
                # Fourier path has, and what chunked/partial decoding needs.
                table = self.position_enc(batch_size)
                table = table.reshape(batch_size, -1, table.shape[-1])
                flat = jnp.asarray(subsampled_points) % table.shape[1]
                pos_emb = table[:, flat, :]
            elif subsampled_points is not None:
                dims = _as_tuple(self.output_index_dims)
                indices = jnp.asarray(subsampled_points) % int(np.prod(dims))
                coords = jnp.stack(jnp.unravel_index(indices, dims), axis=-1)
                # Map coordinates c in [0, dim-1] to -1 + 2*c/dim, matching the
                # reference (output_queries.py:58) -- note the divisor is dim,
                # not dim-1, so this does NOT coincide with linspace(-1, 1).
                pos = -1.0 + 2.0 * coords.astype(jnp.float32) / jnp.asarray(
                    dims, jnp.float32
                )
                pos = jnp.broadcast_to(pos[None], (batch_size,) + pos.shape)
                pos_emb = self.position_enc(batch_size, pos=pos)
                pos_emb = pos_emb.reshape(batch_size, -1, pos_emb.shape[-1])
            else:
                pos_emb = self.position_enc(batch_size)
        else:
            pos_emb = None

        if self.concat_preprocessed_input:
            if inputs_without_pos is None:
                raise ValueError(
                    "Value is required for inputs_without_pos if"
                    " concat_preprocessed_input is True"
                )
            if pos_emb is None:
                # NONE encoding: the query is the preprocessed input itself
                # (output_queries.py:76-77 uses `inputs`, incl. pos features).
                pos_emb = inputs
            else:
                pos_emb = jnp.concatenate([inputs_without_pos, pos_emb], axis=-1)

        return pos_emb


def TrainableQuery(
    output_index_dims=None,
    concat_preprocessed_input: bool = False,
    preprocessed_input_channels: Optional[int] = None,
    num_channels: int = 128,
    init_scale: float = 0.02,
    name: Optional[str] = None,
) -> BasicQuery:
    """Query with trainable positional encoding (output_queries.py:84-102)."""
    return BasicQuery(
        output_index_dims=output_index_dims,
        concat_preprocessed_input=concat_preprocessed_input,
        preprocessed_input_channels=preprocessed_input_channels,
        position_encoding_type=PosEncodingType.TRAINABLE,
        trainable_position_encoding_kwargs=dict(
            num_channels=num_channels, init_scale=init_scale
        ),
        name=name,
    )


def FourierQuery(
    output_index_dims=None,
    concat_preprocessed_input: bool = False,
    preprocessed_input_channels: Optional[int] = None,
    num_bands: int = 64,
    concat_pos: bool = True,
    max_resolution: Optional[Sequence[int]] = None,
    sine_only: bool = False,
    name: Optional[str] = None,
) -> BasicQuery:
    """Query with Fourier positional encoding (output_queries.py:105-126)."""
    return BasicQuery(
        output_index_dims=output_index_dims,
        concat_preprocessed_input=concat_preprocessed_input,
        preprocessed_input_channels=preprocessed_input_channels,
        position_encoding_type=PosEncodingType.FOURIER,
        fourier_position_encoding_kwargs=dict(
            num_bands=num_bands,
            max_resolution=max_resolution,
            sine_only=sine_only,
            concat_pos=concat_pos,
        ),
        name=name,
    )


def FlowQuery(
    preprocessed_input_channels: int,
    output_img_size: Sequence[int],
    output_num_channels: int = 2,
    name: Optional[str] = None,
) -> BasicQuery:
    """Pos-encoding-free query: the preprocessed input itself
    (output_queries.py:129-139)."""
    return BasicQuery(
        output_index_dims=tuple(output_img_size) + (output_num_channels,),
        concat_preprocessed_input=True,
        preprocessed_input_channels=preprocessed_input_channels,
        position_encoding_type=PosEncodingType.NONE,
        name=name,
    )
