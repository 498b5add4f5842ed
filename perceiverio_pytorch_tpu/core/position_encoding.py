"""Position encodings: Fourier features, trainable embeddings, projector.

TPU-native re-implementation of the reference semantics in
/root/reference/perceiver_io/position_encoding.py:
  * ``generate_fourier_features`` (:19-67): linear-spaced bands from 1.0 to the
    Nyquist frequency (res/2) per dimension, sin+cos (or sine-only), optional
    concatenation of the raw positions.  Channel order (concat_pos, not
    sine_only):
        [dim_1..dim_d,
         sin(pi f_1 dim_1)..sin(pi f_K dim_1), .., sin(pi f_K dim_d),
         cos(pi f_1 dim_1)..               .., cos(pi f_K dim_d)]
  * ``build_linear_positions`` (:70-89): N-D meshgrid of linspace(-1, 1).
  * ``TrainablePositionEncoding`` (:104-124): learned [index_dim, C] table.
  * ``FourierPositionEncoding`` (:151-187): features computed for one batch
    row and broadcast -- positions are assumed batch-constant.
  * ``PositionEncodingProjector`` (:190-207) and the
    ``build_position_encoding`` factory (:210-239).

Everything here is statically shaped so that it traces once under ``jax.jit``
and the Fourier tables constant-fold into the compiled program when positions
are not data-dependent.
"""

from __future__ import annotations

import enum
from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from perceiverio_pytorch_tpu.utils.initializers import lecun_normal, trunc_normal


class PosEncodingType(enum.Enum):
    FOURIER = 1
    TRAINABLE = 2
    NONE = 3


def generate_fourier_features(
    pos: jnp.ndarray,
    num_bands: int,
    max_resolution: Sequence[int] = (224, 224),
    concat_pos: bool = True,
    sine_only: bool = False,
) -> jnp.ndarray:
    """Fourier position features with linear frequency spacing.

    Args:
      pos: [n, d] positions of n points in d-dim space (typically in [-1, 1]).
      num_bands: number of frequency bands K per dimension.
      max_resolution: per-dimension resolution; the top band sits at Nyquist
        (res / 2).
      concat_pos: prepend the raw positions to the features.
      sine_only: use a single phase (sin) instead of sin+cos.

    Returns:
      [n, C] features, C = (1 if sine_only else 2) * K * d (+ d if concat_pos).
    """
    pos = jnp.asarray(pos)
    # [d, K] linearly spaced bands from 1.0 to the per-dim Nyquist frequency.
    freq_bands = jnp.stack(
        [jnp.linspace(1.0, res / 2.0, num=num_bands, dtype=pos.dtype) for res in max_resolution],
        axis=0,
    )
    # [n, d, K] -> [n, d*K]; band-minor, dimension-major ordering.
    per_pos_features = pos[:, :, None] * freq_bands[None, :, :]
    per_pos_features = per_pos_features.reshape(pos.shape[0], -1)

    if sine_only:
        per_pos_features = jnp.sin(jnp.pi * per_pos_features)
    else:
        per_pos_features = jnp.concatenate(
            [jnp.sin(jnp.pi * per_pos_features), jnp.cos(jnp.pi * per_pos_features)],
            axis=-1,
        )
    if concat_pos:
        per_pos_features = jnp.concatenate([pos, per_pos_features], axis=-1)
    return per_pos_features


def build_linear_positions(
    index_dims: Sequence[int], output_range=(-1.0, 1.0)
) -> jnp.ndarray:
    """[*index_dims, N] grid of positions, each dim linspace over output_range."""
    dim_ranges = [
        jnp.linspace(output_range[0], output_range[1], num=n, dtype=jnp.float32)
        for n in index_dims
    ]
    grid = jnp.meshgrid(*dim_ranges, indexing="ij")
    return jnp.stack(grid, axis=-1)


def _check_or_build_spatial_positions(pos, index_dims, batch_size):
    """Build default linear positions when ``pos`` is None, else validate."""
    if pos is None:
        pos = build_linear_positions(index_dims)
        pos = jnp.broadcast_to(pos[None], (batch_size,) + pos.shape)
        pos = pos.reshape(batch_size, int(np.prod(index_dims)), -1)
    else:
        assert pos.shape[-1] == len(index_dims)
    return pos


class AbstractPositionEncoding(nn.Module):
    """Position-encoding interface (position_encoding.py:92-101): callable as
    ``enc(batch_size, pos=None) -> [batch, n, C]`` with a static
    ``n_output_channels()``.  Linen modules duck-type this; the class exists
    for isinstance checks and documentation."""

    def __call__(self, batch_size: int, pos=None):  # pragma: no cover
        raise NotImplementedError

    def n_output_channels(self) -> int:  # pragma: no cover
        raise NotImplementedError


class TrainablePositionEncoding(nn.Module):
    """Learned [index_dim, num_channels] position table, broadcast to batch."""

    index_dim: int
    num_channels: int = 128
    init_scale: float = 0.02

    @nn.compact
    def __call__(self, batch_size: int, pos=None) -> jnp.ndarray:
        del pos  # unused; part of the shared position-encoding interface
        pos_embs = self.param(
            "pos_embs",
            trunc_normal(self.init_scale),
            (self.index_dim, self.num_channels),
        )
        return jnp.broadcast_to(pos_embs[None], (batch_size,) + pos_embs.shape)

    def n_output_channels(self) -> int:
        return self.num_channels


class FourierPositionEncoding(nn.Module):
    """Stateless Fourier encoding over ``index_dims``.

    Features are computed for the first batch row only and broadcast, matching
    the reference (position_encoding.py:176-184): positions are assumed
    batch-constant, which lets XLA constant-fold the table when ``pos`` is not
    data-dependent.
    """

    index_dims: Sequence[int]
    num_bands: int
    concat_pos: bool = True
    max_resolution: Optional[Sequence[int]] = None
    sine_only: bool = False

    def _resolution(self):
        return tuple(self.max_resolution or self.index_dims)

    def _build_table(self) -> jnp.ndarray:
        """Implicit-linear-position Fourier table, [prod(index_dims), C]."""
        pos = _check_or_build_spatial_positions(
            None, tuple(self.index_dims), 1
        )
        return generate_fourier_features(
            pos[0],
            num_bands=self.num_bands,
            max_resolution=self._resolution(),
            concat_pos=self.concat_pos,
            sine_only=self.sine_only,
        )

    @nn.compact
    def __call__(self, batch_size: int, pos=None) -> jnp.ndarray:
        if pos is None:
            # Implicit linear positions: the table is a pure function of the
            # static shape config, so precompute it ONCE at init into a
            # "consts" buffer and read it back at apply time.  In-graph
            # recomputation costs ~1.5 ms/call of HBM-bound sin/broadcast on
            # flow's 368x496 grid (xprof, v5e); embedding it as an XLA
            # literal instead is far worse -- a 188 MB constant adds minutes
            # of (remote) compile time.  A buffer argument costs neither.
            if self.is_initializing():
                features = self.variable(
                    "consts", "fourier_table", self._build_table
                ).value
            elif self.has_variable("consts", "fourier_table"):
                features = self.get_variable("consts", "fourier_table")
            else:
                # Stateless use (apply({}, ...) without an init'd table):
                # fall back to the in-graph computation.
                features = self._build_table()
        else:
            pos = _check_or_build_spatial_positions(
                pos, tuple(self.index_dims), batch_size
            )
            features = generate_fourier_features(
                pos[0],
                num_bands=self.num_bands,
                max_resolution=self._resolution(),
                concat_pos=self.concat_pos,
                sine_only=self.sine_only,
            )
        return jnp.broadcast_to(features[None], (batch_size,) + features.shape)

    def n_output_channels(self) -> int:
        num = self.num_bands if self.sine_only else self.num_bands * 2
        num *= len(self._resolution())
        if self.concat_pos:
            num += len(self._resolution())
        return num


class PositionEncodingProjector(nn.Module):
    """Linear projection of a base position encoding to a target width."""

    output_size: int
    base_position_encoding: nn.Module

    @nn.compact
    def __call__(self, batch_size: int, pos=None) -> jnp.ndarray:
        base_pos = self.base_position_encoding(batch_size, pos)
        projected = nn.Dense(
            self.output_size,
            kernel_init=lecun_normal(),
            bias_init=nn.initializers.zeros,
            name="projector",
        )(base_pos)
        return projected

    def n_output_channels(self) -> int:
        return self.output_size


def build_position_encoding(
    position_encoding_type: PosEncodingType,
    index_dims: Sequence[int],
    project_pos_dim: int = -1,
    trainable_position_encoding_kwargs=None,
    fourier_position_encoding_kwargs=None,
    name: Optional[str] = None,
):
    """Factory mirroring the reference knob surface (position_encoding.py:210)."""
    if position_encoding_type == PosEncodingType.TRAINABLE:
        assert trainable_position_encoding_kwargs is not None
        output_pos_enc = TrainablePositionEncoding(
            index_dim=int(np.prod(index_dims)),
            name=name,
            **trainable_position_encoding_kwargs,
        )
    elif position_encoding_type == PosEncodingType.FOURIER:
        assert fourier_position_encoding_kwargs is not None
        output_pos_enc = FourierPositionEncoding(
            index_dims=tuple(index_dims),
            name=name,
            **fourier_position_encoding_kwargs,
        )
    else:
        raise ValueError(f"Unknown position encoding: {position_encoding_type}.")

    if project_pos_dim > 0:
        output_pos_enc = PositionEncodingProjector(
            output_size=project_pos_dim,
            base_position_encoding=output_pos_enc,
        )
    return output_pos_enc
