"""Weight initializers mirroring the reference's timm-based init scheme.

The reference uses ``timm.models.layers.variance_scaling_`` /
``trunc_normal_`` / ``lecun_normal_`` (e.g.
/root/reference/perceiver_io/transformer_primitives.py:77-88,
position_encoding.py:113,198).  We use the JAX-native equivalents:

  * ``variance_scaling(scale, "fan_in", "truncated_normal")`` -- same
    std = sqrt(scale / fan_in) with the 0.8796... truncation correction.
  * ``truncated_normal`` -- truncates at +-2 sigma (timm truncates at the
    absolute interval [-2, 2], which for the stds used here, 0.01-0.02, is
    no truncation at all; the distributions are practically identical and
    init only matters for fresh training, never for checkpoint parity).

All initializers return fp32 unless a dtype is requested at param creation.
"""

from __future__ import annotations

import jax.nn.initializers as jinit


def variance_scaling(scale: float = 1.0):
    """timm ``variance_scaling_(scale, mode="fan_in", truncated_normal)``."""
    return jinit.variance_scaling(scale, "fan_in", "truncated_normal")


def trunc_normal(std: float = 0.02):
    """timm ``trunc_normal_(std=std)``: zero-mean truncated normal."""
    return jinit.truncated_normal(stddev=std)


def lecun_normal():
    """timm ``lecun_normal_``: variance scaling 1.0, fan_in, truncated normal."""
    return jinit.lecun_normal()


zeros = jinit.zeros
