"""Loss functions for the four task families.

The reference is inference-only (SURVEY.md 4: no training loop anywhere);
these are the standard objectives for its tasks, provided so the framework is
trainable end-to-end on TPU.
"""

from __future__ import annotations

from typing import Mapping, Optional

import jax
import jax.numpy as jnp
import optax


def masked_token_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    loss_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Byte-MLM objective: mean CE over (optionally masked) positions.

    Args:
      logits: [B, T, V]; targets: [B, T] int; loss_mask: [B, T] (1 = count).
    """
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
    if loss_mask is None:
        return jnp.mean(ce)
    loss_mask = loss_mask.astype(ce.dtype)
    return jnp.sum(ce * loss_mask) / jnp.maximum(jnp.sum(loss_mask), 1.0)


def classification_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, label_smoothing: float = 0.0
) -> jnp.ndarray:
    """ImageNet objective: softmax CE with optional label smoothing."""
    num_classes = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, num_classes)
    if label_smoothing > 0.0:
        one_hot = (
            one_hot * (1.0 - label_smoothing) + label_smoothing / num_classes
        )
    return jnp.mean(optax.softmax_cross_entropy(logits, one_hot))


def flow_endpoint_error(
    pred_flow: jnp.ndarray, gt_flow: jnp.ndarray, valid: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Mean endpoint error over [B, 2, H, W] flow fields."""
    epe = jnp.sqrt(jnp.sum((pred_flow - gt_flow) ** 2, axis=1) + 1e-12)
    if valid is None:
        return jnp.mean(epe)
    valid = valid.astype(epe.dtype)
    return jnp.sum(epe * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def multimodal_autoencode_loss(
    outputs: Mapping[str, jnp.ndarray],
    targets: Mapping[str, jnp.ndarray],
    weights: Optional[Mapping[str, float]] = None,
) -> jnp.ndarray:
    """Weighted sum of per-modality reconstruction/CE losses.

    ``weights``: per-modality multipliers; unspecified modalities default
    to 1.0 (a partial dict like ``{"label": 2.0}`` is fine).  Negative
    label targets mean "unlabeled" (VideoClipDataset yields -1 when a clip
    has no resolvable class): those examples contribute zero to the label
    term and are excluded from its mean.
    """
    weights = dict(weights or {})
    total = 0.0
    if "image" in outputs:
        total += weights.get("image", 1.0) * jnp.mean(
            (outputs["image"] - targets["image"]) ** 2
        )
    if "audio" in outputs:
        total += weights.get("audio", 1.0) * jnp.mean(
            (outputs["audio"] - targets["audio"]) ** 2
        )
    if "label" in outputs:
        labels = targets["label"]
        valid = labels >= 0
        ce = optax.softmax_cross_entropy_with_integer_labels(
            outputs["label"], jnp.maximum(labels, 0)
        )
        total += weights.get("label", 1.0) * (
            jnp.sum(jnp.where(valid, ce, 0.0))
            / jnp.maximum(jnp.sum(valid), 1)
        )
    return total
