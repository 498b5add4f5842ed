"""Reference-faithful multi-head attention math as a pure XLA function.

Numerical contract (matching
/root/reference/perceiver_io/transformer_primitives.py:117-180):
  * scale ``1/sqrt(qk_head_dim)`` is applied AFTER the QK^T matmul (:146-147),
    which changes fp32 rounding vs. pre-scaling;
  * masked positions are filled with -1e4 for fp16 and -1e30 otherwise
    (:149-156);
  * softmax runs in fp32 and the result is cast back to the value dtype;
  * rows whose mask is all-zero are wiped to exactly 0 after the value matmul
    (``wipe_attn``, :168-175).

Masks are carried in factored 1-D form wherever possible: the reference only
ever builds rank-3 masks as outer products ``q_mask[b,i] & kv_mask[b,j]``
(transformer_primitives.py:10-15), so the factored form loses nothing and
keeps the flash kernel path (ops/pallas) O(N) in memory.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def make_cross_attention_mask(query_mask: jnp.ndarray, kv_mask: jnp.ndarray) -> jnp.ndarray:
    """[B,Q] x [B,K] -> [B,Q,K] outer-product boolean mask."""
    return query_mask[:, :, None].astype(bool) & kv_mask[:, None, :].astype(bool)


def _mask_fill_value(dtype) -> float:
    # np.NINF breaks for causal-masked left-padded sampling in the reference;
    # keep its large-k convention (transformer_primitives.py:152).
    return 1e4 if dtype == jnp.float16 else 1e30


def attend_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    attention_mask: Optional[jnp.ndarray] = None,
    attention_bias: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    softmax_dtype=jnp.float32,
    precision=None,
    return_matrix: bool = False,
    softmax_scale: Optional[float] = None,
):
    """Multi-head attention.

    Args:
      q: [B, Tq, H, Dqk].
      k: [B, Tk, H, Dqk].
      v: [B, Tk, H, Dv].
      attention_mask: optional [B, Tq, Tk] boolean validity mask.
      attention_bias: optional bias broadcastable to [B, H, Tq, Tk], added to
        the raw (pre-scale) logits like the reference (:143-144).
      dropout_rate / dropout_rng: post-softmax dropout.
      softmax_dtype: accumulation dtype for the softmax.
      precision: jax matmul precision for the two contractions.

    Returns:
      [B, Tq, H*Dv] (and the [B, H, Tq, Tk] matrix if return_matrix).
    """
    batch, q_len, num_heads, qk_head_dim = q.shape
    v_head_dim = v.shape[-1]

    attention = jnp.einsum("bthd,bshd->bhts", q, k, precision=precision)

    if attention_bias is not None:
        attention = attention + attention_bias

    # softmax_scale overrides the shape-derived scale for callers whose head
    # dim is lane-padded (zero columns) and logically smaller.
    attention = attention * (
        softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(qk_head_dim)
    )

    if attention_mask is not None:
        large_k = jnp.asarray(_mask_fill_value(attention.dtype), attention.dtype)
        attention = jnp.where(attention_mask[:, None, :, :], attention, -large_k)

    normalized = jax.nn.softmax(attention.astype(softmax_dtype), axis=-1)
    normalized = normalized.astype(v.dtype)

    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rng required when dropout_rate > 0")
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, normalized.shape)
        normalized = jnp.where(keep, normalized / (1.0 - dropout_rate), 0.0)

    summed = jnp.einsum("bhts,bshd->bthd", normalized, v, precision=precision)
    summed = summed.reshape(batch, q_len, num_heads * v_head_dim)

    if attention_mask is not None:
        # Fully masked query rows produce a uniform softmax; force exact zeros
        # (wipe_attn, transformer_primitives.py:168-175).
        wipe_attn = jnp.all(attention_mask == 0, axis=2, keepdims=True)  # [B, Tq, 1]
        summed = jnp.where(wipe_attn, jnp.zeros_like(summed), summed)

    if return_matrix:
        return normalized, summed
    return summed
