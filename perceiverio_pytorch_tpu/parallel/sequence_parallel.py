"""Explicit sequence-parallel (KV-sharded) cross-attention.

The Perceiver's only long axis is its input: the encoder cross-attends a
small latent array against up to 802k tokens (SURVEY.md 2.3).  When one
chip's HBM can't hold the inputs, shard the KV/token axis across the mesh
and run attention with an all-reduce of the softmax statistics -- each
device holds [Tk/n] keys/values, computes its local [Tq, Tk/n] logits, and
the global softmax is reconstructed from ``pmax`` of the row maxima and
``psum`` of the numerator/denominator.  Communication is O(Tq x Dv) per
device over ICI, independent of the input length.

This is the multi-chip analogue of the single-chip Pallas flash kernel
(ops/pallas/flash_attention streams the same axis through VMEM).

Semantics match ops.attention_xla.attend_xla (post-matmul scale, -inf
exclusion of invalid keys, zero output for wiped rows).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from perceiverio_pytorch_tpu.parallel.mesh import MODEL_AXIS


def _local_attend(q, k_shard, v_shard, kv_mask_shard, axis_name):
    """Per-device body under shard_map: local logits + global stat merge."""
    qk_dim = q.shape[-1]
    scale = 1.0 / math.sqrt(qk_dim)

    s = jnp.einsum("bthd,bshd->bhts", q, k_shard).astype(jnp.float32) * scale
    if kv_mask_shard is not None:
        s = jnp.where(kv_mask_shard[:, None, None, :], s, -jnp.inf)

    # The softmax max-shift cancels exactly in numer/denom, so it carries no
    # gradient; stop_gradient on both sides keeps AD away from pmax (which
    # has no differentiation rule) without changing any derivative.
    m_local = jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
    m_global = jax.lax.stop_gradient(jax.lax.pmax(m_local, axis_name))
    m_safe = jnp.where(m_global == -jnp.inf, 0.0, m_global)

    p = jnp.exp(s - m_safe)  # -inf logits contribute exactly 0
    numer_local = jnp.einsum(
        "bhts,bshd->bthd", p.astype(v_shard.dtype), v_shard
    ).astype(jnp.float32)
    denom_local = jnp.sum(p, axis=-1)  # [B, H, Tq]

    numer = jax.lax.psum(numer_local, axis_name)
    denom = jax.lax.psum(denom_local, axis_name)  # [B, H, Tq]
    denom = jnp.transpose(denom, (0, 2, 1))[:, :, :, None]  # [B, Tq, H, 1]
    # all keys masked -> wiped row (exact zero), matching wipe_attn
    out = numer / jnp.where(denom == 0.0, 1.0, denom)

    batch, q_len, num_heads, v_dim = out.shape
    return out.reshape(batch, q_len, num_heads * v_dim)


def sequence_parallel_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    kv_mask: Optional[jnp.ndarray] = None,
    axis_name: str = MODEL_AXIS,
    out_dtype=None,
):
    """Cross-attention with the KV/token axis sharded over ``axis_name``.

    Args:
      q: [B, Tq, H, Dqk] (replicated over the axis).
      k, v: [B, Tk, H, D*] with Tk divisible by the axis size.
      kv_mask: optional [B, Tk] validity mask.

    Returns:
      [B, Tq, H*Dv], replicated.
    """
    n = mesh.shape[axis_name]
    if k.shape[1] % n != 0:
        raise ValueError(
            f"KV length {k.shape[1]} must divide the '{axis_name}' axis ({n});"
            " pad the token axis (with kv_mask=False padding) first."
        )
    out_dtype = out_dtype or q.dtype

    kv_spec = P(None, axis_name)
    replicated = P()

    in_specs = (
        replicated,
        P(None, axis_name, None, None),
        P(None, axis_name, None, None),
    )
    args = (q, k, v)
    if kv_mask is not None:
        in_specs = in_specs + (kv_spec,)
        args = args + (kv_mask,)

        def body(q, k_s, v_s, m_s):
            return _local_attend(q, k_s, v_s, m_s, axis_name)

    else:

        def body(q, k_s, v_s):
            return _local_attend(q, k_s, v_s, None, axis_name)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=replicated,
    )
    return fn(*args).astype(out_dtype)
