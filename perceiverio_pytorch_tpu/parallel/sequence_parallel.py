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


def _ring_flash_merge(q, k_shard, v_shard, kv_mask_shard, axis_name, *,
                      block_q, block_k, interpret, softmax_scale=None):
    """Per-device Pallas flash over the local KV shard + global lse merge.

    Each device runs the streaming-KV flash kernel on its own [Tk/n] keys
    (O(block) VMEM, the attention matrix never materialises) and emits a
    locally-normalised output plus the local log-sum-exp.  The global
    softmax is then reconstructed from one pmax + two psums:

        out = sum_i out_i * exp(lse_i - lse_global),
        lse_global = log sum_i exp(lse_i).

    Communication is O(Tq x Dv) per device over ICI, independent of Tk --
    identical cost to the XLA stat-merge path, but without the [Tq, Tk/n]
    local logits it materialises.
    """
    from perceiverio_pytorch_tpu.ops.pallas.flash_attention import (
        _flash_forward,
    )

    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k_shard, (0, 2, 1, 3))
    vt = jnp.transpose(v_shard, (0, 2, 1, 3))
    out, lse = _flash_forward(
        qt, kt, vt, kv_mask_shard,
        block_q=block_q, block_k=block_k, interpret=interpret, need_lse=True,
        softmax_scale=softmax_scale,
    )
    # out: [B, H, Tq, Dv] locally normalised; lse: [B, H, Tq], +inf where
    # every local key is masked (that shard contributes zero weight).
    lse = jnp.where(jnp.isinf(lse), -jnp.inf, lse)
    m = jax.lax.pmax(lse, axis_name)
    m_safe = jnp.where(m == -jnp.inf, 0.0, m)
    w = jnp.exp(lse - m_safe)  # -inf lse -> weight 0
    sum_w = jax.lax.psum(w, axis_name)
    numer = jax.lax.psum(out.astype(jnp.float32) * w[..., None], axis_name)
    sum_w_safe = jnp.where(sum_w == 0.0, 1.0, sum_w)
    out_g = numer / sum_w_safe[..., None]  # all-masked rows: exact zero
    lse_g = jnp.where(sum_w == 0.0, jnp.inf, m_safe + jnp.log(sum_w_safe))
    return out_g, lse_g


def _batch_axis(mesh, axis_name, batch):
    """Mesh axis to keep the batch sharded over inside the shard_map.

    Without this, in_specs of ``P(None, ...)`` replicate every activation
    across the data axis -- redundant compute under DP, and the [B, Tk]
    kv_mask's P(data, None) -> P(None, model) transition triggers an SPMD
    "involuntary full rematerialization".  Keeping the batch dim on the
    data axis makes the mask transition a free local slice and the whole
    attention data-parallel.  Only engaged when the batch divides the axis.
    """
    for ax in mesh.axis_names:
        if ax != axis_name and mesh.shape[ax] > 1 and batch % mesh.shape[ax] == 0:
            return ax
    return None


def _make_ring_flash(mesh, axis_name, block_q, block_k, interpret,
                     softmax_scale=None, batch_axis=None):
    """Ring-flash attention with a custom VJP OUTSIDE shard_map.

    Both passes are primal-only shard_maps (AD never differentiates through
    shard_map itself, so no reliance on its transpose rules for Pallas
    bodies):

      * forward: per-device flash over the local KV shard, global lse merge
        (_ring_flash_merge); saves the merged output + global lse.
      * backward: per-device Pallas dKV/dQ sweeps recomputing p from the
        GLOBAL lse -- the recomputed p is the globally-normalised
        probability restricted to the local key shard, so dk/dv are exact
        shard-locally and the partial dq just needs one psum.
    """
    from perceiverio_pytorch_tpu.ops.pallas.flash_attention import (
        _pallas_attention_bwd,
    )

    b = batch_axis  # None -> replicated batch dim
    repl = P(b)
    kv4 = P(b, axis_name, None, None)
    kv2 = P(b, axis_name)

    def _fwd_shardmap(q, k, v, kv_mask):
        def body(q, k_s, v_s, m_s=None):
            out, lse = _ring_flash_merge(
                q, k_s, v_s, m_s, axis_name,
                block_q=block_q, block_k=block_k, interpret=interpret,
                softmax_scale=softmax_scale,
            )
            return _flatten_heads(out, q.dtype), lse

        in_specs = (repl, kv4, kv4) + ((kv2,) if kv_mask is not None else ())
        args = (q, k, v) + ((kv_mask,) if kv_mask is not None else ())
        fn = jax.shard_map(
            body, mesh=mesh, in_specs=in_specs, out_specs=(repl, repl),
            check_vma=False,  # Pallas can't carry vma through Mosaic
        )
        return fn(*args)

    def _bwd_shardmap(q, k, v, kv_mask, out_flat, lse_g, g):
        def body(q, k_s, v_s, out_flat, lse_g, g, m_s=None):
            dq, dk, dv = _pallas_attention_bwd(
                q, k_s, v_s, m_s, None, out_flat, lse_g, g,
                block_q=block_q, block_k=block_k, interpret=interpret,
                softmax_scale=softmax_scale,
            )
            return jax.lax.psum(dq, axis_name), dk, dv

        in_specs = (repl, kv4, kv4, repl, repl, repl)
        args = (q, k, v, out_flat, lse_g, g)
        if kv_mask is not None:
            in_specs = in_specs + (kv2,)
            args = args + (kv_mask,)
        fn = jax.shard_map(
            body, mesh=mesh, in_specs=in_specs,
            out_specs=(repl, kv4, kv4), check_vma=False,
        )
        return fn(*args)

    @jax.custom_vjp
    def ring(q, k, v, kv_mask):
        out, _ = _fwd_shardmap(q, k, v, kv_mask)
        return out

    def fwd(q, k, v, kv_mask):
        out, lse = _fwd_shardmap(q, k, v, kv_mask)
        return out, (q, k, v, kv_mask, out, lse)

    def bwd(res, g):
        q, k, v, kv_mask, out, lse = res
        dq, dk, dv = _bwd_shardmap(q, k, v, kv_mask, out, lse, g)
        return dq, dk, dv, None

    ring.defvjp(fwd, bwd)
    return ring


def _flatten_heads(out_bhtd, dtype):
    """[B, H, Tq, Dv] -> [B, Tq, H*Dv]."""
    b, h, t, d = out_bhtd.shape
    return (
        jnp.transpose(out_bhtd, (0, 2, 1, 3)).reshape(b, t, h * d).astype(dtype)
    )


def _local_attend(q, k_shard, v_shard, kv_mask_shard, axis_name,
                  softmax_scale=None):
    """Per-device body under shard_map: local logits + global stat merge."""
    qk_dim = q.shape[-1]
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(qk_dim)

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
    impl: str = "auto",
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
    flash_min_shard: int = 8192,
    softmax_scale: Optional[float] = None,
    backend: Optional[str] = None,
):
    """Cross-attention with the KV/token axis sharded over ``axis_name``.

    Args:
      q: [B, Tq, H, Dqk] (replicated over the axis).
      k, v: [B, Tk, H, D*]; any Tk.  When Tk doesn't divide the axis size
        the token axis is padded internally with masked (kv_mask=False)
        keys -- padded logits are -inf so they contribute exactly zero to
        the softmax statistics.  Real model shapes are NOT guaranteed
        divisible (flow's 182,528 tokens, multimodal's ~53k concat --
        /root/reference/perceiver_io/flow_perceiver.py:34-42).
      kv_mask: optional [B, Tk] validity mask.

    Returns:
      [B, Tq, H*Dv], replicated.
    """
    if impl not in ("auto", "flash", "xla"):
        raise ValueError(
            f"impl must be 'auto', 'flash' or 'xla'; got {impl!r}"
        )
    n = mesh.shape[axis_name]
    out_dtype = out_dtype or q.dtype

    tk = k.shape[1]
    pad = (-tk) % n
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        if kv_mask is None:
            kv_mask = jnp.broadcast_to(
                jnp.arange(tk + pad) < tk, (k.shape[0], tk + pad)
            )
        else:
            kv_mask = jnp.pad(kv_mask, ((0, 0), (0, pad)))

    from perceiverio_pytorch_tpu.ops.attention import _resolve_backend

    local_kv = k.shape[1] // n
    batch_axis = _batch_axis(mesh, axis_name, q.shape[0])
    # Policy.backend must override the resolved default here exactly as it
    # does at the single-chip dispatch sites -- otherwise a forced-tpu
    # config silently falls back to the stat-merge path and materialises
    # the [Tq, Tk/n] local logits ring-flash exists to avoid.
    flash_runnable = interpret or _resolve_backend(backend) == "tpu"
    if impl == "flash" or (
        impl == "auto" and flash_runnable and local_kv >= flash_min_shard
    ):
        ring = _make_ring_flash(
            mesh, axis_name, block_q, block_k, interpret,
            softmax_scale=softmax_scale, batch_axis=batch_axis,
        )
        return ring(q, k, v, kv_mask).astype(out_dtype)

    kv_spec = P(batch_axis, axis_name)
    replicated = P(batch_axis)

    in_specs = (
        replicated,
        P(batch_axis, axis_name, None, None),
        P(batch_axis, axis_name, None, None),
    )
    args = (q, k, v)
    if kv_mask is not None:
        in_specs = in_specs + (kv_spec,)
        args = args + (kv_mask,)

        def body(q, k_s, v_s, m_s):
            return _local_attend(
                q, k_s, v_s, m_s, axis_name, softmax_scale=softmax_scale
            )

    else:

        def body(q, k_s, v_s):
            return _local_attend(
                q, k_s, v_s, None, axis_name, softmax_scale=softmax_scale
            )

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=replicated,
    )
    return fn(*args).astype(out_dtype)
