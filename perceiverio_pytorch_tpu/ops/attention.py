"""Attention dispatch: reference-faithful XLA path or Pallas flash kernels.

The three attention sites in a Perceiver (encoder cross-attend with long KV,
latent self-attend, decoder cross-attend with long Q) all route through
``multihead_attention``.  Implementation choice:

  * ``xla``   -- ops.attention_xla.attend_xla; materialises the [B,H,Tq,Tk]
                 matrix.  Exact reference numerics; right choice for latent
                 self-attention (Tq=Tk <= 2048) where the matrix is small.
  * ``flash`` -- ops.pallas.flash_attention; streams KV blocks with an online
                 softmax (blocked over Q as well), never materialising the
                 attention matrix.  This is the single-chip analogue of ring
                 attention and the only way the 182k-token optical-flow
                 cross-attends fit on one chip at speed.
  * ``auto``  -- flash when eligible and the KV axis is long; else xla.

Masks are factored ([B,Tq] query-validity x [B,Tk] kv-validity) end-to-end;
the reference only ever builds rank-3 masks as such outer products
(/root/reference/perceiver_io/perceiver.py:100-102,171-175), so the factored
form is lossless and keeps flash O(N) in memory.  A pre-built rank-3
``attention_mask`` is also accepted and forces the XLA path.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from perceiverio_pytorch_tpu.ops.attention_xla import (
    attend_xla,
    make_cross_attention_mask,
)


def _resolve_backend(backend=None) -> str:
    """The platform the computation will actually run on.

    ``jax.default_backend()`` alone is wrong inside a
    ``jax.default_device(cpu_device)`` scope on a TPU-default process: the
    trace compiles for CPU but the process backend still says "tpu".  The
    ``jax_default_device`` config (which that context manager sets) is the
    authoritative signal, so consult it first; an explicit ``backend``
    string (Policy.backend) overrides everything.
    """
    if backend is not None:
        return backend
    import jax

    default_device = jax.config.jax_default_device
    if default_device is not None:
        # jax.default_device() accepts either a Device or a platform string
        # ("cpu"); the config then holds whichever was passed.
        return getattr(default_device, "platform", default_device)
    return jax.default_backend()


def attention_path(
    impl: str,
    *,
    q_len: int,
    kv_len: int,
    flash_min_kv: int = 8192,
    flash_min_self: int = 2048,
    flash_long_q_min_kv: int = 1024,
    attention_mask=None,
    attention_bias=None,
    dropout_rate: float = 0.0,
    return_matrix: bool = False,
    interpret: bool = False,
    sp_mesh=None,
    sp_min_kv: int = 32768,
    backend=None,
) -> str:
    """Which implementation ``multihead_attention`` will dispatch to.

    Returns ``"sp"`` (mesh sequence-parallel), ``"flash"`` (single-chip Pallas
    kernel) or ``"xla"``.  All inputs are trace-time static, so modules can
    call this BEFORE projecting q/k/v — e.g. to fold the flash kernel's
    lane padding into the projection weights (core.attention.Attention).
    """
    if (
        sp_mesh is not None
        and attention_mask is None
        and attention_bias is None
        and dropout_rate == 0.0
        and not return_matrix
        and kv_len >= sp_min_kv
    ):
        return "sp"
    if _flash_eligible(
        impl,
        q_len=q_len,
        kv_len=kv_len,
        flash_min_kv=flash_min_kv,
        flash_min_self=flash_min_self,
        flash_long_q_min_kv=flash_long_q_min_kv,
        attention_mask=attention_mask,
        attention_bias=attention_bias,
        dropout_rate=dropout_rate,
        return_matrix=return_matrix,
        interpret=interpret,
        backend=backend,
    ):
        return "flash"
    return "xla"


def _flash_eligible(
    impl: str,
    *,
    q_len: int,
    kv_len: int,
    flash_min_kv: int,
    attention_mask,
    attention_bias,
    flash_min_self: int,
    flash_long_q_min_kv: int,
    dropout_rate: float,
    return_matrix: bool,
    interpret: bool,
    backend=None,
) -> bool:
    if impl == "xla":
        return False
    if attention_mask is not None or attention_bias is not None:
        return False
    if dropout_rate > 0.0 or return_matrix:
        return False
    if impl == "flash":
        return True
    # "auto" must only pick the Mosaic kernel where it can actually run
    # (TPU, or interpreter mode for CPU tests).  The backend is resolved
    # device-correctly: an explicit Policy.backend wins, then the
    # jax_default_device config (set by ``jax.default_device(...)``), then
    # the process default backend.
    if not (interpret or _resolve_backend(backend) == "tpu"):
        return False
    # Self-attention over a large latent array: the [B,H,T,T] softmax
    # traffic dominates (flow: 24 layers x 16 heads x 2048^2 fp32 = 268 MB
    # per layer) and the streaming kernel wins despite its head-dim
    # padding -- measured 28.2 vs 32.4 ms/tile in-model at T=2048.  At
    # classification scale (T=512) XLA wins (318 vs 398 img/s), so the
    # threshold sits between them.
    if q_len == kv_len and q_len >= flash_min_self:
        return True
    # Long KV (encoder cross-attend) streams keys; long Q (decoder
    # cross-attend, e.g. flow's 182k queries x 2048 latents = 1.5 GB fp32
    # logits) blocks the query axis -- either way the [Tq, Tk] matrix must
    # not materialise.  The long-Q branch additionally requires the KV axis
    # to be non-trivial: with a SHORT KV the per-block logits are small and
    # XLA's fused GEMM+softmax beats the kernel (multimodal decode,
    # Tq=25k x Tk=784: 18.7 vs 17.6 clips/s in-model A/B).
    return kv_len >= flash_min_kv or (
        q_len >= flash_min_kv and kv_len >= flash_long_q_min_kv
    )


def multihead_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    q_mask: Optional[jnp.ndarray] = None,
    kv_mask: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,
    attention_bias: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_rng=None,
    softmax_dtype=jnp.float32,
    precision=None,
    impl: str = "auto",
    flash_min_kv: int = 8192,
    flash_min_self: int = 2048,
    flash_long_q_min_kv: int = 1024,
    return_matrix: bool = False,
    interpret: bool = False,
    sp_mesh=None,
    sp_axis: str = "model",
    sp_min_kv: int = 32768,
    sp_impl: str = "auto",
    softmax_scale: Optional[float] = None,
    kv_logical_len: Optional[int] = None,
    backend: Optional[str] = None,
    flash_block_q: Optional[int] = None,
    flash_block_k: Optional[int] = None,
):
    """Multi-head attention over [B, T, H, D] tensors.

    Args:
      q, k, v: [B,Tq,H,Dqk], [B,Tk,H,Dqk], [B,Tk,H,Dv].
      q_mask: optional [B,Tq] bool; invalid query rows are wiped to zero.
      kv_mask: optional [B,Tk] bool; invalid keys are excluded from softmax.
      attention_mask: optional pre-built [B,Tq,Tk] mask (forces XLA path).
      interpret: run the Pallas kernel in interpreter mode (CPU tests).
      softmax_scale: logit scale override (default 1/sqrt(Dqk)); required
        when the caller lane-padded the head dims (see attention_path).
      kv_logical_len: true key count when the caller block-aligned the
        token axis; on the flash path the tail is masked statically for
        free, on the fallback paths it is folded into kv_mask.

    Returns:
      [B, Tq, H*Dv] (plus the attention matrix when return_matrix=True).
    """
    kv_len = k.shape[1]
    path = attention_path(
        impl,
        q_len=q.shape[1],
        kv_len=kv_len,
        flash_min_kv=flash_min_kv,
        flash_min_self=flash_min_self,
        flash_long_q_min_kv=flash_long_q_min_kv,
        attention_mask=attention_mask,
        attention_bias=attention_bias,
        dropout_rate=dropout_rate,
        return_matrix=return_matrix,
        interpret=interpret,
        sp_mesh=sp_mesh,
        sp_min_kv=sp_min_kv,
        backend=backend,
    )

    if (
        kv_logical_len is not None
        and kv_logical_len < kv_len
        and path != "flash"
    ):
        # Safety net for callers that aligned the token axis but whose call
        # was dispatched off the flash path (CPU fallback, sp): express the
        # alignment padding as an ordinary kv-mask instead.
        tail_mask = jnp.broadcast_to(
            jnp.arange(kv_len) < kv_logical_len, (k.shape[0], kv_len)
        )
        kv_mask = tail_mask if kv_mask is None else (kv_mask & tail_mask)
        kv_logical_len = None

    if path == "sp":
        from perceiverio_pytorch_tpu.parallel.sequence_parallel import (
            sequence_parallel_attention,
        )

        sp_block_kwargs = {}
        if flash_block_q is not None:
            sp_block_kwargs["block_q"] = flash_block_q
        if flash_block_k is not None:
            sp_block_kwargs["block_k"] = flash_block_k
        out = sequence_parallel_attention(
            q, k, v, sp_mesh, kv_mask=kv_mask, axis_name=sp_axis,
            impl=sp_impl, interpret=interpret, softmax_scale=softmax_scale,
            backend=backend,
            **sp_block_kwargs,
        )
        if q_mask is not None:
            out = jnp.where(q_mask[:, :, None], out, 0.0)
        return out

    if path == "flash":
        from perceiverio_pytorch_tpu.ops.pallas.flash_attention import flash_attention

        block_kwargs = {}
        if flash_block_q is not None:
            block_kwargs["block_q"] = flash_block_q
        if flash_block_k is not None:
            block_kwargs["block_k"] = flash_block_k
        return flash_attention(
            q, k, v, q_mask=q_mask, kv_mask=kv_mask, interpret=interpret,
            softmax_scale=softmax_scale, kv_logical_len=kv_logical_len,
            **block_kwargs,
        )

    if q_mask is not None or kv_mask is not None:
        # Factored masks combine with (never replace, never get dropped by)
        # a caller-supplied rank-3 mask -- this includes the kv_mask the
        # alignment safety net above synthesized from kv_logical_len.
        batch = q.shape[0]
        qm = (
            q_mask
            if q_mask is not None
            else jnp.ones((batch, q.shape[1]), dtype=bool)
        )
        km = (
            kv_mask
            if kv_mask is not None
            else jnp.ones((batch, kv_len), dtype=bool)
        )
        factored = make_cross_attention_mask(qm, km)
        attention_mask = (
            factored
            if attention_mask is None
            else (attention_mask.astype(bool) & factored)
        )

    return attend_xla(
        q,
        k,
        v,
        attention_mask=attention_mask,
        attention_bias=attention_bias,
        dropout_rate=dropout_rate,
        dropout_rng=dropout_rng,
        softmax_dtype=softmax_dtype,
        precision=precision,
        return_matrix=return_matrix,
        softmax_scale=softmax_scale,
    )
