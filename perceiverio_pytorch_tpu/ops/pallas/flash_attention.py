"""Pallas TPU flash attention: streaming-KV / blocked-Q online softmax.

The optical-flow encoder cross-attends 2048 latents against 182,528 input
tokens and the decoder cross-attends 182,528 queries against the latents
(/root/reference/perceiver_io/flow_perceiver.py:34-42); materialising the
[B, H, Tq, Tk] matrix (the reference's eager path,
transformer_primitives.py:138-163) would need tens of GB.  This kernel
streams KV blocks through VMEM with an online softmax -- the single-chip
analogue of ring attention -- so memory is O(block_q x block_k) per core and
the MXU sees back-to-back [block_q, d] x [d, block_k] matmuls.

Semantics match ops.attention_xla.attend_xla:
  * post-matmul 1/sqrt(d) scaling;
  * factored masks: invalid keys contribute exactly zero probability,
    fully-masked / invalid query rows produce exactly zero output
    (wipe_attn, transformer_primitives.py:168-175);
  * softmax statistics accumulate in fp32 regardless of input dtype.

The wrapper pads head dims to lane multiples and sequence lengths to block
multiples.  Padded keys are masked *inside* the kernel from a static length
comparison (no mask operand needed); a user kv-mask rides along as a
[B, k_pad] int32 operand whose block covers the full batch axis (TPU block
shapes require the sublane dim to match the array or be 8-aligned).

Gradients: ``flash_attention`` carries a custom VJP.  The default backward
is two Pallas sweeps (dKV over key blocks with the Q axis as the reduction,
dQ over query blocks with KV as the reduction) that recompute p from the
log-sum-exp saved by the forward -- O(block) VMEM, no [Tq, Tk]
materialisation, measured 1.4x faster than the ``pallas_backward=False``
fallback (a chunked ``lax.scan`` recompute in XLA with the same O(N)
memory) on the full-scale flow training step.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _vma_union(*arrays):
    """Union of the operands' varying-manual-axes sets.  Under shard_map
    (ring attention) pallas_call outputs must declare which mesh axes they
    vary over; outside shard_map this is the empty set (a no-op)."""
    vma = frozenset()
    for a in arrays:
        if a is not None:
            vma = vma | jax.typeof(a).vma
    return vma


def _pvary_all(vma, *arrays):
    """Promote every operand to the common vma (no-op outside shard_map)."""
    out = []
    for a in arrays:
        if a is None:
            out.append(None)
            continue
        missing = tuple(vma - jax.typeof(a).vma)
        out.append(jax.lax.pvary(a, missing) if missing else a)
    return out


def _flash_kernel(
    # kv_mask_ref ([B, k_pad] int32, full batch per block) is present only
    # when has_kv_mask; refs after it shift accordingly.
    *refs,
    scale: float,
    num_k_blocks: int,
    block_k: int,
    kv_len: int,
    k_pad: int,
    has_kv_mask: bool,
    emit_lse: bool,
):
    if has_kv_mask:
        q_ref, k_ref, v_ref, kv_mask_ref, *rest = refs
    else:
        q_ref, k_ref, v_ref, *rest = refs
        kv_mask_ref = None
    if emit_lse:
        out_ref, lse_ref, m_scratch, l_scratch, acc_scratch = rest
    else:
        out_ref, m_scratch, l_scratch, acc_scratch = rest
        lse_ref = None

    b = pl.program_id(0)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]

    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale  # post-matmul scaling, reference semantics

    if k_pad != kv_len:
        # Mask the sequence-padding keys from a static length comparison.
        key_idx = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1
        )
        s = jnp.where(key_idx < kv_len, s, -jnp.inf)
    if has_kv_mask:
        valid = kv_mask_ref[b, pl.ds(ik * block_k, block_k)] > 0  # [block_k]
        s = jnp.where(valid[None, :], s, -jnp.inf)

    m_prev = m_scratch[:, 0:1]  # [block_q, 1]
    l_prev = l_scratch[:, 0:1]

    m_cur = jnp.max(s, axis=-1, keepdims=True)  # [block_q, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    # Guard fully-masked-so-far rows: exp(-inf - -inf) would be NaN.
    m_safe = jnp.where(m_new == -jnp.inf, 0.0, m_new)

    p = jnp.exp(s - m_safe)  # masked entries: exp(-inf - finite) = 0
    alpha = jnp.where(m_prev == -jnp.inf, 0.0, jnp.exp(m_prev - m_safe))

    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scratch[:] = acc_scratch[:] * alpha + pv

    m_scratch[:] = jnp.broadcast_to(m_new, m_scratch.shape)
    l_scratch[:] = jnp.broadcast_to(l_new, l_scratch.shape)

    @pl.when(ik == num_k_blocks - 1)
    def _finalize():
        l = l_scratch[:, 0:1]
        m = m_scratch[:, 0:1]
        # l == 0 -> every key masked: wipe the row to exact zero
        l_safe = jnp.where(l == 0.0, 1.0, l)
        out_ref[0, 0] = (acc_scratch[:] / l_safe).astype(out_ref.dtype)
        if emit_lse:
            # log-sum-exp per query row, saved for the backward kernels;
            # +inf for fully-masked rows so exp(s - lse) recomputes p = 0.
            lse_ref[0, 0] = jnp.where(l == 0.0, jnp.inf, m + jnp.log(l_safe))


def _pick_blocks(block_q, block_k, q_len, kv_len, d_pad, dv_pad, itemsize,
                 extra_scratch_cols=0, unbounded=False, mask_rows=0):
    """Shrink block sizes until the kernel's VMEM footprint fits (~16 MB/core):
    wide heads (e.g. the multimodal 704-ch single-head cross-attend) or fp32
    operands would otherwise overflow scoped VMEM at the defaults.

    ``mask_rows``: batch size when a kv_mask operand rides along -- its
    BlockSpec is the FULL [batch, k_pad] int32 array resident every grid
    cell (TPU sublane alignment forbids slicing its batch axis), a fixed
    cost block shrinking cannot reduce, so it comes out of the budget.

    ``unbounded`` (interpreter mode) skips the VMEM budget: the interpreter
    has no VMEM, and CPU parity tests at full model scale NEED large blocks
    (grid cells are the interpreter's unit of overhead -- 182k tokens at the
    hardware block sizes is hundreds of cells)."""
    block_q = min(block_q, _round_up(q_len, 8))
    block_k = min(block_k, _round_up(kv_len, _LANE))
    if unbounded:
        return block_q, block_k

    def _vmem_bytes(bq, bk):
        operands = (bq * (d_pad + dv_pad) + bk * (d_pad + dv_pad)) * itemsize * 2
        scores = bq * bk * 4 * 2  # s and p in fp32
        scratch = (bq * dv_pad + 2 * bq * _LANE + (bq + bk) * extra_scratch_cols) * 4
        out = (bq + bk) * (d_pad + dv_pad) * itemsize
        mask = mask_rows * _round_up(kv_len, bk) * 4
        return operands + scores + scratch + out + mask

    budget = 12 * 1024 * 1024
    while _vmem_bytes(block_q, block_k) > budget and (
        block_k > _LANE or block_q > 128
    ):
        if block_k >= block_q and block_k > _LANE:
            block_k //= 2
        else:
            block_q = max(block_q // 2, 8)
    return block_q, block_k


def _flash_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray],
    *,
    block_q: int,
    block_k: int,
    interpret: bool,
    need_lse: bool = False,
    softmax_scale: Optional[float] = None,
    kv_logical_len: Optional[int] = None,
) -> jnp.ndarray:
    """Core pallas_call on [B, H, T, D]-transposed operands."""
    batch, num_heads, q_len, qk_dim = q.shape
    kv_shape_len = k.shape[2]
    # kv_logical_len: callers that block-align the token axis upstream (so
    # the jnp.pad below is a no-op) pass the true key count here; keys in
    # [kv_logical_len, shape) are masked by the same static iota comparison
    # that handles wrapper padding -- zero extra kernel cost.
    kv_len = kv_logical_len if kv_logical_len is not None else kv_shape_len
    v_dim = v.shape[3]
    # softmax_scale overrides the shape-derived 1/sqrt(d): callers that fold
    # the lane padding into their projection weights hand in q/k whose last
    # dim is already d_pad but whose logical head dim is smaller.
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(qk_dim)

    # Pad to hardware-friendly shapes.
    d_pad = _round_up(qk_dim, _LANE)
    dv_pad = _round_up(v_dim, _LANE)
    block_q, block_k = _pick_blocks(
        block_q, block_k, q_len, kv_len, d_pad, dv_pad, q.dtype.itemsize,
        unbounded=interpret,
        mask_rows=batch if kv_mask is not None else 0,
    )

    q_pad = _round_up(q_len, block_q)
    k_pad = _round_up(kv_shape_len, block_k)

    q = jnp.pad(q, ((0, 0), (0, 0), (0, q_pad - q_len), (0, d_pad - qk_dim)))
    k = jnp.pad(
        k, ((0, 0), (0, 0), (0, k_pad - kv_shape_len), (0, d_pad - qk_dim))
    )
    v = jnp.pad(
        v, ((0, 0), (0, 0), (0, k_pad - kv_shape_len), (0, dv_pad - v_dim))
    )

    num_q_blocks = q_pad // block_q
    num_k_blocks = k_pad // block_k
    grid = (batch, num_heads, num_q_blocks, num_k_blocks)

    in_specs = [
        pl.BlockSpec(
            (1, 1, block_q, d_pad),
            lambda b, h, iq, ik: (b, h, iq, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, block_k, d_pad),
            lambda b, h, iq, ik: (b, h, ik, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, block_k, dv_pad),
            lambda b, h, iq, ik: (b, h, ik, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [q, k, v]
    has_kv_mask = kv_mask is not None
    if has_kv_mask:
        mask_arr = jnp.pad(
            kv_mask.astype(jnp.int32), ((0, 0), (0, k_pad - kv_shape_len))
        )
        # Full-array block: TPU requires the sublane dim of a block to be
        # 8-aligned or equal to the array dim, so the whole [batch, k_pad]
        # mask rides in VMEM each cell -- budgeted via _pick_blocks
        # (mask_rows), since block shrinking cannot reduce it.
        in_specs.append(
            pl.BlockSpec(
                (batch, k_pad),
                lambda b, h, iq, ik: (0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(mask_arr)

    kernel = functools.partial(
        _flash_kernel,
        scale=scale,
        num_k_blocks=num_k_blocks,
        block_k=block_k,
        kv_len=kv_len,
        k_pad=k_pad,
        has_kv_mask=has_kv_mask,
        emit_lse=need_lse,
    )

    vma = _vma_union(*operands)
    operands = _pvary_all(vma, *operands)

    out_spec = pl.BlockSpec(
        (1, 1, block_q, dv_pad),
        lambda b, h, iq, ik: (b, h, iq, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct(
        (batch, num_heads, q_pad, dv_pad), q.dtype, vma=vma
    )
    if need_lse:
        lse_spec = pl.BlockSpec(
            (1, 1, block_q, 1),
            lambda b, h, iq, ik: (b, h, iq, 0),
            memory_space=pltpu.VMEM,
        )
        out_specs = (out_spec, lse_spec)
        out_shapes = (
            out_shape,
            jax.ShapeDtypeStruct(
                (batch, num_heads, q_pad, 1), jnp.float32, vma=vma
            ),
        )
    else:
        out_specs = out_spec
        out_shapes = out_shape

    result = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, dv_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * num_heads * q_pad * k_pad * (d_pad + dv_pad),
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=batch * num_heads * q_pad * k_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            # batch/head/Q-block grid dims are independent; only the KV walk
            # is a sequential reduction (lets megacore chips split the grid).
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)

    if need_lse:
        out, lse = result
        return out[:, :, :q_len, :v_dim], lse[:, :, :q_len, 0]
    return result[:, :, :q_len, :v_dim], None


def _chunked_attention_bwd(q, k, v, kv_mask, q_mask, g, *, block_q,
                           softmax_scale=None, kv_logical_len=None):
    """O(N)-memory backward: recompute attention per Q chunk (lax.scan).

    Never materialises the full [B, H, Tq, Tk] matrix -- peak extra memory is
    one [B, H, block_q, Tk] fp32 tile, so flow-scale training (Tq or Tk ~
    182k) fits in HBM.  Matches the semantics of the forward exactly: scale
    applied to the logits, -inf fill for invalid keys, wiped (invalid-query
    or all-keys-masked) rows carry zero gradient.
    """
    batch, q_len, num_heads, qk_dim = q.shape
    kv_len, v_dim = k.shape[1], v.shape[3]
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(qk_dim)
    in_dtype = q.dtype

    g = g.reshape(batch, q_len, num_heads, v_dim)

    chunk = min(block_q, q_len)
    q_pad = _round_up(q_len, chunk)
    if q_pad != q_len:
        pad = ((0, 0), (0, q_pad - q_len), (0, 0), (0, 0))
        q = jnp.pad(q, pad)
        g = jnp.pad(g, pad)
        qm = q_mask if q_mask is not None else jnp.ones((batch, q_len), bool)
        q_mask = jnp.pad(qm, ((0, 0), (0, q_pad - q_len)))
    n_chunks = q_pad // chunk

    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    def chunk_slice(x, i):
        return jax.lax.dynamic_slice_in_dim(x, i * chunk, chunk, axis=1)

    def body(carry, i):
        dk, dv = carry
        qc = chunk_slice(q, i).astype(jnp.float32)
        gc = chunk_slice(g, i).astype(jnp.float32)

        s = jnp.einsum("bthd,bshd->bhts", qc, kf) * scale
        if kv_mask is not None:
            s = jnp.where(kv_mask[:, None, None, :], s, -jnp.inf)
        if kv_logical_len is not None and kv_logical_len < kv_len:
            # keys beyond the logical length are upstream block-alignment
            # padding, masked in the forward
            s = jnp.where(
                jnp.arange(kv_len)[None, None, None, :] < kv_logical_len,
                s,
                -jnp.inf,
            )
        m = jnp.max(s, axis=-1, keepdims=True)
        m = jnp.where(m == -jnp.inf, 0.0, m)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        p = e / jnp.where(denom == 0.0, 1.0, denom)

        # Rows the forward wiped to zero must carry zero gradient.
        row_valid = denom[:, :, :, 0] > 0.0  # [B, H, chunk]
        if q_mask is not None:
            qm_c = chunk_slice(q_mask, i)  # [B, chunk]
            row_valid = row_valid & jnp.transpose(qm_c[:, :, None], (0, 2, 1))
        gc = jnp.where(
            jnp.transpose(row_valid, (0, 2, 1))[:, :, :, None], gc, 0.0
        )

        dv = dv + jnp.einsum("bhts,bthd->bshd", p, gc)
        dp = jnp.einsum("bthd,bshd->bhts", gc, vf)
        ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
        dq_c = jnp.einsum("bhts,bshd->bthd", ds, kf) * scale
        dk = dk + jnp.einsum("bhts,bthd->bshd", ds, qc) * scale
        return (dk, dv), dq_c

    (dk, dv), dq_chunks = jax.lax.scan(
        body,
        (jnp.zeros(k.shape, jnp.float32), jnp.zeros(v.shape, jnp.float32)),
        jnp.arange(n_chunks),
    )
    # [n_chunks, B, chunk, H, D] -> [B, q_len, H, D]
    dq = jnp.moveaxis(dq_chunks, 0, 1).reshape(batch, q_pad, num_heads, qk_dim)
    dq = dq[:, :q_len]
    return dq.astype(in_dtype), dk.astype(in_dtype), dv.astype(in_dtype)




def _bwd_common(q, k, do, v, lse, delta, *, scale, ik, block_k, kv_len, k_pad,
                kv_mask_ref, b):
    """Recompute p and ds for one (q block, k block) pair (fp32)."""
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale
    if k_pad != kv_len:
        key_idx = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1
        )
        s = jnp.where(key_idx < kv_len, s, -jnp.inf)
    if kv_mask_ref is not None:
        valid = kv_mask_ref[b, pl.ds(ik * block_k, block_k)] > 0
        s = jnp.where(valid[None, :], s, -jnp.inf)
    # lse = +inf for wiped/padded rows -> p = 0 there
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta)
    return p, ds


def _bwd_dkv_kernel(*refs, scale, num_q_blocks, block_k, kv_len, k_pad,
                    has_kv_mask):
    if has_kv_mask:
        (q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref, kv_mask_ref,
         dk_ref, dv_ref, dk_s, dv_s) = refs
    else:
        (q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
         dk_ref, dv_ref, dk_s, dv_s) = refs
        kv_mask_ref = None
    b = pl.program_id(0)
    ik = pl.program_id(2)
    iq = pl.program_id(3)

    @pl.when(iq == 0)
    def _():
        dk_s[:] = jnp.zeros_like(dk_s)
        dv_s[:] = jnp.zeros_like(dv_s)

    q = q_ref[0, 0]
    do = do_ref[0, 0]
    p, ds = _bwd_common(
        q, k_ref[0, 0], do, v_ref[0, 0], lse_ref[0, 0], delta_ref[0, 0],
        scale=scale, ik=ik, block_k=block_k, kv_len=kv_len, k_pad=k_pad,
        kv_mask_ref=kv_mask_ref, b=b,
    )
    # dv += p^T @ do ; dk += ds^T @ q (both contract the q-block axis)
    dv_s[:] = dv_s[:] + jax.lax.dot_general(
        p.astype(do.dtype), do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_s[:] = dk_s[:] + jax.lax.dot_general(
        ds.astype(q.dtype), q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(iq == num_q_blocks - 1)
    def _():
        dk_ref[0, 0] = dk_s[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_s[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(*refs, scale, num_k_blocks, block_k, kv_len, k_pad,
                   has_kv_mask):
    if has_kv_mask:
        (q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref, kv_mask_ref,
         dq_ref, dq_s) = refs
    else:
        (q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
         dq_ref, dq_s) = refs
        kv_mask_ref = None
    b = pl.program_id(0)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _():
        dq_s[:] = jnp.zeros_like(dq_s)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    _, ds = _bwd_common(
        q, k, do_ref[0, 0], v_ref[0, 0], lse_ref[0, 0], delta_ref[0, 0],
        scale=scale, ik=ik, block_k=block_k, kv_len=kv_len, k_pad=k_pad,
        kv_mask_ref=kv_mask_ref, b=b,
    )
    dq_s[:] = dq_s[:] + jax.lax.dot_general(
        ds.astype(k.dtype), k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(ik == num_k_blocks - 1)
    def _():
        dq_ref[0, 0] = dq_s[:].astype(dq_ref.dtype)


def _pallas_attention_bwd(q, k, v, kv_mask, q_mask, out, lse, g, *,
                          block_q, block_k, interpret, softmax_scale=None,
                          kv_logical_len=None):
    """Flash backward: two Pallas sweeps (dKV over K blocks, dQ over Q blocks)
    recomputing p from the saved log-sum-exp -- O(block) VMEM, no [Tq, Tk]
    materialisation anywhere.
    """
    batch, q_len, num_heads, qk_dim = q.shape
    kv_shape_len, v_dim = k.shape[1], v.shape[3]
    # keys in [kv_logical_len, shape) were masked in the forward: p
    # recomputes to zero there via the same static kv_len comparison, so
    # their dk/dv rows come out exactly zero.
    kv_len = kv_logical_len if kv_logical_len is not None else kv_shape_len
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(qk_dim)
    in_dtype = q.dtype

    do = g.reshape(batch, q_len, num_heads, v_dim)
    if q_mask is not None:
        do = jnp.where(q_mask[:, :, None, None], do, 0.0)

    # [B, T, H, D] -> [B, H, T, D]
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    dot = jnp.transpose(do, (0, 2, 1, 3))
    out_t = jnp.transpose(out.reshape(batch, q_len, num_heads, v_dim),
                          (0, 2, 1, 3))
    delta = jnp.sum(dot.astype(jnp.float32) * out_t.astype(jnp.float32), -1)

    d_pad = _round_up(qk_dim, _LANE)
    dv_pad = _round_up(v_dim, _LANE)
    block_q, block_k = _pick_blocks(
        block_q, block_k, q_len, kv_len, d_pad, dv_pad, q.dtype.itemsize,
        extra_scratch_cols=d_pad + dv_pad, unbounded=interpret,
        mask_rows=batch if kv_mask is not None else 0,
    )
    q_pad = _round_up(q_len, block_q)
    k_pad = _round_up(kv_shape_len, block_k)

    qt = jnp.pad(qt, ((0, 0), (0, 0), (0, q_pad - q_len), (0, d_pad - qk_dim)))
    dot = jnp.pad(dot, ((0, 0), (0, 0), (0, q_pad - q_len), (0, dv_pad - v_dim)))
    kt = jnp.pad(
        kt, ((0, 0), (0, 0), (0, k_pad - kv_shape_len), (0, d_pad - qk_dim))
    )
    vt = jnp.pad(
        vt, ((0, 0), (0, 0), (0, k_pad - kv_shape_len), (0, dv_pad - v_dim))
    )
    # padded q rows: lse=+inf -> p=0 -> they contribute nothing
    lse_p = jnp.pad(lse, ((0, 0), (0, 0), (0, q_pad - q_len)),
                    constant_values=jnp.inf)[..., None]
    delta_p = jnp.pad(delta, ((0, 0), (0, 0), (0, q_pad - q_len)))[..., None]

    nq = q_pad // block_q
    nk = k_pad // block_k
    has_kv_mask = kv_mask is not None

    # dKV sweep: grid (B, H, nK, nQ), q innermost
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d_pad), lambda b, h, ik, iq: (b, h, iq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q, dv_pad), lambda b, h, ik, iq: (b, h, iq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q, 1), lambda b, h, ik, iq: (b, h, iq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q, 1), lambda b, h, ik, iq: (b, h, iq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, d_pad), lambda b, h, ik, iq: (b, h, ik, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, dv_pad), lambda b, h, ik, iq: (b, h, ik, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qt, dot, lse_p, delta_p, kt, vt]
    if has_kv_mask:
        mask_arr = jnp.pad(
            kv_mask.astype(jnp.int32), ((0, 0), (0, k_pad - kv_shape_len))
        )
        in_specs.append(
            pl.BlockSpec((batch, k_pad), lambda b, h, ik, iq: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(mask_arr)

    vma = _vma_union(*operands)
    operands = _pvary_all(vma, *operands)

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, num_q_blocks=nq, block_k=block_k,
            kv_len=kv_len, k_pad=k_pad, has_kv_mask=has_kv_mask,
        ),
        grid=(batch, num_heads, nk, nq),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, block_k, d_pad), lambda b, h, ik, iq: (b, h, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, dv_pad), lambda b, h, ik, iq: (b, h, ik, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, num_heads, k_pad, d_pad), in_dtype,
                                 vma=vma),
            jax.ShapeDtypeStruct((batch, num_heads, k_pad, dv_pad), in_dtype,
                                 vma=vma),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d_pad), jnp.float32),
            pltpu.VMEM((block_k, dv_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)

    # dQ sweep: grid (B, H, nQ, nK), k innermost
    in_specs2 = [
        pl.BlockSpec((1, 1, block_q, d_pad), lambda b, h, iq, ik: (b, h, iq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q, dv_pad), lambda b, h, iq, ik: (b, h, iq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q, 1), lambda b, h, iq, ik: (b, h, iq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q, 1), lambda b, h, iq, ik: (b, h, iq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, d_pad), lambda b, h, iq, ik: (b, h, ik, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, dv_pad), lambda b, h, iq, ik: (b, h, ik, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands2 = [qt, dot, lse_p, delta_p, kt, vt]
    if has_kv_mask:
        in_specs2.append(
            pl.BlockSpec((batch, k_pad), lambda b, h, iq, ik: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands2.append(mask_arr)

    operands2 = _pvary_all(vma, *operands2)

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, num_k_blocks=nk, block_k=block_k,
            kv_len=kv_len, k_pad=k_pad, has_kv_mask=has_kv_mask,
        ),
        grid=(batch, num_heads, nq, nk),
        in_specs=in_specs2,
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d_pad), lambda b, h, iq, ik: (b, h, iq, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((batch, num_heads, q_pad, d_pad),
                                       in_dtype, vma=vma),
        scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands2)

    dq = jnp.transpose(dq[:, :, :q_len, :qk_dim], (0, 2, 1, 3))
    dk = jnp.transpose(dk[:, :, :kv_shape_len, :qk_dim], (0, 2, 1, 3))
    dv = jnp.transpose(dv[:, :, :kv_shape_len, :v_dim], (0, 2, 1, 3))
    return dq, dk, dv


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10)
)
def _flash_attention_vjp(
    q, k, v, kv_mask, q_mask, block_q, block_k, interpret, pallas_backward,
    softmax_scale, kv_logical_len,
):
    out, _ = _flash_impl(
        q, k, v, kv_mask, q_mask, block_q, block_k, interpret,
        need_lse=False, softmax_scale=softmax_scale,
        kv_logical_len=kv_logical_len,
    )
    return out


def _flash_impl(q, k, v, kv_mask, q_mask, block_q, block_k, interpret,
                need_lse=False, softmax_scale=None, kv_logical_len=None):
    # [B, T, H, D] -> [B, H, T, D] for blocking.
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    out, lse = _flash_forward(
        qt, kt, vt, kv_mask, block_q=block_q, block_k=block_k,
        interpret=interpret, need_lse=need_lse, softmax_scale=softmax_scale,
        kv_logical_len=kv_logical_len,
    )
    out = jnp.transpose(out, (0, 2, 1, 3))  # [B, Tq, H, Dv]
    if q_mask is not None:
        out = jnp.where(q_mask[:, :, None, None], out, 0.0)
    batch, q_len, num_heads, v_dim = out.shape
    return out.reshape(batch, q_len, num_heads * v_dim), lse


def _flash_fwd(q, k, v, kv_mask, q_mask, block_q, block_k, interpret,
               pallas_backward, softmax_scale, kv_logical_len):
    out, lse = _flash_impl(
        q, k, v, kv_mask, q_mask, block_q, block_k, interpret,
        need_lse=pallas_backward, softmax_scale=softmax_scale,
        kv_logical_len=kv_logical_len,
    )
    return out, (q, k, v, kv_mask, q_mask, out, lse)


def _flash_bwd(block_q, block_k, interpret, pallas_backward, softmax_scale,
               kv_logical_len, residuals, g):
    q, k, v, kv_mask, q_mask, out, lse = residuals
    if pallas_backward:
        dq, dk, dv = _pallas_attention_bwd(
            q, k, v, kv_mask, q_mask, out, lse, g,
            block_q=block_q, block_k=block_k, interpret=interpret,
            softmax_scale=softmax_scale, kv_logical_len=kv_logical_len,
        )
    else:
        dq, dk, dv = _chunked_attention_bwd(
            q, k, v, kv_mask, q_mask, g, block_q=block_q,
            softmax_scale=softmax_scale, kv_logical_len=kv_logical_len,
        )
    return dq, dk, dv, None, None


_flash_attention_vjp.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    q_mask: Optional[jnp.ndarray] = None,
    kv_mask: Optional[jnp.ndarray] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
    pallas_backward: bool = True,
    softmax_scale: Optional[float] = None,
    kv_logical_len: Optional[int] = None,
) -> jnp.ndarray:
    """Flash multi-head attention.

    Args:
      q: [B, Tq, H, Dqk]; k: [B, Tk, H, Dqk]; v: [B, Tk, H, Dv].
      q_mask: optional [B, Tq] bool; invalid rows wiped to zero.
      kv_mask: optional [B, Tk] bool; invalid keys excluded.
      interpret: run in the Pallas interpreter (for CPU tests).
      pallas_backward: use the Pallas dKV/dQ sweeps for gradients; False
        falls back to the chunked lax.scan recompute (same O(N) memory).
      softmax_scale: logit scale; defaults to 1/sqrt(Dqk).  Callers that fold
        the lane padding into their projection weights pass 1/sqrt(logical d)
        here since Dqk is then already the padded width.
      kv_logical_len: true key count when the caller block-aligned the token
        axis upstream (so Tk is already a block multiple); keys beyond it are
        masked by the kernel's static tail comparison at zero extra cost.

    Returns:
      [B, Tq, H*Dv].
    """
    if q_mask is not None:
        q_mask = q_mask.astype(bool)
    if kv_mask is not None:
        kv_mask = kv_mask.astype(bool)
    return _flash_attention_vjp(
        q, k, v, kv_mask, q_mask, block_q, block_k, interpret,
        pallas_backward, softmax_scale, kv_logical_len,
    )
