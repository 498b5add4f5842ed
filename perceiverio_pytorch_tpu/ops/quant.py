"""Dynamic int8 matmul for inference (the v5e int8 MXU path).

The v5e MXU runs int8xint8->int32 at ~2x the bf16 rate.  Early libtpu
builds in this environment did not expose that path through XLA (round-2
negative result: int8 measured SLOWER than bf16); the Jan-2026 libtpu
does: hoist-proof chained-matmul microbenches measure int8 at 192-256
T-op/s vs bf16's 137-143 at the classification GEMM shapes -- +16-44%
INCLUDING the quantize/dequantize chains (PERFORMANCE.md).

Recipe (standard dynamic quantization):
  * weights: symmetric per-output-channel scales, quantized from the fp32
    params at apply time (O(K*N) elementwise against an O(M*K*N) GEMM);
  * activations: symmetric per-row (per-token) scales computed on the fly;
  * accumulate int32 on the MXU, dequantize with the rank-1 outer product
    of the two scale vectors (fuses into the output elementwise chain).

Approximate: ~1% max relative error per GEMM on Gaussian data.  Built for
inference; differentiating through it uses a straight-through estimator
(the backward pass is the EXACT matmul's) so a training step through the
quant policy behaves like standard quantization-aware training rather
than silently zeroing the kernel gradients through ``jnp.round``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["int8_dynamic_matmul"]


@jax.custom_vjp
def _int8_matmul_f32(x32, k32):
    """fp32-in/fp32-out core with an STE backward (exact-matmul grads)."""
    w_scale = jnp.max(jnp.abs(k32), axis=0, keepdims=True) / 127.0  # [1, N]
    w_scale = jnp.maximum(w_scale, 1e-12)
    wq = jnp.round(k32 / w_scale).astype(jnp.int8)

    x_scale = (
        jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
    )  # [..., 1]
    x_scale = jnp.maximum(x_scale, 1e-12)
    xq = jnp.round(x32 / x_scale).astype(jnp.int8)

    y = jax.lax.dot_general(
        xq, wq, (((x32.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * x_scale * w_scale


def _int8_fwd(x32, k32):
    return _int8_matmul_f32(x32, k32), (x32, k32)


def _int8_bwd(res, g):
    x32, k32 = res
    g = g.astype(jnp.float32)
    dx = jax.lax.dot_general(
        g, k32, (((g.ndim - 1,), (1,)), ((), ()))
    )
    lead = tuple(range(g.ndim - 1))
    dk = jax.lax.dot_general(x32, g, ((lead, lead), ((), ())))
    return dx, dk


_int8_matmul_f32.defvjp(_int8_fwd, _int8_bwd)


def int8_dynamic_matmul(x, kernel, *, out_dtype: Optional[jnp.dtype] = None):
    """``x @ kernel`` on the int8 MXU with dynamic scales.

    Args:
      x: [..., K] activations (any float dtype).
      kernel: [K, N] float weights (quantized per output channel here).
      out_dtype: result dtype (default: ``x.dtype``).
    """
    out_dtype = out_dtype or x.dtype
    y = _int8_matmul_f32(x.astype(jnp.float32), kernel.astype(jnp.float32))
    return y.astype(out_dtype)
