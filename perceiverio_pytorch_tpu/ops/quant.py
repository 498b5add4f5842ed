"""int8 matmuls for inference (the v5e int8 MXU path).

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

STATIC variant (``Policy.quant == "int8_static"``): the per-token max
pass is replaced by one calibrated scalar per GEMM site (a "quant_stats"
flax collection filled by running representative batches with
``mutable=["quant_stats"]`` -- see ``calibrate``).  Cheaper at huge token
counts -- the dynamic mode's per-row ``max|x|`` reduction is an extra
full read of a 182k-805k-token activation -- at the cost of standard
post-training-quantization accuracy (outliers beyond the calibrated
range clip at +-127).  Decode-shape microbench ([50432,1026]x[1026,1026],
chained): bf16 1124-1187 us, int8 dynamic 904-918, int8 static 841-887.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "calibrate",
    "int8_dynamic_matmul",
    "int8_static_matmul",
    "quant_error_report",
]


def _quantize_weights(k32):
    """Symmetric per-output-channel int8 weights + [1, N] scales."""
    w_scale = jnp.max(jnp.abs(k32), axis=0, keepdims=True) / 127.0
    w_scale = jnp.maximum(w_scale, 1e-12)
    return jnp.round(k32 / w_scale).astype(jnp.int8), w_scale


@jax.custom_vjp
def _int8_matmul_f32(x32, k32):
    """fp32-in/fp32-out core with an STE backward (exact-matmul grads)."""
    wq, w_scale = _quantize_weights(k32)

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


@jax.custom_vjp
def _int8_static_matmul_f32(x32, k32, amax):
    """Like ``_int8_matmul_f32`` but with ONE calibrated activation scale.

    ``amax`` is a scalar: the calibrated ``max|x|`` for this GEMM site.
    An uncalibrated site (amax == 0) falls back to scale 1.0 -- bounded
    but coarse; run ``calibrate`` before static inference.  Values beyond
    the calibrated range clip at the int8 grid edge (standard PTQ).
    """
    wq, w_scale = _quantize_weights(k32)
    x_scale = jnp.where(amax > 0, amax, 127.0) / 127.0
    xq = jnp.clip(jnp.round(x32 / x_scale), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, wq, (((x32.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (x_scale * w_scale)


def _int8_static_fwd(x32, k32, amax):
    return _int8_static_matmul_f32(x32, k32, amax), (x32, k32, amax)


def _int8_static_bwd(res, g):
    x32, k32, amax = res
    dx, dk = _int8_bwd((x32, k32), g)
    return dx, dk, jnp.zeros_like(amax)


_int8_static_matmul_f32.defvjp(_int8_static_fwd, _int8_static_bwd)


def int8_static_matmul(
    x, kernel, amax, *, out_dtype: Optional[jnp.dtype] = None
):
    """``x @ kernel`` on the int8 MXU with a calibrated activation scale.

    Args:
      x: [..., K] activations (any float dtype).
      kernel: [K, N] float weights (quantized per output channel here).
      amax: scalar calibrated ``max|x|`` for this site (see ``calibrate``).
      out_dtype: result dtype (default: ``x.dtype``).
    """
    out_dtype = out_dtype or x.dtype
    y = _int8_static_matmul_f32(
        x.astype(jnp.float32),
        kernel.astype(jnp.float32),
        jnp.asarray(amax, jnp.float32),
    )
    return y.astype(out_dtype)


def calibrate(model, variables, batches, **apply_kwargs):
    """Fill the ``quant_stats`` collection from representative batches.

    Runs ``model.apply`` once per batch with ``mutable=["quant_stats"]``;
    each ``int8_static`` GEMM site records the running ``max|x|`` of its
    (exact, unquantized) input activations.  Returns ``variables`` with the
    updated collection merged in -- pass the result to inference applies.

    Args:
      model: a flax module built with ``Policy(quant="int8_static")``.
      variables: the init/loaded variables dict (contains "quant_stats").
      batches: iterable of positional-argument tuples for ``model.apply``.
      **apply_kwargs: static keyword arguments forwarded to ``apply``
        (e.g. ``n_chunks=16``).
    """
    run = jax.jit(
        lambda v, args: model.apply(
            v, *args, mutable=["quant_stats"], **apply_kwargs
        )[1]
    )
    for args in batches:
        updated = run(variables, tuple(args))
        variables = {**variables, **updated}
    return variables


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


def quant_error_report(model, variables, batches, **apply_kwargs):
    """Compare quantized vs exact outputs on representative batches.

    The accuracy check to run before deploying a quant mode: rebuilds the
    same model with ``quant=None`` (same params -- quant adds no params),
    applies both on each batch, and accumulates per-output-leaf error
    statistics.  Works for any task model taking ``policy=`` (all do).

    Args:
      model: a flax module built with a quantizing Policy.
      variables: its variables (a ``quant_stats`` collection is dropped for
        the exact twin).
      batches: iterable of positional-argument tuples for ``model.apply``.
      **apply_kwargs: static keyword arguments forwarded to both applies.

    Returns:
      dict mapping each output leaf path (or "output" for a bare array) to
      ``{"max_rel": ..., "max_abs": ..., "mean_abs": ...}`` where max_rel
      is the max abs error over the leaf normalised by the exact leaf's
      max magnitude.
    """
    import dataclasses as _dc

    import numpy as _np

    exact = model.clone(policy=_dc.replace(model.policy, quant=None))
    v_exact = {k: v for k, v in variables.items() if k != "quant_stats"}
    qf = jax.jit(lambda v, a: model.apply(v, *a, **apply_kwargs))
    ef = jax.jit(lambda v, a: exact.apply(v, *a, **apply_kwargs))

    stats: dict = {}
    for args in batches:
        got = jax.device_get(qf(variables, tuple(args)))
        want = jax.device_get(ef(v_exact, tuple(args)))
        flat_g, treedef = jax.tree_util.tree_flatten_with_path(got)
        flat_w = jax.tree_util.tree_leaves(want)
        for (path, g), w in zip(flat_g, flat_w):
            g = _np.asarray(g, _np.float32)
            w = _np.asarray(w, _np.float32)
            err = _np.abs(g - w)
            key = jax.tree_util.keystr(path) or "output"
            s = stats.setdefault(
                key, {"max_rel": 0.0, "max_abs": 0.0, "_sum": 0.0, "_n": 0}
            )
            denom = max(float(_np.abs(w).max()), 1e-12)
            s["max_rel"] = max(s["max_rel"], float(err.max()) / denom)
            s["max_abs"] = max(s["max_abs"], float(err.max()))
            s["_sum"] += float(err.sum())
            s["_n"] += err.size
    return {
        k: {
            "max_rel": s["max_rel"],
            "max_abs": s["max_abs"],
            "mean_abs": s["_sum"] / max(s["_n"], 1),
        }
        for k, s in stats.items()
    }
