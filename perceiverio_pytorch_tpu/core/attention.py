"""Transformer primitives: Attention, MLP, SelfAttention, CrossAttention.

TPU-native re-implementation of
/root/reference/perceiver_io/transformer_primitives.py with the same public
knob surface:
  * ``Attention`` (:18-180): separate q/k/v projections with independently
    sizable qk_out_channels / v_out_channels / output_channels, post-matmul
    1/sqrt(d) scaling, -1e30 mask fill, post-softmax dropout, wipe_attn.
  * ``MLP`` (:183-216): Dense -> GELU (exact erf form, matching torch
    F.gelu's default) -> Dense -> Dropout.
  * ``SelfAttention`` (:219-297): pre-LN residual block.
  * ``CrossAttention`` (:300-406): separate q/kv layer norms, ``shape_for_attn``
    q/kv switch, optional query residual, MLP widening default 1.

Differences by design (TPU-first, not a port):
  * attention math is dispatched through ops.attention so long-KV/long-Q sites
    run the Pallas flash kernel instead of materialising [B,H,Tq,Tk];
  * masks travel in factored [B,Tq]/[B,Tk] form;
  * a dtype Policy threads through every block (bf16 matmuls + fp32 softmax
    and layer norms in performance mode).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from flax.linen.dtypes import promote_dtype

from perceiverio_pytorch_tpu.config import (
    DEFAULT,
    Policy,
    quant_enabled,
    quant_mode,
)
from perceiverio_pytorch_tpu.ops.attention import multihead_attention
from perceiverio_pytorch_tpu.ops.attention_xla import make_cross_attention_mask
from perceiverio_pytorch_tpu.utils.initializers import variance_scaling

__all__ = [
    "Attention",
    "FoldedQuery",
    "MLP",
    "SelfAttention",
    "CrossAttention",
    "make_cross_attention_mask",
]


class FoldedQuery(NamedTuple):
    """A decoder query in factored (pos-features, constant-pad) form.

    The multimodal decoder query is, per modality, ``concat([pos_query,
    broadcast(trainable_pad)], axis=-1)`` padded to a common channel count
    and concatenated along tokens (reference multimodal_perceiver.py:137-167
    via perceiver.py:327-367).  The pad channels are constant across
    positions, so their path through LayerNorm + the Q projection is
    analytic; passing the query in this factored form lets ``Attention``
    skip materialising the [B, Tq, C] concat entirely (at multimodal scale
    ~1.7 GB of HBM writes per clip) and run the Q GEMM on the narrow pos
    features only.

    parts: per modality, ``(pos [B, T, C_m], pad [C - C_m])`` in the token
      order of the equivalent concatenated query (sorted modality names).
    ln_scale / ln_bias: the query LayerNorm parameters; filled in by
      ``CrossAttention`` (which owns that LayerNorm) before handing the
      query to ``Attention``.
    """

    parts: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]
    ln_scale: Optional[jnp.ndarray] = None
    ln_bias: Optional[jnp.ndarray] = None

    @property
    def num_tokens(self) -> int:
        return sum(pos.shape[1] for pos, _ in self.parts)

    @property
    def num_channels(self) -> int:
        pos, pad = self.parts[0]
        return pos.shape[-1] + pad.shape[-1]


def _layer_norm(name: str):
    # torch nn.LayerNorm default eps=1e-5; keep normalisation in fp32 with the
    # two-pass variance (a single-pass E[x^2]-E[x]^2 variance costs ~1e-5 of
    # accuracy that compounds through deep residual stacks, and measured
    # NEUTRAL at flow scale -- XLA fuses the two-pass form).
    return nn.LayerNorm(
        epsilon=1e-5, dtype=jnp.float32, use_fast_variance=False, name=name
    )


class _QuantDense(nn.Module):
    """``nn.Dense`` twin that additionally understands ``Policy.quant``.

    Parameter names and shapes match ``nn.Dense`` ("kernel"/"bias") so
    checkpoints and the torch adapter are unaffected.  With ``quant`` unset
    it is exactly a Dense layer; with int8 modes the GEMM routes through the
    int8 MXU path (ops/quant.py) and ``int8_static`` sites carry an ``amax``
    scalar in the "quant_stats" collection, recorded during calibration
    passes (ops.quant.calibrate).
    """

    features: int
    use_bias: bool = True
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    # int8 GEMM mode (Policy.quant): None, "int8_dynamic" (per-token
    # activation scales) or "int8_static" (one calibrated scalar per site,
    # stored in the "quant_stats" collection; applying with
    # mutable=["quant_stats"] records max|x| and runs the EXACT GEMM --
    # that is the calibration pass, see ops.quant.calibrate).  Quantizes
    # from the STORED param dtype, skipping the compute-dtype promotion --
    # fp32 params see only the int8 grid error; params already cast to
    # bf16 (utils.params.cast_variables_for_inference, the bench path)
    # compound the two roundings.  Backward is a straight-through
    # estimator.
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (in_features, self.features),
            self.param_dtype,
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,),
                       self.param_dtype)
            if self.use_bias
            else None
        )
        quant = self.quant
        if quant == "int8_static":
            amax = self.variable(
                "quant_stats", "amax", lambda: jnp.zeros((), jnp.float32)
            )
            if self.is_mutable_collection("quant_stats"):
                # Calibration (or init) pass: record the running max|x| of
                # the EXACT activations and fall through to the exact GEMM.
                amax.value = jnp.maximum(
                    amax.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
                )
                quant = None
        if quant:
            from perceiverio_pytorch_tpu.ops.quant import (
                int8_dynamic_matmul,
                int8_static_matmul,
            )

            out_dtype = self.dtype or x.dtype
            if quant == "int8_static":
                y = int8_static_matmul(
                    x, kernel, amax.value, out_dtype=out_dtype
                )
            else:
                y = int8_dynamic_matmul(x, kernel, out_dtype=out_dtype)
            if bias is not None:
                bias = bias.astype(out_dtype)
                y = y + jnp.reshape(bias, (1,) * (y.ndim - 1) + (-1,))
            return y
        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=self.dtype)
        y = jax.lax.dot_general(
            x, kernel, (((x.ndim - 1,), (0,)), ((), ()))
        )
        if bias is not None:
            y = y + jnp.reshape(bias, (1,) * (y.ndim - 1) + (-1,))
        return y


class Attention(nn.Module):
    """Multi-headed {cross, self}-attention (transformer_primitives.py:18)."""

    q_in_channels: int
    k_in_channels: Optional[int] = None
    v_in_channels: Optional[int] = None
    num_heads: int = 8
    init_scale: float = 1.0
    with_final_bias: bool = True
    final_init_scale_multiplier: float = 1.0
    dropout_prob: float = 0.0
    qk_out_channels: Optional[int] = None
    v_out_channels: Optional[int] = None
    output_channels: Optional[int] = None
    policy: Policy = DEFAULT

    def setup(self):
        qk_out = self.qk_out_channels or self.q_in_channels
        v_out = self.v_out_channels or qk_out
        out = self.output_channels or v_out
        if qk_out % self.num_heads != 0:
            raise ValueError(
                f"qk_out_channels ({qk_out}) must be divisible by"
                f" num_heads ({self.num_heads})."
            )
        if v_out % self.num_heads != 0:
            raise ValueError(
                f"v_channels ({v_out}) must be divisible by"
                f" num_heads ({self.num_heads})."
            )
        self._qk_out = qk_out
        self._v_out = v_out
        self._out = out

        dense_kwargs = dict(
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            bias_init=nn.initializers.zeros,
            quant=quant_mode(self.policy),
        )
        self.proj_q = _QuantDense(
            qk_out, kernel_init=variance_scaling(self.init_scale), **dense_kwargs
        )
        self.proj_k = _QuantDense(
            qk_out, kernel_init=variance_scaling(self.init_scale), **dense_kwargs
        )
        self.proj_v = _QuantDense(
            v_out, kernel_init=variance_scaling(self.init_scale), **dense_kwargs
        )
        self.final = _QuantDense(
            out,
            use_bias=self.with_final_bias,
            kernel_init=variance_scaling(
                self.final_init_scale_multiplier * self.init_scale
            ),
            **dense_kwargs,
        )

    def _project_q_folded(self, fq: "FoldedQuery"):
        """Project a factored decoder query: LayerNorm + proj_q with the
        constant pad channels folded out analytically.

        For a token with channels ``z = [x, p]`` (pos features x, constant
        pad p) the query LayerNorm (eps 1e-5, two-pass variance -- see
        ``_layer_norm``) followed by the Q projection is

            q = LN(z) @ W + b
              = ( (x*g1) @ W1  +  (p*g2) @ W2  -  mu * (g @ W) ) / sigma
                + beta @ W + b

        with per-token scalars mu, sigma computable from x and the
        precomputed pad sums.  Only the first GEMM touches per-token data,
        and it runs on the narrow C_m pos channels instead of the padded
        C -- for the multimodal image modality that is 195 of 1026 channels
        over 97% of the 805k decode tokens.  The [B, Tq, C] padded concat
        is never materialised.

        Policy.quant does NOT apply on this path: the folded Q projection
        stays full precision (the fold's LayerNorm algebra assumes the
        exact GEMM, and quant measured a net LOSS on the multimodal decode
        where the fold is used -- PERFORMANCE.md item 16).
        """
        kernel = self.proj_q.variables["params"]["kernel"]
        bias = self.proj_q.variables["params"]["bias"]
        w32 = kernel.astype(jnp.float32)
        b32 = bias.astype(jnp.float32)
        gamma = fq.ln_scale.astype(jnp.float32)
        beta = fq.ln_bias.astype(jnp.float32)
        total_c = w32.shape[0]
        # Token-independent constants (tiny GEMVs).
        u = gamma @ w32  # [qk_out]
        const = beta @ w32 + b32  # [qk_out]
        eps = 1e-5  # matches _layer_norm
        compute_dtype = self.policy.compute_dtype or fq.parts[0][0].dtype

        outs = []
        for pos, pad in fq.parts:
            cm = pos.shape[-1]
            x32 = pos.astype(jnp.float32)
            p32 = pad.astype(jnp.float32)
            sum_p = jnp.sum(p32)
            sumsq_p = jnp.sum(p32 * p32)
            c2 = float(p32.shape[0])
            mu = (jnp.sum(x32, axis=-1) + sum_p) / total_c  # [B, T]
            # Variance: two-pass over the per-token pos channels (matching
            # use_fast_variance=False where it matters), algebraic for the
            # constant pad half -- sum((p - mu)^2) = sum(p^2) - 2*mu*sum(p)
            # + C2*mu^2 exactly, with only per-token scalars (a broadcast
            # [B, T, C2] reduction here measured 96 GB/s on TPU).
            dx = x32 - mu[..., None]
            pad_ss = sumsq_p - 2.0 * mu * sum_p + c2 * mu * mu
            var = (jnp.sum(dx * dx, axis=-1) + pad_ss) / total_c
            inv_sigma = jax.lax.rsqrt(var + eps)  # [B, T]
            # The one per-token GEMM, on the narrow pos channels, in the
            # compute dtype (the unfolded path also feeds the MXU in
            # compute dtype after the fp32 LayerNorm).
            t1 = (x32 * gamma[:cm]).astype(compute_dtype) @ w32[:cm].astype(
                compute_dtype
            )
            cp = (p32 * gamma[cm:]) @ w32[cm:]  # [qk_out] constant
            q_m = (
                t1.astype(jnp.float32) + cp - mu[..., None] * u
            ) * inv_sigma[..., None] + const
            outs.append(q_m.astype(compute_dtype))
        return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]

    def __call__(
        self,
        inputs_q,
        inputs_k,
        inputs_v,
        *,
        attention_mask=None,
        q_mask=None,
        kv_mask=None,
        attention_bias=None,
        return_matrix: bool = False,
        deterministic: bool = True,
        kv_logical_len: Optional[int] = None,
    ):
        # The reference's Linear(in_features=...) errors on mismatched
        # widths; flax infers them, so enforce the declared contract here
        # (otherwise a misconfiguration silently builds kernels whose shapes
        # no longer match the checkpoint adapter's expectations).
        for name, declared, arr in (
            ("k_in_channels", self.k_in_channels, inputs_k),
            ("v_in_channels", self.v_in_channels, inputs_v),
        ):
            if declared is not None and arr.shape[-1] != declared:
                raise ValueError(
                    f"Attention {name}={declared} but the input has"
                    f" {arr.shape[-1]} channels"
                )
        dropout_rate = 0.0 if deterministic else self.dropout_prob
        dropout_rng = (
            self.make_rng("dropout") if dropout_rate > 0.0 else None
        )
        folded_q = isinstance(inputs_q, FoldedQuery)

        d_qk = self._qk_out // self.num_heads
        d_v = self._v_out // self.num_heads
        if folded_q:
            q = self._project_q_folded(inputs_q)
        else:
            q = self.proj_q(inputs_q)
        k = self.proj_k(inputs_k)
        v = self.proj_v(inputs_v)

        batch, q_time, _ = q.shape
        kv_time = k.shape[1]
        q = q.reshape(batch, q_time, self.num_heads, d_qk)
        k = k.reshape(batch, kv_time, self.num_heads, d_qk)
        v = v.reshape(batch, kv_time, self.num_heads, d_v)

        result = multihead_attention(
            q,
            k,
            v,
            q_mask=q_mask,
            kv_mask=kv_mask,
            attention_mask=attention_mask,
            attention_bias=attention_bias,
            dropout_rate=dropout_rate,
            dropout_rng=dropout_rng,
            softmax_dtype=self.policy.softmax_dtype,
            impl=self.policy.attn_impl,
            flash_min_kv=self.policy.flash_min_kv,
            flash_min_self=self.policy.flash_min_self,
            flash_long_q_min_kv=self.policy.flash_long_q_min_kv,
            return_matrix=return_matrix,
            sp_mesh=self.policy.sp_mesh,
            sp_axis=self.policy.sp_axis,
            sp_min_kv=self.policy.sp_min_kv,
            sp_impl=self.policy.sp_impl,
            interpret=self.policy.interpret,
            kv_logical_len=kv_logical_len,
            backend=self.policy.backend,
            flash_block_q=self.policy.flash_block_q,
            flash_block_k=self.policy.flash_block_k,
        )
        if return_matrix:
            attention_matrix, result = result

        result = self.final(result)
        if return_matrix:
            return attention_matrix, result
        return result


class MLP(nn.Module):
    """Dense -> GELU -> Dense -> Dropout (transformer_primitives.py:183)."""

    in_channels: int
    out_channels: Optional[int] = None
    widening_factor: int = 4
    dropout_prob: float = 0.0
    init_scale: float = 1.0
    policy: Policy = DEFAULT

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        out_channels = self.out_channels or self.in_channels
        # _QuantDense is an nn.Dense twin (same param names/shapes/init)
        # that additionally understands Policy.quant.
        dense_kwargs = dict(
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            kernel_init=variance_scaling(self.init_scale),
            bias_init=nn.initializers.zeros,
            quant=quant_mode(self.policy),
        )
        x = _QuantDense(
            self.widening_factor * self.in_channels, name="fc1", **dense_kwargs
        )(x)
        # torch F.gelu defaults to the exact erf-based form; the performance
        # policy swaps in the tanh approximation (see config.Policy).
        x = jax.nn.gelu(x, approximate=self.policy.gelu_approximate)
        x = _QuantDense(out_channels, name="fc2", **dense_kwargs)(x)
        if self.dropout_prob > 0.0 and not deterministic:
            x = nn.Dropout(rate=self.dropout_prob, deterministic=False)(x)
        return x


class SelfAttention(nn.Module):
    """Pre-LN self-attention block: x + Attn(LN1(x)); x + MLP(LN2(x))."""

    in_channels: int
    widening_factor: int = 4
    dropout_prob: float = 0.0
    dropout_attn_prob: float = 0.0
    num_heads: int = 8
    att_init_scale: float = 1.0
    dense_init_scale: float = 1.0
    qk_channels: Optional[int] = None
    v_channels: Optional[int] = None
    policy: Policy = DEFAULT

    def setup(self):
        qk_channels = self.qk_channels or self.in_channels
        v_channels = self.v_channels or qk_channels
        self.attention = Attention(
            q_in_channels=self.in_channels,
            k_in_channels=self.in_channels,
            v_in_channels=self.in_channels,
            num_heads=self.num_heads,
            init_scale=self.att_init_scale,
            qk_out_channels=qk_channels,
            v_out_channels=v_channels,
            dropout_prob=self.dropout_attn_prob,
            policy=self.policy,
        )
        self.mlp = MLP(
            in_channels=v_channels,
            widening_factor=self.widening_factor,
            dropout_prob=self.dropout_prob,
            init_scale=self.dense_init_scale,
            policy=self.policy,
        )
        self.layer_norm1 = _layer_norm("layer_norm1")
        self.layer_norm2 = _layer_norm("layer_norm2")
        # Post-attention dropout (transformer_primitives.py post-attn drop).
        # Defined here, not inline in __call__: this module uses setup(), so
        # submodules may not be created at call time (flax
        # AssignSubModuleError when dropout_prob > 0 and not deterministic).
        self.post_attn_dropout = nn.Dropout(rate=self.dropout_prob)

    def __call__(
        self,
        inputs,
        *,
        attention_mask=None,
        q_mask=None,
        kv_mask=None,
        attention_bias=None,
        return_matrix: bool = False,
        deterministic: bool = True,
    ):
        compute_dtype = self.policy.compute_dtype or inputs.dtype
        x = inputs
        qkv_inputs = self.layer_norm1(inputs).astype(compute_dtype)
        attention = self.attention(
            qkv_inputs,
            qkv_inputs,
            qkv_inputs,
            attention_mask=attention_mask,
            q_mask=q_mask,
            kv_mask=kv_mask,
            attention_bias=attention_bias,
            return_matrix=return_matrix,
            deterministic=deterministic,
        )
        if return_matrix:
            attention_matrix, attention = attention
        if self.dropout_prob > 0.0 and not deterministic:
            attention = self.post_attn_dropout(attention, deterministic=False)
        x = x + attention
        x = x + self.mlp(
            self.layer_norm2(x).astype(compute_dtype), deterministic=deterministic
        )
        if return_matrix:
            return attention_matrix, x
        return x


class CrossAttention(nn.Module):
    """Cross-attention block with optional query residual."""

    q_in_channels: int
    kv_in_channels: int
    widening_factor: int = 1
    dropout_prob: float = 0.0
    dropout_attn_prob: float = 0.0
    num_heads: int = 8
    attn_init_scale: float = 1.0
    mlp_init_scale: float = 1.0
    shape_for_attn: str = "kv"
    use_query_residual: bool = True
    qk_channels: Optional[int] = None
    v_channels: Optional[int] = None
    policy: Policy = DEFAULT

    def setup(self):
        output_channels = self.q_in_channels
        qk_channels = self.qk_channels
        if qk_channels is None:
            if self.shape_for_attn == "q":
                qk_channels = self.q_in_channels
            elif self.shape_for_attn == "kv":
                qk_channels = self.kv_in_channels
            else:
                raise ValueError(
                    f"Unknown value {self.shape_for_attn} for shape_for_attention."
                )
        v_channels = self.v_channels or qk_channels

        # Cross-attention is a "cross" quant site: under
        # Policy(quant_scope="latent") its projections/MLP keep the exact
        # GEMM (identical param tree either way -- quant has no params).
        sub_policy = self.policy
        if sub_policy.quant is not None and not quant_enabled(
            sub_policy, site="cross"
        ):
            sub_policy = dataclasses.replace(sub_policy, quant=None)

        self.attention = Attention(
            q_in_channels=self.q_in_channels,
            k_in_channels=self.kv_in_channels,
            v_in_channels=self.kv_in_channels,
            num_heads=self.num_heads,
            init_scale=self.attn_init_scale,
            dropout_prob=self.dropout_attn_prob,
            qk_out_channels=qk_channels,
            v_out_channels=v_channels,
            output_channels=output_channels,
            policy=sub_policy,
        )
        self.mlp = MLP(
            in_channels=output_channels,
            widening_factor=self.widening_factor,
            dropout_prob=self.dropout_prob,
            init_scale=self.mlp_init_scale,
            policy=sub_policy,
        )
        self.layer_norm_q = _layer_norm("layer_norm_q")
        self.layer_norm_kv = _layer_norm("layer_norm_kv")
        self.layer_norm2 = _layer_norm("layer_norm2")
        # Defined in setup (not inline in __call__): see SelfAttention.setup.
        self.post_attn_dropout = nn.Dropout(rate=self.dropout_prob)

    def __call__(
        self,
        inputs_q,
        inputs_kv,
        *,
        attention_mask=None,
        q_mask=None,
        kv_mask=None,
        attention_bias=None,
        return_matrix: bool = False,
        deterministic: bool = True,
        kv_logical_len: Optional[int] = None,
    ):
        folded_q = isinstance(inputs_q, FoldedQuery)
        compute_dtype = self.policy.compute_dtype or (
            inputs_q.parts[0][0].dtype if folded_q else inputs_q.dtype
        )
        inputs_kv_norm = self.layer_norm_kv(inputs_kv).astype(compute_dtype)
        if folded_q:
            if self.use_query_residual:
                raise ValueError(
                    "FoldedQuery requires use_query_residual=False (the"
                    " padded query is never materialised)."
                )
            # Hand the query LayerNorm's parameters to Attention, which
            # folds them through the Q projection analytically.
            ln = self.layer_norm_q.variables["params"]
            inputs_q_norm = inputs_q._replace(
                ln_scale=ln["scale"], ln_bias=ln["bias"]
            )
        else:
            inputs_q_norm = self.layer_norm_q(inputs_q).astype(compute_dtype)

        attention = self.attention(
            inputs_q_norm,
            inputs_kv_norm,
            inputs_kv_norm,
            attention_mask=attention_mask,
            q_mask=q_mask,
            kv_mask=kv_mask,
            attention_bias=attention_bias,
            return_matrix=return_matrix,
            deterministic=deterministic,
            kv_logical_len=kv_logical_len,
        )
        if return_matrix:
            attention_matrix, attention = attention
        if self.dropout_prob > 0.0 and not deterministic:
            attention = self.post_attn_dropout(attention, deterministic=False)

        # Omit the residual when query and output semantics differ
        # (e.g. queries are positions, outputs are pixels).
        if self.use_query_residual:
            x = inputs_q + attention
        else:
            x = attention

        x = x + self.mlp(
            self.layer_norm2(x).astype(compute_dtype), deterministic=deterministic
        )
        if return_matrix:
            return attention_matrix, x
        return x
