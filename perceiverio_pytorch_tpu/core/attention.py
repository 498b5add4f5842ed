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

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from perceiverio_pytorch_tpu.config import DEFAULT, Policy
from perceiverio_pytorch_tpu.ops.attention import multihead_attention
from perceiverio_pytorch_tpu.ops.attention_xla import make_cross_attention_mask
from perceiverio_pytorch_tpu.utils.initializers import variance_scaling

__all__ = [
    "Attention",
    "MLP",
    "SelfAttention",
    "CrossAttention",
    "make_cross_attention_mask",
]


def _layer_norm(name: str):
    # torch nn.LayerNorm default eps=1e-5; keep normalisation in fp32 with the
    # two-pass variance (fast E[x^2]-E[x]^2 variance costs ~1e-5 of accuracy
    # that compounds through deep residual stacks).
    return nn.LayerNorm(
        epsilon=1e-5, dtype=jnp.float32, use_fast_variance=False, name=name
    )


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
        )
        self.proj_q = nn.Dense(
            qk_out, kernel_init=variance_scaling(self.init_scale), **dense_kwargs
        )
        self.proj_k = nn.Dense(
            qk_out, kernel_init=variance_scaling(self.init_scale), **dense_kwargs
        )
        self.proj_v = nn.Dense(
            v_out, kernel_init=variance_scaling(self.init_scale), **dense_kwargs
        )
        self.final = nn.Dense(
            out,
            use_bias=self.with_final_bias,
            kernel_init=variance_scaling(
                self.final_init_scale_multiplier * self.init_scale
            ),
            **dense_kwargs,
        )

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
    ):
        q = self.proj_q(inputs_q)
        k = self.proj_k(inputs_k)
        v = self.proj_v(inputs_v)

        batch, q_time, _ = q.shape
        kv_time = k.shape[1]
        q = q.reshape(batch, q_time, self.num_heads, self._qk_out // self.num_heads)
        k = k.reshape(batch, kv_time, self.num_heads, self._qk_out // self.num_heads)
        v = v.reshape(batch, kv_time, self.num_heads, self._v_out // self.num_heads)

        dropout_rate = 0.0 if deterministic else self.dropout_prob
        dropout_rng = (
            self.make_rng("dropout") if dropout_rate > 0.0 else None
        )

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
            return_matrix=return_matrix,
            sp_mesh=self.policy.sp_mesh,
            sp_axis=self.policy.sp_axis,
            sp_min_kv=self.policy.sp_min_kv,
            sp_impl=self.policy.sp_impl,
            interpret=self.policy.interpret,
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
        dense_kwargs = dict(
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            kernel_init=variance_scaling(self.init_scale),
            bias_init=nn.initializers.zeros,
        )
        x = nn.Dense(self.widening_factor * self.in_channels, name="fc1", **dense_kwargs)(x)
        # torch F.gelu defaults to the exact erf-based form; the performance
        # policy swaps in the tanh approximation (see config.Policy).
        x = jax.nn.gelu(x, approximate=self.policy.gelu_approximate)
        x = nn.Dense(out_channels, name="fc2", **dense_kwargs)(x)
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
            attention = nn.Dropout(rate=self.dropout_prob, deterministic=False)(
                attention
            )
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
            policy=self.policy,
        )
        self.mlp = MLP(
            in_channels=output_channels,
            widening_factor=self.widening_factor,
            dropout_prob=self.dropout_prob,
            init_scale=self.mlp_init_scale,
            policy=self.policy,
        )
        self.layer_norm_q = _layer_norm("layer_norm_q")
        self.layer_norm_kv = _layer_norm("layer_norm_kv")
        self.layer_norm2 = _layer_norm("layer_norm2")

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
    ):
        compute_dtype = self.policy.compute_dtype or inputs_q.dtype
        inputs_kv_norm = self.layer_norm_kv(inputs_kv).astype(compute_dtype)
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
        )
        if return_matrix:
            attention_matrix, attention = attention
        if self.dropout_prob > 0.0 and not deterministic:
            attention = nn.Dropout(rate=self.dropout_prob, deterministic=False)(
                attention
            )

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
