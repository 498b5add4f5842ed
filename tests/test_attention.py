"""Attention numerics vs a NumPy oracle and the reference semantics
(/root/reference/perceiver_io/transformer_primitives.py:117-180)."""

import jax
import jax.numpy as jnp
import numpy as np

from perceiverio_pytorch_tpu.core.attention import Attention, CrossAttention, MLP, SelfAttention
from perceiverio_pytorch_tpu.ops.attention_xla import attend_xla, make_cross_attention_mask


def _numpy_attention(q, k, v, mask=None):
    """Oracle with reference semantics: post-matmul scale, -1e30 fill, wipe."""
    b, tq, h, d = q.shape
    dv = v.shape[-1]
    att = np.einsum("bthd,bshd->bhts", q, k)
    att = att / np.sqrt(d)
    if mask is not None:
        att = np.where(mask[:, None], att, -1e30)
    att = att - att.max(-1, keepdims=True)
    e = np.exp(att)
    p = e / e.sum(-1, keepdims=True)
    out = np.einsum("bhts,bshd->bthd", p, v).reshape(b, tq, h * dv)
    if mask is not None:
        wipe = np.all(mask == 0, axis=2, keepdims=True)
        out = np.where(wipe, 0.0, out)
    return out


def test_attend_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    q = rng.randn(2, 5, 4, 8).astype(np.float32)
    k = rng.randn(2, 7, 4, 8).astype(np.float32)
    v = rng.randn(2, 7, 4, 6).astype(np.float32)
    out = np.asarray(attend_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(out, _numpy_attention(q, k, v), rtol=1e-5, atol=1e-5)


def test_attend_masked_and_wiped():
    rng = np.random.RandomState(1)
    q = rng.randn(2, 4, 2, 8).astype(np.float32)
    k = rng.randn(2, 6, 2, 8).astype(np.float32)
    v = rng.randn(2, 6, 2, 8).astype(np.float32)
    mask = rng.rand(2, 4, 6) > 0.4
    mask[0, 1, :] = False  # fully masked row -> must be wiped to exact zero
    out = np.asarray(
        attend_xla(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            attention_mask=jnp.asarray(mask),
        )
    )
    expected = _numpy_attention(q, k, v, mask)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)
    assert np.all(out[0, 1] == 0.0)


def test_factored_mask_equals_outer_product():
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(2, 4, 2, 8), jnp.float32)
    k = jnp.asarray(rng.randn(2, 6, 2, 8), jnp.float32)
    v = jnp.asarray(rng.randn(2, 6, 2, 8), jnp.float32)
    q_mask = jnp.asarray(rng.rand(2, 4) > 0.3)
    kv_mask = jnp.asarray(rng.rand(2, 6) > 0.3)

    from perceiverio_pytorch_tpu.ops.attention import multihead_attention

    full = multihead_attention(
        q, k, v, attention_mask=make_cross_attention_mask(q_mask, kv_mask),
        impl="xla",
    )
    factored = multihead_attention(q, k, v, q_mask=q_mask, kv_mask=kv_mask, impl="xla")
    np.testing.assert_allclose(np.asarray(full), np.asarray(factored), rtol=1e-6)


def test_make_cross_attention_mask():
    qm = jnp.asarray([[1, 0, 1]], bool)
    km = jnp.asarray([[1, 1, 0, 0]], bool)
    m = np.asarray(make_cross_attention_mask(qm, km))
    assert m.shape == (1, 3, 4)
    assert m[0, 0].tolist() == [True, True, False, False]
    assert m[0, 1].tolist() == [False, False, False, False]


def test_attention_module_channel_knobs():
    """Independently sizable qk/v/output channels."""
    attn = Attention(
        q_in_channels=16, k_in_channels=12, v_in_channels=12,
        num_heads=2, qk_out_channels=8, v_out_channels=10, output_channels=20,
    )
    xq = jnp.ones((2, 5, 16))
    xk = jnp.ones((2, 7, 12))
    params = attn.init(jax.random.PRNGKey(0), xq, xk, xk)
    out = attn.apply(params, xq, xk, xk)
    assert out.shape == (2, 5, 20)


def test_self_attention_residual_structure():
    block = SelfAttention(in_channels=16, num_heads=2, widening_factor=2)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 6, 16), jnp.float32)
    params = block.init(jax.random.PRNGKey(0), x)
    out = block.apply(params, x)
    assert out.shape == x.shape


def test_cross_attention_query_residual_flag():
    x_q = jnp.asarray(np.random.RandomState(0).randn(2, 4, 8), jnp.float32)
    x_kv = jnp.asarray(np.random.RandomState(1).randn(2, 9, 12), jnp.float32)
    with_res = CrossAttention(q_in_channels=8, kv_in_channels=12, num_heads=2, use_query_residual=True)
    no_res = CrossAttention(q_in_channels=8, kv_in_channels=12, num_heads=2, use_query_residual=False)
    p1 = with_res.init(jax.random.PRNGKey(0), x_q, x_kv)
    o1 = with_res.apply(p1, x_q, x_kv)
    o2 = no_res.apply(p1, x_q, x_kv)
    assert o1.shape == o2.shape == (2, 4, 8)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_mlp_exact_gelu():
    """GELU must be the exact erf form (torch F.gelu default)."""
    mlp = MLP(in_channels=4, widening_factor=1)
    x = jnp.asarray([[[-1.0, 0.5, 2.0, -3.0]]])
    params = {
        "params": {
            "fc1": {"kernel": jnp.eye(4), "bias": jnp.zeros(4)},
            "fc2": {"kernel": jnp.eye(4), "bias": jnp.zeros(4)},
        }
    }
    out = np.asarray(mlp.apply(params, x))[0, 0]
    from scipy.stats import norm

    expected = np.asarray([-1.0, 0.5, 2.0, -3.0])
    expected = expected * norm.cdf(expected)
    np.testing.assert_allclose(out, expected, rtol=1e-6, atol=1e-6)


def test_auto_dispatch_is_device_correct(monkeypatch):
    """`auto` must not pick the Mosaic kernel for a CPU-bound trace even when
    the PROCESS default backend is TPU (regression: VERDICT r2 item 5)."""
    from perceiverio_pytorch_tpu.ops.attention import (
        attention_path,
        multihead_attention,
    )

    flash_shape = dict(q_len=2048, kv_len=16384)

    # Simulate a TPU-default process: the process backend says "tpu", but
    # the jax_default_device config (what jax.default_device(...) sets)
    # points at a CPU device -- the trace will compile for CPU.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert attention_path("auto", **flash_shape) == "flash"
    with jax.default_device(jax.devices("cpu")[0]):
        assert attention_path("auto", **flash_shape) == "xla"
        # And the full call actually executes on CPU (would fail to compile
        # if the Mosaic kernel were still selected).
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(1, 256, 1, 8), jnp.float32)
        kv = jnp.asarray(rng.randn(1, 16384, 1, 8), jnp.float32)
        out = multihead_attention(q, kv, kv, impl="auto")
        assert np.isfinite(np.asarray(out)).all()
    # jax.default_device also accepts a bare platform STRING (JAX >= 0.4.27)
    # and the config then holds the string, not a Device.
    with jax.default_device("cpu"):
        assert attention_path("auto", **flash_shape) == "xla"
    # An explicit Policy.backend overrides everything.
    assert attention_path("auto", backend="cpu", **flash_shape) == "xla"
    assert attention_path("auto", backend="tpu", **flash_shape) == "flash"


def test_rank3_mask_combines_with_factored_masks():
    """A caller-supplied rank-3 attention_mask must AND with q_mask/kv_mask
    and with the kv_mask synthesized from kv_logical_len (alignment pad
    keys must not receive softmax weight on the XLA fallback path)."""
    from perceiverio_pytorch_tpu.ops.attention import multihead_attention

    rng = np.random.RandomState(0)
    b, tq, tk, h, d = 2, 4, 16, 2, 8
    logical = 11  # keys [11:16) are alignment padding
    q = jnp.asarray(rng.randn(b, tq, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, tk, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, tk, h, d), jnp.float32)
    rank3 = jnp.asarray(rng.rand(b, tq, tk) > 0.3)
    # reference: truncate to the logical keys and apply the same rank-3 mask
    want = attend_xla(
        q, k[:, :logical], v[:, :logical], attention_mask=rank3[:, :, :logical]
    )
    got = multihead_attention(
        q, k, v, attention_mask=rank3, kv_logical_len=logical, impl="xla"
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )

    # q_mask also still wipes rows when a rank-3 mask is present
    q_mask = jnp.asarray([[True, False, True, True], [True] * 4])
    got2 = multihead_attention(
        q, k, v, attention_mask=rank3, q_mask=q_mask,
        kv_logical_len=logical, impl="xla",
    )
    np.testing.assert_array_equal(np.asarray(got2[0, 1]), 0.0)


def test_attention_in_channel_declarations_enforced():
    """Declared k/v input widths error on mismatch (reference Linear
    semantics) instead of silently building differently-shaped kernels."""
    import pytest

    att = Attention(q_in_channels=8, k_in_channels=8, v_in_channels=8)
    q = jnp.zeros((1, 3, 8))
    bad = jnp.zeros((1, 5, 12))
    with pytest.raises(ValueError, match="k_in_channels"):
        jax.eval_shape(
            lambda: att.init(jax.random.PRNGKey(0), q, bad, bad)
        )


def test_block_dropout_training_pass():
    """Regression: SelfAttention/CrossAttention with dropout_prob > 0 must
    run a non-deterministic pass (both use setup(), so the post-attention
    dropout must be a setup-defined submodule -- creating it inline in
    __call__ raised AssignSubModuleError). The reference trains with these
    probs live (transformer_primitives.py dropout args)."""
    import pytest

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 6, 16), jnp.float32)
    kv = jnp.asarray(rng.randn(2, 9, 12), jnp.float32)

    sa = SelfAttention(
        in_channels=16, num_heads=2, dropout_prob=0.5, dropout_attn_prob=0.5
    )
    params = jax.jit(sa.init)(jax.random.PRNGKey(0), x)
    det = sa.apply(params, x, deterministic=True)
    d1, d2 = (
        sa.apply(
            params, x, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(k)},
        )
        for k in (1, 2)
    )
    assert not np.allclose(d1, det)  # dropout actually engaged
    assert not np.allclose(d1, d2)  # and is rng-driven

    ca = CrossAttention(
        q_in_channels=16, kv_in_channels=12, num_heads=2,
        dropout_prob=0.5, dropout_attn_prob=0.5,
    )
    cparams = jax.jit(ca.init)(jax.random.PRNGKey(0), x, kv)
    cdet = ca.apply(cparams, x, kv, deterministic=True)
    c1 = ca.apply(
        cparams, x, kv, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert not np.allclose(c1, cdet)

    # dropout adds no params: checkpoint compatibility is untouched
    sa0 = SelfAttention(in_channels=16, num_heads=2)
    params0 = jax.jit(sa0.init)(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(params0) == jax.tree.structure(params)
