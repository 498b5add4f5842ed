"""Policy.layer_scan: distinct-layer stacks scanned with stacked params.

The unrolled path traces one self-attention body per distinct layer (flow:
24, MLM: 26 -- /root/reference/perceiver_io/flow_perceiver.py:34-42,
language_perceiver.py:24-31), which costs minutes of XLA compile at full
scale.  The scanned path stacks the per-layer param subtrees on a leading
axis at apply time and runs ONE lax.scan -- checkpoint layout unchanged,
numerically exact, differentiable.  These tests pin all of that on CPU.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from perceiverio_pytorch_tpu import Policy
from perceiverio_pytorch_tpu.core.perceiver import PerceiverEncoder

PARITY = Policy(compute_dtype=jnp.float32, attn_impl="xla")


def _encoder(policy, *, num_self_attends=4, num_blocks=1, dropout_prob=0.0,
             remat=False):
    return PerceiverEncoder(
        num_input_channels=16,
        num_self_attends_per_block=num_self_attends,
        num_blocks=num_blocks,
        num_latents=8,
        num_latent_channels=32,
        num_self_attend_heads=4,
        num_cross_attend_heads=1,
        dropout_prob=dropout_prob,
        policy=policy,
        remat=remat,
    )


def _data(batch=2):
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randn(batch, 6, 16), jnp.float32)
    latents = jnp.asarray(rng.randn(batch, 8, 32), jnp.float32)
    return tokens, latents


def test_layer_scan_forward_exact_vs_unrolled():
    on = dataclasses.replace(PARITY, layer_scan="on")
    off = dataclasses.replace(PARITY, layer_scan="off")
    tokens, latents = _data()
    params = jax.jit(_encoder(off).init)(jax.random.PRNGKey(0), tokens, latents)
    out_off = jax.jit(_encoder(off).apply)(params, tokens, latents)
    out_on = jax.jit(_encoder(on).apply)(params, tokens, latents)
    np.testing.assert_allclose(
        np.asarray(out_on), np.asarray(out_off), rtol=1e-6, atol=1e-7
    )


def test_layer_scan_gradients_match_unrolled():
    on = dataclasses.replace(PARITY, layer_scan="on")
    off = dataclasses.replace(PARITY, layer_scan="off")
    tokens, latents = _data()
    params = jax.jit(_encoder(off).init)(jax.random.PRNGKey(0), tokens, latents)

    def loss(policy):
        model = _encoder(policy)
        return lambda p: jnp.mean(model.apply(p, tokens, latents) ** 2)

    g_off = jax.jit(jax.grad(loss(off)))(params)
    g_on = jax.jit(jax.grad(loss(on)))(params)
    for path_off, path_on in zip(
        jax.tree_util.tree_leaves_with_path(g_off),
        jax.tree_util.tree_leaves_with_path(g_on),
    ):
        np.testing.assert_allclose(
            np.asarray(path_on[1]), np.asarray(path_off[1]),
            rtol=2e-5, atol=1e-7, err_msg=str(path_off[0]),
        )


def test_layer_scan_weight_shared_blocks():
    """num_blocks > 1: the block-level nn.scan composes with the layer scan."""
    on = dataclasses.replace(PARITY, layer_scan="on")
    off = dataclasses.replace(PARITY, layer_scan="off")
    tokens, latents = _data()
    model_off = _encoder(off, num_self_attends=3, num_blocks=3)
    model_on = _encoder(on, num_self_attends=3, num_blocks=3)
    params = jax.jit(model_off.init)(jax.random.PRNGKey(0), tokens, latents)
    np.testing.assert_allclose(
        np.asarray(jax.jit(model_on.apply)(params, tokens, latents)),
        np.asarray(jax.jit(model_off.apply)(params, tokens, latents)),
        rtol=1e-6, atol=1e-7,
    )


def test_layer_scan_composes_with_remat():
    on = dataclasses.replace(PARITY, layer_scan="on")
    off = dataclasses.replace(PARITY, layer_scan="off")
    tokens, latents = _data()
    model_off = _encoder(off)
    model_on = _encoder(on, remat=True)
    params = jax.jit(model_off.init)(jax.random.PRNGKey(0), tokens, latents)

    def loss(model):
        return lambda p: jnp.mean(model.apply(p, tokens, latents) ** 2)

    v_off, g_off = jax.jit(jax.value_and_grad(loss(model_off)))(params)
    v_on, g_on = jax.jit(jax.value_and_grad(loss(model_on)))(params)
    np.testing.assert_allclose(float(v_on), float(v_off), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(g_on)[0]),
        np.asarray(jax.tree.leaves(g_off)[0]), rtol=2e-5, atol=1e-7,
    )


def test_layer_scan_auto_threshold():
    """'auto' engages at layer_scan_min distinct layers, not below."""
    from perceiverio_pytorch_tpu.core.perceiver import _SelfAttendStack

    def stack(n, policy):
        return _SelfAttendStack(
            num_self_attends=n, in_channels=32, num_heads=4,
            qk_channels=None, v_channels=None, widening_factor=1,
            dropout_prob=0.0, policy=policy,
        )

    latents = jnp.asarray(np.random.RandomState(0).randn(2, 8, 32), jnp.float32)
    pol = dataclasses.replace(PARITY, layer_scan="auto", layer_scan_min=3)
    below = stack(2, pol)
    at = stack(3, pol)
    p_below = jax.jit(below.init)(jax.random.PRNGKey(0), latents)
    p_at = jax.jit(at.init)(jax.random.PRNGKey(0), latents)

    traced = {}

    def probe(model, params, key):
        def f(p, x):
            bound = model.bind(p)
            traced[key] = bound._use_layer_scan()
            return bound(x)[0]

        jax.eval_shape(f, params, latents)

    probe(below, p_below, "below")
    probe(at, p_at, "at")
    assert traced == {"below": False, "at": True}


def test_layer_scan_invalid_value_raises():
    tokens, latents = _data()
    bad = dataclasses.replace(PARITY, layer_scan="maybe")
    model = _encoder(bad)
    params = jax.jit(
        _encoder(dataclasses.replace(PARITY, layer_scan="off")).init
    )(jax.random.PRNGKey(0), tokens, latents)
    with pytest.raises(ValueError, match="layer_scan"):
        jax.eval_shape(model.apply, params, tokens, latents)


def test_layer_scan_dropout_reproducible_and_per_layer_independent():
    on = dataclasses.replace(PARITY, layer_scan="on")
    tokens, latents = _data()
    model = _encoder(on, dropout_prob=0.5)
    params = jax.jit(
        _encoder(dataclasses.replace(PARITY, layer_scan="off"),
                 dropout_prob=0.5).init
    )(jax.random.PRNGKey(0), tokens, latents)

    def run(key):
        return model.apply(
            params, tokens, latents, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(key)},
        )

    a1 = np.asarray(jax.jit(run)(1))
    a1b = np.asarray(jax.jit(run)(1))
    a2 = np.asarray(jax.jit(run)(2))
    np.testing.assert_array_equal(a1, a1b)  # same key -> same masks
    assert np.abs(a1 - a2).max() > 1e-4     # different key -> different masks
    # and the deterministic pass is unaffected by the dropout machinery
    det = np.asarray(jax.jit(model.apply)(params, tokens, latents))
    base = np.asarray(
        jax.jit(_encoder(dataclasses.replace(PARITY, layer_scan="off"),
                         dropout_prob=0.5).apply)(params, tokens, latents)
    )
    np.testing.assert_allclose(det, base, rtol=1e-6, atol=1e-7)


def test_layer_scan_int8_static_calibrate_then_apply():
    """Calibration runs unrolled (mutable quant_stats); the quantized apply
    then scans with the stats stacked read-only -- same outputs either way."""
    from perceiverio_pytorch_tpu.ops.quant import calibrate

    tokens, latents = _data()
    for scan_mode in ("on", "off"):
        pol = dataclasses.replace(
            PARITY, quant="int8_static", layer_scan=scan_mode
        )
        model = _encoder(pol)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), tokens, latents)
        variables = calibrate(model, variables, [(tokens, latents)])
        out = np.asarray(jax.jit(model.apply)(variables, tokens, latents))
        if scan_mode == "on":
            out_on = out
        else:
            np.testing.assert_allclose(out_on, out, rtol=1e-6, atol=1e-7)


def test_layer_scan_language_model_end_to_end():
    """Small LanguagePerceiver (the MLM stack shape) forward + grad parity."""
    from perceiverio_pytorch_tpu.models import LanguagePerceiver

    def small(policy):
        return LanguagePerceiver(
            vocab_size=262, max_seq_len=32, embed_dim=16,
            num_self_attends_per_block=4, num_blocks=1, num_latents=8,
            num_latent_channels=32, policy=policy,
        )

    on = dataclasses.replace(PARITY, layer_scan="on")
    off = dataclasses.replace(PARITY, layer_scan="off")
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, 262, (2, 32)), jnp.int32)
    mask = jnp.ones((2, 32), bool)
    params = jax.jit(small(off).init)(jax.random.PRNGKey(0), tokens, mask)
    np.testing.assert_allclose(
        np.asarray(jax.jit(small(on).apply)(params, tokens, mask)),
        np.asarray(jax.jit(small(off).apply)(params, tokens, mask)),
        rtol=1e-6, atol=1e-6,
    )
