"""Pallas flash attention kernel vs the XLA reference path.

Runs in interpreter mode on CPU (the 'sanitizer' equivalent for kernels);
the same kernel compiles via Mosaic on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceiverio_pytorch_tpu.ops.attention_xla import attend_xla, make_cross_attention_mask
from perceiverio_pytorch_tpu.ops.pallas.flash_attention import flash_attention


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), jnp.float32)


@pytest.mark.parametrize(
    "tq,tk,h,dqk,dv",
    [
        (8, 1024, 1, 128, 128),  # aligned, single head
        (16, 700, 2, 64, 64),  # unaligned KV -> padding + implicit mask
        (200, 300, 1, 322, 322),  # flow-style odd head dims
        (128, 256, 4, 32, 96),  # dv != dqk (MLM-style)
    ],
)
def test_flash_matches_xla(tq, tk, h, dqk, dv):
    q = _rand((2, tq, h, dqk), 0)
    k = _rand((2, tk, h, dqk), 1)
    v = _rand((2, tk, h, dv), 2)
    expected = np.asarray(attend_xla(q, k, v))
    got = np.asarray(
        jax.jit(
            lambda q, k, v: flash_attention(
                q, k, v, block_q=128, block_k=128, interpret=True
            )
        )(q, k, v)
    )
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)


def test_flash_kv_mask_and_wipe():
    q = _rand((2, 16, 2, 64), 3)
    k = _rand((2, 300, 2, 64), 4)
    v = _rand((2, 300, 2, 64), 5)
    rng = np.random.RandomState(6)
    kv_mask = jnp.asarray(rng.rand(2, 300) > 0.3)
    q_mask = jnp.asarray(rng.rand(2, 16) > 0.3)

    expected = np.asarray(
        attend_xla(
            q, k, v, attention_mask=make_cross_attention_mask(q_mask, kv_mask)
        )
    )
    got = np.asarray(
        jax.jit(
            lambda q, k, v, km, qm: flash_attention(
                q, k, v, kv_mask=km, q_mask=qm,
                block_q=128, block_k=128, interpret=True,
            )
        )(q, k, v, kv_mask, q_mask)
    )
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)
    # invalid query rows wiped to exact zero
    wiped = ~np.asarray(q_mask)
    assert np.all(got[wiped] == 0.0)


def test_flash_all_keys_masked_rows_zero():
    q = _rand((1, 8, 1, 64), 7)
    k = _rand((1, 128, 1, 64), 8)
    v = _rand((1, 128, 1, 64), 9)
    kv_mask = jnp.zeros((1, 128), bool)
    got = np.asarray(
        flash_attention(q, k, v, kv_mask=kv_mask, interpret=True)
    )
    assert np.all(got == 0.0)


def test_flash_gradients_match_xla():
    q = _rand((1, 16, 2, 32), 10)
    k = _rand((1, 64, 2, 32), 11)
    v = _rand((1, 64, 2, 32), 12)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, interpret=True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(attend_xla(q, k, v) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), rtol=1e-4, atol=1e-4)


def test_flash_gradients_with_masks_match_xla():
    rng = np.random.RandomState(20)
    q = _rand((2, 24, 2, 32), 20)
    k = _rand((2, 70, 2, 32), 21)
    v = _rand((2, 70, 2, 32), 22)
    kv_mask = jnp.asarray(rng.rand(2, 70) > 0.3)
    q_mask = jnp.asarray(rng.rand(2, 24) > 0.3)

    from perceiverio_pytorch_tpu.ops.attention_xla import make_cross_attention_mask

    def loss_flash(q, k, v):
        out = flash_attention(
            q, k, v, kv_mask=kv_mask, q_mask=q_mask,
            block_q=16, block_k=32, interpret=True,
        )
        return jnp.sum(out ** 2)

    def loss_xla(q, k, v):
        out = attend_xla(
            q, k, v, attention_mask=make_cross_attention_mask(q_mask, kv_mask)
        )
        return jnp.sum(out ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx in zip(g_flash, g_xla):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), rtol=1e-4, atol=1e-4
        )


def test_flash_gradients_ragged_q_chunking():
    """q_len not a multiple of the backward chunk size."""
    q = _rand((1, 37, 1, 64), 30)
    k = _rand((1, 120, 1, 64), 31)
    v = _rand((1, 120, 1, 64), 32)

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, block_q=16, block_k=64, interpret=True) ** 2
        )

    def loss_xla(q, k, v):
        return jnp.sum(attend_xla(q, k, v) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx in zip(g_flash, g_xla):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), rtol=1e-4, atol=1e-4
        )


def test_chunked_backward_fallback_matches_pallas():
    q = _rand((1, 24, 2, 32), 40)
    k = _rand((1, 80, 2, 32), 41)
    v = _rand((1, 80, 2, 32), 42)

    def loss(pallas_backward):
        def f(q, k, v):
            return jnp.sum(
                flash_attention(
                    q, k, v, block_q=16, block_k=32, interpret=True,
                    pallas_backward=pallas_backward,
                ) ** 2
            )
        return f

    g_pallas = jax.grad(loss(True), argnums=(0, 1, 2))(q, k, v)
    g_chunked = jax.grad(loss(False), argnums=(0, 1, 2))(q, k, v)
    for gp, gc in zip(g_pallas, g_chunked):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gc), rtol=1e-5, atol=1e-5
        )


def test_flash_randomized_property_sweep():
    """Seeded random configs (shapes, block sizes, masks) — forward AND
    gradients vs XLA.  Catches block-edge/padding bugs the fixed shapes
    miss: every config has at least one axis that is not a multiple of its
    block, plus random ragged mask lengths."""
    rng = np.random.RandomState(1234)
    for trial in range(8):
        b = int(rng.randint(1, 3))
        h = int(rng.choice([1, 2, 3]))
        tq = int(rng.randint(2, 300))
        tk = int(rng.randint(2, 600))
        dqk = int(rng.choice([8, 17, 64, 130]))
        dv = int(rng.choice([8, 33, 64]))
        block_q = int(rng.choice([16, 64, 128]))
        block_k = int(rng.choice([32, 128, 256]))
        q = jnp.asarray(rng.randn(b, tq, h, dqk), jnp.float32)
        k = jnp.asarray(rng.randn(b, tk, h, dqk), jnp.float32)
        v = jnp.asarray(rng.randn(b, tk, h, dv), jnp.float32)
        # ragged kv-validity mask (always >= 1 valid key per row)
        kv_len = rng.randint(1, tk + 1, size=(b,))
        kv_mask = jnp.asarray(
            np.arange(tk)[None, :] < kv_len[:, None]
        )

        def xla_loss(q, k, v):
            out = attend_xla(
                q, k, v,
                attention_mask=make_cross_attention_mask(
                    jnp.ones((b, tq), bool), kv_mask
                ),
            )
            return jnp.sum(out * jnp.cos(out)), out

        def flash_loss(q, k, v):
            out = flash_attention(
                q, k, v, kv_mask=kv_mask,
                block_q=block_q, block_k=block_k, interpret=True,
            )
            return jnp.sum(out * jnp.cos(out)), out

        tag = f"trial {trial}: b{b} h{h} tq{tq} tk{tk} d{dqk}/{dv} blk{block_q}/{block_k}"
        (l_ref, out_ref), g_ref = jax.jit(
            jax.value_and_grad(xla_loss, argnums=(0, 1, 2), has_aux=True)
        )(q, k, v)
        (l_got, out_got), g_got = jax.jit(
            jax.value_and_grad(flash_loss, argnums=(0, 1, 2), has_aux=True)
        )(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out_got), np.asarray(out_ref), rtol=3e-5, atol=3e-5,
            err_msg=tag,
        )
        for name, a, e in zip("qkv", g_got, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(e), rtol=3e-4, atol=3e-5,
                err_msg=f"{tag} d{name}",
            )
