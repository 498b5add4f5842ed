"""Dynamic int8 inference path (ops/quant.py + Policy.quant)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceiverio_pytorch_tpu import PARITY
from perceiverio_pytorch_tpu.config import quant_enabled
from perceiverio_pytorch_tpu.ops.quant import int8_dynamic_matmul


def test_int8_matmul_exact_on_grid_values():
    """Inputs already on the int8 grid (max |.| = 127, integer values)
    quantize losslessly: the result equals the exact matmul."""
    rng = np.random.RandomState(0)
    x = rng.randint(-127, 128, (2, 8, 32)).astype(np.float32)
    x[..., 0] = 127  # pin the scale to exactly 1
    w = rng.randint(-127, 128, (32, 16)).astype(np.float32)
    w[0, :] = 127
    got = int8_dynamic_matmul(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_array_equal(np.asarray(got), x @ w)


def test_int8_matmul_relative_error_bound():
    rng = np.random.RandomState(1)
    x = rng.randn(4, 64, 128).astype(np.float32)
    w = (rng.randn(128, 96) * 0.05).astype(np.float32)
    got = np.asarray(int8_dynamic_matmul(jnp.asarray(x), jnp.asarray(w)))
    want = x @ w
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.02, rel
    # zero rows / zero columns don't divide by zero
    z = int8_dynamic_matmul(jnp.zeros((3, 128)), jnp.asarray(w))
    np.testing.assert_array_equal(np.asarray(z), 0.0)


def test_int8_matmul_straight_through_gradients():
    """Differentiating through the quant GEMM yields the EXACT matmul's
    gradients (straight-through estimator) — training with the quant
    policy behaves like QAT instead of silently zeroing kernel grads."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 32), jnp.float32)
    w = jnp.asarray(rng.randn(32, 16) * 0.1, jnp.float32)

    def loss_q(x, w):
        return jnp.sum(jnp.sin(int8_dynamic_matmul(x, w)))

    def loss_exact(x, w):
        return jnp.sum(jnp.sin(x @ w))

    gx_q, gw_q = jax.grad(loss_q, argnums=(0, 1))(x, w)
    gx_e, gw_e = jax.grad(loss_exact, argnums=(0, 1))(x, w)
    assert float(jnp.abs(gw_q).max()) > 0.0  # not round()-zeroed
    # STE grads match the exact ones up to the forward's quant error
    # propagating through sin' (cos of slightly different points)
    np.testing.assert_allclose(np.asarray(gx_q), np.asarray(gx_e), atol=0.15)
    np.testing.assert_allclose(np.asarray(gw_q), np.asarray(gw_e), atol=0.15)


def test_quant_policy_validation():
    assert quant_enabled(PARITY) is False
    assert quant_enabled(dataclasses.replace(PARITY, quant="int8_dynamic"))
    with pytest.raises(ValueError, match="int8_dynamic"):
        quant_enabled(dataclasses.replace(PARITY, quant="int4"))


def test_qat_training_through_quant_policy_converges():
    """A full Trainer run with the quant policy learns (STE end to end):
    loss drops and the quantized kernels actually move."""
    import optax

    from perceiverio_pytorch_tpu.models import ClassificationPerceiver, PrepType
    from perceiverio_pytorch_tpu.training import Trainer, classification_cross_entropy

    qpolicy = dataclasses.replace(PARITY, quant="int8_dynamic")
    model = ClassificationPerceiver(
        num_classes=4, img_size=(16, 16), num_self_attends_per_block=1,
        num_blocks=1, num_latents=4, num_latent_channels=32,
        prep_type=PrepType.FOURIER_POS_PIXEL, policy=qpolicy,
    )
    rng = np.random.RandomState(0)
    imgs = rng.randn(16, 3, 16, 16).astype(np.float32)
    labels = rng.randint(0, 4, (16,))
    # learnable signal: the label is stamped into a corner patch
    for i, l in enumerate(labels):
        imgs[i, :, :4, :4] = l - 1.5

    def loss_fn(params, x, y):
        return classification_cross_entropy(model.apply(params, x), y)

    t = Trainer(loss_fn, optax.adam(3e-3), log_every=1000)
    state = t.init_state(
        jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(imgs))
    )
    l0 = float(jax.jit(loss_fn)(state.params, jnp.asarray(imgs), jnp.asarray(labels)))
    state = t.fit(
        state, iter([(imgs, labels)] * 100), num_steps=100
    )
    l1 = float(jax.jit(loss_fn)(state.params, jnp.asarray(imgs), jnp.asarray(labels)))
    assert l1 < 0.7 * l0, (l0, l1)


def test_quantized_classifier_close_to_exact():
    """Policy(quant='int8_dynamic') through a full tiny classifier: logits
    stay within a few percent of the exact fp32 model (all 4+2 projections
    and both MLP GEMMs per block run on the int8 path)."""
    from perceiverio_pytorch_tpu.models import ClassificationPerceiver, PrepType

    kwargs = dict(
        num_classes=10, img_size=(32, 32), num_self_attends_per_block=2,
        num_blocks=1, num_latents=8, num_latent_channels=64,
        prep_type=PrepType.FOURIER_POS_PIXEL,
    )
    img = jnp.asarray(
        np.random.RandomState(0).randn(2, 3, 32, 32) * 0.5, jnp.float32
    )
    exact = ClassificationPerceiver(policy=PARITY, **kwargs)
    variables = jax.jit(exact.init)(jax.random.PRNGKey(0), img)
    want = np.asarray(jax.jit(exact.apply)(variables, img))

    qpolicy = dataclasses.replace(PARITY, quant="int8_dynamic")
    quant = ClassificationPerceiver(policy=qpolicy, **kwargs)
    got = np.asarray(jax.jit(quant.apply)(variables, img))

    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.05, rel
    assert not np.allclose(got, want)  # the quant path actually engaged
