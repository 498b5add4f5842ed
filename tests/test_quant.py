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


def test_quant_scope_validation_and_sites():
    assert quant_enabled(
        dataclasses.replace(PARITY, quant="int8_dynamic", quant_scope="all"),
        site="cross",
    )
    latent_only = dataclasses.replace(
        PARITY, quant="int8_dynamic", quant_scope="latent"
    )
    assert quant_enabled(latent_only, site="latent")
    assert not quant_enabled(latent_only, site="cross")
    with pytest.raises(ValueError, match="quant_scope"):
        quant_enabled(dataclasses.replace(PARITY, quant_scope="decoder"))


def test_quant_scope_latent_cross_attention_is_exact():
    """Under quant_scope="latent" a CrossAttention block is bit-identical
    to the unquantized one (same param tree), while SelfAttention still
    matches the scope="all" quantized block."""
    from perceiverio_pytorch_tpu.core.attention import (
        CrossAttention,
        SelfAttention,
    )

    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(2, 6, 32), jnp.float32)
    kv = jnp.asarray(rng.randn(2, 10, 48), jnp.float32)

    latent_only = dataclasses.replace(
        PARITY, quant="int8_dynamic", quant_scope="latent"
    )
    quant_all = dataclasses.replace(PARITY, quant="int8_dynamic")

    def cross_out(policy):
        m = CrossAttention(q_in_channels=32, kv_in_channels=48, num_heads=4,
                           policy=policy)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), q, kv)
        return params, np.asarray(jax.jit(m.apply)(params, q, kv))

    p_exact, out_exact = cross_out(PARITY)
    p_latent, out_latent = cross_out(latent_only)
    _, out_all = cross_out(quant_all)
    assert jax.tree_util.tree_structure(p_exact) == jax.tree_util.tree_structure(
        p_latent
    )
    np.testing.assert_array_equal(out_latent, out_exact)
    assert np.abs(out_all - out_exact).max() > 0  # "all" really quantizes

    def self_out(policy):
        m = SelfAttention(in_channels=32, num_heads=4, policy=policy)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), q)
        return np.asarray(jax.jit(m.apply)(params, q))

    np.testing.assert_array_equal(self_out(latent_only), self_out(quant_all))
    assert np.abs(self_out(latent_only) - self_out(PARITY)).max() > 0


def test_int8_static_matmul_matches_dynamic_at_calibrated_scale():
    """With amax = the true row max, static equals dynamic on rows that
    hit the max; uncalibrated (amax=0) falls back to scale 1.0 (finite)."""
    from perceiverio_pytorch_tpu.ops.quant import int8_static_matmul

    rng = np.random.RandomState(4)
    x = rng.randn(6, 64).astype(np.float32)
    w = (rng.randn(64, 32) * 0.05).astype(np.float32)
    amax = float(np.abs(x).max())
    got = np.asarray(int8_static_matmul(jnp.asarray(x), jnp.asarray(w), amax))
    want = x @ w
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.03, rel
    # out-of-range values clip instead of exploding
    x_hot = x.copy()
    x_hot[0, 0] = 50.0
    got_hot = np.asarray(
        int8_static_matmul(jnp.asarray(x_hot), jnp.asarray(w), amax)
    )
    assert np.isfinite(got_hot).all()
    # uncalibrated: finite, coarse
    got0 = np.asarray(int8_static_matmul(jnp.asarray(x), jnp.asarray(w), 0.0))
    assert np.isfinite(got0).all()


def test_int8_static_gradients_are_ste():
    from perceiverio_pytorch_tpu.ops.quant import int8_static_matmul

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(4, 32), jnp.float32)
    w = jnp.asarray(rng.randn(32, 16) * 0.1, jnp.float32)
    amax = jnp.float32(np.abs(np.asarray(x)).max())

    gx, gw = jax.grad(
        lambda x, w: jnp.sum(jnp.sin(int8_static_matmul(x, w, amax))),
        argnums=(0, 1),
    )(x, w)
    gx_e, gw_e = jax.grad(
        lambda x, w: jnp.sum(jnp.sin(x @ w)), argnums=(0, 1)
    )(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_e), atol=0.15)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_e), atol=0.15)


def test_int8_static_calibrate_then_infer_full_model():
    """init -> ops.quant.calibrate (mutable quant_stats, exact forward,
    scan-carried amax folding) -> static inference close to exact fp32.
    Exercises the encoder nn.scan carry (num_blocks=2) end to end."""
    from perceiverio_pytorch_tpu.models import ClassificationPerceiver, PrepType
    from perceiverio_pytorch_tpu.ops.quant import calibrate

    spolicy = dataclasses.replace(PARITY, quant="int8_static")
    kwargs = dict(
        num_classes=4, img_size=(16, 16), num_self_attends_per_block=2,
        num_blocks=2, num_latents=8, num_latent_channels=32,
        prep_type=PrepType.FOURIER_POS_PIXEL,
    )
    model = ClassificationPerceiver(policy=spolicy, **kwargs)
    exact = ClassificationPerceiver(policy=PARITY, **kwargs)

    rng = np.random.RandomState(6)
    img = jnp.asarray(rng.randn(2, 3, 16, 16) * 0.5, jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    assert "quant_stats" in variables
    # init ran on the real input, so stats are already non-trivial; reset
    # them to zeros to prove calibrate() fills them from scratch.
    zeroed = jax.tree_util.tree_map(
        jnp.zeros_like, variables["quant_stats"]
    )
    variables = {**variables, "quant_stats": zeroed}

    calibrated = calibrate(model, variables, [(img,)])
    amaxes = jax.tree_util.tree_leaves(calibrated["quant_stats"])
    assert all(float(a) > 0 for a in amaxes)

    logits_static = np.asarray(jax.jit(model.apply)(calibrated, img))
    logits_exact = np.asarray(
        jax.jit(exact.apply)(
            {k: v for k, v in calibrated.items() if k != "quant_stats"}, img
        )
    )
    denom = np.abs(logits_exact).max()
    assert np.abs(logits_static - logits_exact).max() / denom < 0.12
    # calibration passes themselves run the EXACT forward
    calib_out, _ = jax.jit(
        lambda v, x: model.apply(v, x, mutable=["quant_stats"])
    )(calibrated, img)
    np.testing.assert_allclose(
        np.asarray(calib_out), logits_exact, rtol=2e-4, atol=2e-5
    )


def test_int8_static_multimodal_calibrate_and_chunked_decode():
    """Static quant through MultiModalPerceiver: init + calibration run the
    unrolled decode loop (quant_stats created/max-folded across chunks),
    inference scans with the stats as read-only broadcast, and the result
    stays chunk-count invariant and close to exact."""
    from perceiverio_pytorch_tpu.models import MultiModalPerceiver
    from perceiverio_pytorch_tpu.ops.quant import calibrate

    kwargs = dict(
        img_size=(16, 16), num_frames=2, num_classes=11,
        audio_samples_per_frame=128, audio_samples_per_patch=16,
        num_self_attends_per_block=1, num_blocks=2, num_latents=8,
        num_latent_channels=512,
    )
    spolicy = dataclasses.replace(PARITY, quant="int8_static")
    model = MultiModalPerceiver(policy=spolicy, **kwargs)
    exact = MultiModalPerceiver(policy=PARITY, **kwargs)

    rng = np.random.RandomState(8)
    images = jnp.asarray(rng.rand(1, 2, 3, 16, 16), jnp.float32)
    audio = jnp.asarray(rng.uniform(-1, 1, (1, 256, 1)), jnp.float32)

    variables = jax.jit(lambda k, i, a: model.init(k, i, a, 2))(
        jax.random.PRNGKey(0), images, audio
    )
    assert "quant_stats" in variables
    calibrated = calibrate(model, variables, [(images, audio)], n_chunks=2)
    assert all(
        float(a) > 0
        for a in jax.tree_util.tree_leaves(calibrated["quant_stats"])
    )

    out2 = jax.jit(lambda v, i, a: model.apply(v, i, a, 2))(
        calibrated, images, audio
    )
    out4 = jax.jit(lambda v, i, a: model.apply(v, i, a, 4))(
        calibrated, images, audio
    )
    for k in out2:
        np.testing.assert_allclose(
            np.asarray(out2[k]), np.asarray(out4[k]), rtol=2e-4, atol=2e-5
        )

    out_exact = jax.jit(lambda v, i, a: exact.apply(v, i, a, 2))(
        {k: v for k, v in calibrated.items() if k != "quant_stats"},
        images,
        audio,
    )
    for k in out2:
        err = np.abs(np.asarray(out2[k]) - np.asarray(out_exact[k])).max()
        denom = max(np.abs(np.asarray(out_exact[k])).max(), 1e-3)
        assert err / denom < 0.15, (k, err / denom)


def test_quant_static_data_parallel_apply_matches_single_device():
    """int8_static under the 8-device DP mesh: the replicated quant_stats
    collection rides make_data_parallel_apply, and batch sharding does not
    change the per-site static scales (they are per-GEMM scalars)."""
    from perceiverio_pytorch_tpu.models import ClassificationPerceiver, PrepType
    from perceiverio_pytorch_tpu.ops.quant import calibrate
    from perceiverio_pytorch_tpu.parallel import make_data_parallel_apply, make_mesh

    spolicy = dataclasses.replace(PARITY, quant="int8_static")
    model = ClassificationPerceiver(
        num_classes=5, img_size=(32, 32), num_self_attends_per_block=1,
        num_blocks=1, num_latents=8, num_latent_channels=32,
        prep_type=PrepType.FOURIER_POS_PIXEL, policy=spolicy,
    )
    img = jnp.asarray(np.random.RandomState(0).randn(8, 3, 32, 32), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    variables = calibrate(model, variables, [(img,)])
    ref = jax.jit(model.apply)(variables, img)

    mesh = make_mesh((8, 1))
    fn, place = make_data_parallel_apply(model, mesh)
    out = fn(*place(variables, img))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("fsdp", [False, True])
def test_quant_dynamic_sharded_train_step_matches_single_device(fsdp):
    """QAT train step (int8 forward, STE backward) through the DP+TP GSPMD
    partitioner: TP column-parallel splits the projection kernels' output
    dim, which leaves both the per-output-channel weight scales and the
    per-token activation scales shard-local-exact, so the sharded step must
    reproduce the single-device step.  fsdp=True additionally shards the
    weights + moments over the data axis (XLA all-gathers before the int8
    quantize, so the quantization sees full kernels -- still exact)."""
    import optax

    from perceiverio_pytorch_tpu.models import LanguagePerceiver
    from perceiverio_pytorch_tpu.parallel import make_mesh
    from perceiverio_pytorch_tpu.training import masked_token_cross_entropy
    from perceiverio_pytorch_tpu.training.trainer import (
        create_sharded_train_state,
        create_train_state,
        make_sharded_train_step,
        make_train_step,
    )

    qpolicy = dataclasses.replace(PARITY, quant="int8_dynamic")
    model = LanguagePerceiver(
        vocab_size=262, max_seq_len=16, embed_dim=16, num_latents=8,
        num_latent_channels=64, num_self_attends_per_block=1, num_blocks=1,
        policy=qpolicy,
    )
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(6, 262, (8, 16)), jnp.int32)
    mask = jnp.ones((8, 16), bool)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens, mask)

    def loss_fn(params, tokens, mask):
        return masked_token_cross_entropy(
            model.apply(params, tokens, mask), tokens, mask
        )

    tx = optax.sgd(1e-2)
    mesh = make_mesh((4, 2))
    state = create_sharded_train_state(params, tx, mesh, fsdp=fsdp)
    step = make_sharded_train_step(
        loss_fn, tx, mesh, state, num_batch_args=2, donate=False
    )
    ref_state = create_train_state(params, tx)
    ref_step = make_train_step(loss_fn, tx, donate=False)

    state, loss = step(state, tokens, mask)
    ref_state, ref_loss = ref_step(ref_state, tokens, mask)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_quant_composes_with_flash_head_padding():
    """quant + the flash path's head padding (d_head=8, padded to the lane
    width inside _FoldPadDense): per-output-channel weight scales are
    unaffected by the zero pad columns, so flash(interpret) and XLA attention
    must agree under the same quant mode."""
    from perceiverio_pytorch_tpu.core.attention import SelfAttention

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 16, 32), jnp.float32)

    def out(attn_impl):
        policy = dataclasses.replace(
            PARITY, quant="int8_dynamic", attn_impl=attn_impl,
            interpret=True, flash_min_kv=1, flash_min_self=1,
            flash_block_q=8, flash_block_k=8,
        )
        m = SelfAttention(in_channels=32, num_heads=4, policy=policy)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        return np.asarray(jax.jit(m.apply)(params, x))

    got_flash = out("flash")
    got_xla = out("xla")
    np.testing.assert_allclose(got_flash, got_xla, rtol=2e-4, atol=2e-5)


def test_int8_static_composes_with_remat():
    """QAT at scale needs remat: int8_static must init/calibrate (unrolled
    mutable passes under nn.remat), infer, and differentiate with remat=True."""
    from perceiverio_pytorch_tpu.models import ClassificationPerceiver, PrepType

    spolicy = dataclasses.replace(PARITY, quant="int8_static")
    model = ClassificationPerceiver(
        num_classes=4, img_size=(16, 16), num_self_attends_per_block=2,
        num_blocks=2, num_latents=8, num_latent_channels=32,
        prep_type=PrepType.FOURIER_POS_PIXEL, policy=spolicy, remat=True,
    )
    img = jnp.asarray(np.random.RandomState(12).randn(2, 3, 16, 16), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    assert "quant_stats" in variables

    def loss(params):
        return jnp.sum(model.apply({**variables, "params": params}, img) ** 2)

    grads = jax.jit(jax.grad(loss))(variables["params"])
    total = jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), grads, jnp.float32(0.0)
    )
    assert float(total) > 0 and np.isfinite(float(total))


def test_quant_error_report():
    """The PTQ validation helper: small bounded errors for int8 modes, and
    exact-zero when the model's policy doesn't quantize."""
    from perceiverio_pytorch_tpu.models import ClassificationPerceiver, PrepType
    from perceiverio_pytorch_tpu.ops.quant import calibrate, quant_error_report

    kwargs = dict(
        num_classes=4, img_size=(16, 16), num_self_attends_per_block=1,
        num_blocks=1, num_latents=8, num_latent_channels=32,
        prep_type=PrepType.FOURIER_POS_PIXEL,
    )
    img = jnp.asarray(np.random.RandomState(13).randn(2, 3, 16, 16) * 0.5,
                      jnp.float32)

    spolicy = dataclasses.replace(PARITY, quant="int8_static")
    model = ClassificationPerceiver(policy=spolicy, **kwargs)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    variables = calibrate(model, variables, [(img,)])
    report = quant_error_report(model, variables, [(img,)])
    (stats,) = report.values()
    assert 0 < stats["max_rel"] < 0.15, report
    assert stats["mean_abs"] <= stats["max_abs"]

    # unquantized model reports zero error against itself
    exact = ClassificationPerceiver(policy=PARITY, **kwargs)
    v = {k: v for k, v in variables.items() if k != "quant_stats"}
    report0 = quant_error_report(exact, v, [(img,)])
    assert all(s["max_abs"] == 0.0 for s in report0.values())
