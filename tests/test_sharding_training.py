"""Multi-chip sharding and training-step tests on a virtual 8-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8, set in conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from perceiverio_pytorch_tpu.models import LanguagePerceiver
from perceiverio_pytorch_tpu.parallel import default_mesh_shape, make_mesh
from perceiverio_pytorch_tpu.training import (
    create_sharded_train_state,
    create_train_state,
    make_sharded_train_step,
    make_train_step,
    masked_token_cross_entropy,
)

TINY = dict(
    vocab_size=262,
    max_seq_len=32,
    embed_dim=16,
    num_self_attends_per_block=2,
    num_blocks=1,
    num_latents=8,
    num_latent_channels=64,
)


def _make_batch(batch_size=8):
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, 262, (batch_size, 32)), jnp.int32)
    mask = jnp.ones((batch_size, 32), bool)
    return tokens, mask


def test_eight_cpu_devices_available():
    assert len(jax.devices()) == 8


def test_single_device_train_step_decreases_loss():
    model = LanguagePerceiver(**TINY)
    tokens, mask = _make_batch()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens, mask)

    def loss_fn(params, tokens, mask):
        logits = model.apply(params, tokens, mask)
        return masked_token_cross_entropy(logits, tokens, mask)

    tx = optax.adamw(1e-3)
    state = create_train_state(params, tx)
    step = make_train_step(loss_fn, tx, donate=False)
    state, loss0 = step(state, tokens, mask)
    for _ in range(3):
        state, loss = step(state, tokens, mask)
    assert float(loss) < float(loss0)
    assert int(state.step) == 4


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_sharded_train_step(mesh_shape):
    """DP / DP+TP train step over the virtual mesh; loss matches single-dev."""
    model = LanguagePerceiver(**TINY)
    tokens, mask = _make_batch()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens, mask)

    def loss_fn(params, tokens, mask):
        logits = model.apply(params, tokens, mask)
        return masked_token_cross_entropy(logits, tokens, mask)

    # sgd: updates are linear in the gradients, so DP/TP reduction-order
    # noise stays at fp32 epsilon (adam's step-1 rsqrt amplifies it)
    tx = optax.sgd(1e-2)

    mesh = make_mesh(mesh_shape)
    state = create_sharded_train_state(params, tx, mesh)
    step = make_sharded_train_step(
        loss_fn, tx, mesh, state, num_batch_args=2, donate=False
    )

    # single-device reference
    ref_state = create_train_state(params, tx)
    ref_step = make_train_step(loss_fn, tx, donate=False)

    state, loss = step(state, tokens, mask)
    ref_state, ref_loss = ref_step(ref_state, tokens, mask)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)

    # params after one step agree
    flat = jax.tree_util.tree_leaves(state.params)
    ref_flat = jax.tree_util.tree_leaves(ref_state.params)
    for a, b in zip(flat, ref_flat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_tp_params_actually_sharded():
    model = LanguagePerceiver(**TINY)
    tokens, mask = _make_batch()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens, mask)
    mesh = make_mesh((4, 2))
    state = create_sharded_train_state(params, optax.sgd(1e-3), mesh)
    kernel = state.params["params"]["perceiver"]["encoder"]["self_attends"]["0"][
        "attention"
    ]["proj_q"]["kernel"]
    # column-parallel: output dim split over 2 model shards
    shard_shapes = {tuple(s.data.shape) for s in kernel.addressable_shards}
    full = kernel.shape
    assert (full[0], full[1] // 2) in shard_shapes


def _proj_q(tree):
    return tree["params"]["perceiver"]["encoder"]["self_attends"]["0"][
        "attention"
    ]["proj_q"]["kernel"]


def test_optimizer_moments_sharded_like_params():
    """Regression: GSPMD does not propagate input shardings into jit
    outputs, so tx.init must be constrained with explicit out_shardings
    (trainer.opt_state_shardings) -- without it adam moments come back
    replicated, forfeiting TP/FSDP memory scaling on 2x the param bytes."""
    model = LanguagePerceiver(**TINY)
    tokens, mask = _make_batch()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens, mask)
    mesh = make_mesh((4, 2))
    state = create_sharded_train_state(params, optax.adam(1e-3), mesh)
    kernel = _proj_q(state.params)
    mu = _proj_q(state.opt_state[0].mu)
    nu = _proj_q(state.opt_state[0].nu)
    assert mu.sharding == kernel.sharding
    assert nu.sharding == kernel.sharding
    # and the sharding is real: column-parallel split over the model axis
    assert {tuple(s.data.shape) for s in mu.addressable_shards} == {
        (kernel.shape[0], kernel.shape[1] // 2)
    }


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_fsdp_train_step_matches_single_device(mesh_shape):
    """ZeRO-3: params + adam moments sharded over the data axis (composing
    with TP on (4,2)); one train step matches the unsharded step."""
    model = LanguagePerceiver(**TINY)
    tokens, mask = _make_batch()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens, mask)

    def loss_fn(params, tokens, mask):
        logits = model.apply(params, tokens, mask)
        return masked_token_cross_entropy(logits, tokens, mask)

    tx = optax.sgd(1e-2)  # linear in grads: reduction-order noise stays eps
    mesh = make_mesh(mesh_shape)
    state = create_sharded_train_state(params, tx, mesh, fsdp=True)
    step = make_sharded_train_step(
        loss_fn, tx, mesh, state, num_batch_args=2, donate=False
    )

    ref_state = create_train_state(params, tx)
    ref_step = make_train_step(loss_fn, tx, donate=False)

    state, loss = step(state, tokens, mask)
    ref_state, ref_loss = ref_step(ref_state, tokens, mask)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(ref_state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_fsdp_params_and_moments_actually_sharded():
    """Each replica holds 1/data of every >=2-D param AND its moments; 1-D
    params (biases, LN scales) stay replicated."""
    from flax.traverse_util import flatten_dict

    model = LanguagePerceiver(**TINY)
    tokens, mask = _make_batch()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens, mask)
    mesh = make_mesh((4, 2))
    state = create_sharded_train_state(
        params, optax.adam(1e-3), mesh, fsdp=True
    )
    kernel = _proj_q(state.params)
    # TP column-parallel + FSDP on the in dim: P('data', 'model')
    assert {tuple(s.data.shape) for s in kernel.addressable_shards} == {
        (kernel.shape[0] // 4, kernel.shape[1] // 2)
    }
    mu = _proj_q(state.opt_state[0].mu)
    assert mu.sharding == kernel.sharding

    for path, leaf in flatten_dict(state.params["params"]).items():
        shard_elems = max(
            int(np.prod(s.data.shape)) for s in leaf.addressable_shards
        )
        if (
            leaf.size > 0
            and leaf.ndim >= 2
            and any(d > 0 and d % 4 == 0 for d in leaf.shape)
        ):
            assert shard_elems < leaf.size, path  # actually sharded
        if leaf.ndim < 2:
            # FSDP adds no data-axis sharding to 1-D params (TP may still
            # shard column-parallel biases over the model axis)
            assert "data" not in tuple(leaf.sharding.spec), path


def test_fsdp_production_optimizer_chain_moments_sharded():
    """opt_state_shardings must survive the full build_optimizer chain
    (global-norm clip + adamw with weight-decay mask + MultiSteps
    accumulation + apply_if_finite): every params-shaped leaf anywhere in
    the nested state takes its param's FSDP sharding."""
    from perceiverio_pytorch_tpu.training import build_optimizer

    model = LanguagePerceiver(**TINY)
    tokens, mask = _make_batch()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens, mask)
    mesh = make_mesh((8, 1))
    tx = build_optimizer(
        3e-4, schedule="cosine", total_steps=10, warmup_steps=2,
        clip_norm=1.0, accum_steps=2, weight_decay_mask="non_1d",
        skip_nonfinite_updates=3,
    )
    state = create_sharded_train_state(params, tx, mesh, fsdp=True)
    kernel = _proj_q(state.params)
    assert "data" in tuple(kernel.sharding.spec)

    flat, _ = jax.tree_util.tree_flatten_with_path(state.opt_state)
    k_path, _ = [
        (tuple(p), l)
        for p, l in jax.tree_util.tree_flatten_with_path(state.params)[0]
        if getattr(p[-2], "key", None) == "proj_q"
        and getattr(p[-1], "key", None) == "kernel"
    ][0]
    matches = [
        leaf for p, leaf in flat
        if len(p) >= len(k_path) and tuple(p)[-len(k_path):] == k_path
    ]
    # MultiSteps acc_grads + adam mu/nu at minimum
    assert len(matches) >= 3, len(matches)
    for leaf in matches:
        assert leaf.sharding == kernel.sharding


def test_fsdp_with_multisteps_accumulators_sharded():
    """MultiSteps' grad accumulators embed a params-tree copy; the suffix
    path matching in opt_state_shardings shards them like the params."""
    model = LanguagePerceiver(**TINY)
    tokens, mask = _make_batch()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens, mask)
    mesh = make_mesh((8, 1))
    tx = optax.MultiSteps(optax.adam(1e-3), every_k_schedule=2)
    state = create_sharded_train_state(params, tx, mesh, fsdp=True)
    acc = _proj_q(state.opt_state.acc_grads)
    kernel = _proj_q(state.params)
    assert acc.sharding == kernel.sharding
    assert {tuple(s.data.shape) for s in acc.addressable_shards} != {
        tuple(kernel.shape)
    }


def test_default_mesh_shape():
    assert default_mesh_shape(8) == (4, 2)
    assert default_mesh_shape(2) == (2, 1)
    assert default_mesh_shape(1) == (1, 1)


def test_sequence_parallel_encoder_matches_unsharded():
    """Token-axis (sequence-parallel) sharding of the encoder inputs must not
    change the result; GSPMD reduces the KV-sharded softmax over the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from perceiverio_pytorch_tpu import PerceiverIO, TrainableQuery

    mesh = make_mesh((2, 4))
    spec = NamedSharding(mesh, P("data", "model"))
    kwargs = dict(
        num_blocks=1,
        num_self_attends_per_block=1,
        num_latents=4,
        num_latent_channels=32,
        final_project=True,
        final_project_out_channels=8,
        input_channels=16,
        output_queries=TrainableQuery(output_index_dims=3, num_channels=16),
    )
    model_sp = PerceiverIO(input_token_sharding=spec, **kwargs)
    model = PerceiverIO(**kwargs)

    x = jnp.asarray(np.random.RandomState(0).randn(4, 64, 16), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    ref = jax.jit(model.apply)(params, x)
    sp = jax.jit(model_sp.apply)(params, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(sp), rtol=1e-5, atol=1e-6)


def test_remat_gradients_match():
    """Encoder-block rematerialisation must not change loss or gradients."""
    from perceiverio_pytorch_tpu import PerceiverIO, TrainableQuery

    kwargs = dict(
        num_blocks=2,
        num_self_attends_per_block=2,
        num_latents=8,
        num_latent_channels=32,
        final_project=True,
        final_project_out_channels=8,
        input_channels=16,
        output_queries=TrainableQuery(output_index_dims=3, num_channels=16),
    )
    model = PerceiverIO(**kwargs)
    model_r = PerceiverIO(remat=True, **kwargs)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 20, 16), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    def loss(m):
        return lambda p: jnp.sum(m.apply(p, x) ** 2)

    l0, g0 = jax.jit(jax.value_and_grad(loss(model)))(params)
    l1, g1 = jax.jit(jax.value_and_grad(loss(model_r)))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4)


@pytest.mark.parametrize(
    "remat_policy", ["dots_with_no_batch_dims_saveable", "dots_saveable"]
)
def test_selective_remat_gradients_match(remat_policy):
    """Policy.remat_policy (selective jax.checkpoint policies) must be a pure
    memory/speed trade: loss and gradients identical to full remat."""
    import dataclasses

    from perceiverio_pytorch_tpu import PerceiverIO, TrainableQuery
    from perceiverio_pytorch_tpu.config import DEFAULT

    kwargs = dict(
        num_blocks=2,
        num_self_attends_per_block=2,
        num_latents=8,
        num_latent_channels=32,
        final_project=True,
        final_project_out_channels=8,
        input_channels=16,
        output_queries=TrainableQuery(output_index_dims=3, num_channels=16),
    )
    model = PerceiverIO(remat=True, **kwargs)
    model_s = PerceiverIO(
        remat=True,
        policy=dataclasses.replace(DEFAULT, remat_policy=remat_policy),
        **kwargs,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(2, 20, 16), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    def loss(m):
        return lambda p: jnp.sum(m.apply(p, x) ** 2)

    l0, g0 = jax.jit(jax.value_and_grad(loss(model)))(params)
    l1, g1 = jax.jit(jax.value_and_grad(loss(model_s)))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4)


def test_data_parallel_apply_matches_single_device():
    from perceiverio_pytorch_tpu.models import ClassificationPerceiver, PrepType
    from perceiverio_pytorch_tpu.parallel import make_data_parallel_apply

    model = ClassificationPerceiver(
        num_classes=5, img_size=(32, 32), num_self_attends_per_block=1,
        num_blocks=1, num_latents=8, num_latent_channels=32,
        prep_type=PrepType.FOURIER_POS_PIXEL,
    )
    img = jnp.asarray(np.random.RandomState(0).randn(8, 3, 32, 32), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    ref = jax.jit(model.apply)(params, img)

    mesh = make_mesh((8, 1))
    fn, place = make_data_parallel_apply(model, mesh)
    placed = place(params, img)
    out = fn(*placed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_flow_inference_on_mesh_matches():
    from perceiverio_pytorch_tpu.models import FlowInference, FlowPerceiver

    model = FlowPerceiver(
        img_size=(16, 24), num_latents=8, num_latent_channels=32,
        num_self_attends_per_block=1, num_blocks=1,
    )
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.uniform(-1, 1, (1, 3, 24, 40)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(-1, 1, (1, 3, 24, 40)), jnp.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 24)), jnp.zeros((1, 3, 16, 24))
    )
    ref = FlowInference(model, params, min_overlap=8)(img1, img2)
    mesh = make_mesh((4, 2))
    dp = FlowInference(model, params, min_overlap=8, mesh=mesh)(img1, img2)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(dp), rtol=1e-5, atol=1e-5)
    # wave_size composes with the mesh (scanned waves, each wave's batch
    # sharded over the data axis); a wave_size below the data-axis size is
    # rounded up to it rather than silently dropped.
    waved = FlowInference(
        model, params, min_overlap=8, mesh=mesh, wave_size=2
    )
    assert waved.wave_size == 4 and waved._wave_fn is not None
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(waved(img1, img2)), rtol=1e-5, atol=1e-5
    )


def test_sequence_parallel_attention_matches_single_device():
    """KV-sharded attention with softmax-stat all-reduce == dense attention."""
    from perceiverio_pytorch_tpu.ops.attention_xla import attend_xla
    from perceiverio_pytorch_tpu.parallel import sequence_parallel_attention

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 16, 2, 32), jnp.float32)
    k = jnp.asarray(rng.randn(2, 64, 2, 32), jnp.float32)
    v = jnp.asarray(rng.randn(2, 64, 2, 32), jnp.float32)
    kv_mask = jnp.asarray(rng.rand(2, 64) > 0.3)

    mesh = make_mesh((2, 4))
    ref = np.asarray(
        attend_xla(q, k, v, attention_mask=kv_mask[:, None, :] & jnp.ones((2, 16, 1), bool))
    )
    got = np.asarray(
        jax.jit(
            lambda q, k, v, m: sequence_parallel_attention(
                q, k, v, mesh, kv_mask=m, axis_name="model"
            )
        )(q, k, v, kv_mask)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    # no-mask path
    ref2 = np.asarray(attend_xla(q, k, v))
    got2 = np.asarray(
        jax.jit(lambda q, k, v: sequence_parallel_attention(q, k, v, mesh))(q, k, v)
    )
    np.testing.assert_allclose(got2, ref2, rtol=1e-5, atol=1e-5)


def test_sequence_parallel_attention_all_masked_rows_zero():
    from perceiverio_pytorch_tpu.parallel import sequence_parallel_attention

    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 8, 1, 32), jnp.float32)
    k = jnp.asarray(rng.randn(1, 32, 1, 32), jnp.float32)
    v = jnp.asarray(rng.randn(1, 32, 1, 32), jnp.float32)
    mesh = make_mesh((2, 4))
    out = jax.jit(
        lambda q, k, v, m: sequence_parallel_attention(q, k, v, mesh, kv_mask=m)
    )(q, k, v, jnp.zeros((1, 32), bool))
    assert np.all(np.asarray(out) == 0.0)


def test_policy_sequence_parallel_model_matches_single_device():
    """A PerceiverIO built with Policy(sp_mesh=...) runs its encoder
    cross-attend KV-sharded over the mesh and matches the default model."""
    from perceiverio_pytorch_tpu import PerceiverIO, Policy, TrainableQuery

    mesh = make_mesh((2, 4))
    kwargs = dict(
        num_blocks=1,
        num_self_attends_per_block=1,
        num_latents=4,
        num_latent_channels=32,
        final_project=True,
        final_project_out_channels=8,
        input_channels=16,
        output_queries=TrainableQuery(output_index_dims=3, num_channels=16),
    )
    model = PerceiverIO(**kwargs)
    model_sp = PerceiverIO(
        policy=Policy(sp_mesh=mesh, sp_axis="model", sp_min_kv=32), **kwargs
    )
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 16), jnp.float32)
    mask = jnp.asarray(np.random.RandomState(1).rand(2, 64) > 0.2)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    ref = jax.jit(lambda p, x, m: model.apply(p, x, input_mask=m))(params, x, mask)
    sp = jax.jit(lambda p, x, m: model_sp.apply(p, x, input_mask=m))(params, x, mask)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(sp), rtol=1e-5, atol=1e-5)


def test_sequence_parallel_attention_autopads_non_divisible():
    """Tk that doesn't divide the mesh axis is padded internally with masked
    keys; result still matches dense attention (with and without kv_mask)."""
    from perceiverio_pytorch_tpu.ops.attention_xla import attend_xla
    from perceiverio_pytorch_tpu.parallel import sequence_parallel_attention

    rng = np.random.RandomState(3)
    mesh = make_mesh((2, 4))  # model axis = 4; 62 % 4 != 0
    q = jnp.asarray(rng.randn(2, 8, 2, 16), jnp.float32)
    k = jnp.asarray(rng.randn(2, 62, 2, 16), jnp.float32)
    v = jnp.asarray(rng.randn(2, 62, 2, 16), jnp.float32)
    kv_mask = jnp.asarray(rng.rand(2, 62) > 0.3)

    ref = np.asarray(
        attend_xla(
            q, k, v,
            attention_mask=kv_mask[:, None, :] & jnp.ones((2, 8, 1), bool),
        )
    )
    got = np.asarray(
        jax.jit(
            lambda q, k, v, m: sequence_parallel_attention(
                q, k, v, mesh, kv_mask=m
            )
        )(q, k, v, kv_mask)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    ref2 = np.asarray(attend_xla(q, k, v))
    got2 = np.asarray(
        jax.jit(lambda q, k, v: sequence_parallel_attention(q, k, v, mesh))(
            q, k, v
        )
    )
    np.testing.assert_allclose(got2, ref2, rtol=1e-5, atol=1e-5)

    # gradients flow through the padded path
    g_sp = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(
            sequence_parallel_attention(q, k, v, mesh) ** 2
        ), argnums=(0, 1, 2),
    ))(q, k, v)
    g_ref = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(attend_xla(q, k, v) ** 2), argnums=(0, 1, 2),
    ))(q, k, v)
    for a, b in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "tk",
    [
        53187,  # multimodal concat: 3010 audio + 50176 image + 1 label (odd)
        182528,  # flow tile tokens: 368*496
    ],
)
def test_sequence_parallel_attention_real_token_counts(tk):
    """SP attention at the zoo models' real (non-toy) token counts on the
    8-CPU mesh; multimodal's odd 53,187 exercises the auto-pad."""
    from perceiverio_pytorch_tpu.ops.attention_xla import attend_xla
    from perceiverio_pytorch_tpu.parallel import sequence_parallel_attention

    rng = np.random.RandomState(4)
    mesh = make_mesh((1, 8))
    q = jnp.asarray(rng.randn(1, 8, 1, 32), jnp.float32)
    k = jnp.asarray(rng.randn(1, tk, 1, 32), jnp.float32)
    v = jnp.asarray(rng.randn(1, tk, 1, 32), jnp.float32)

    ref = np.asarray(attend_xla(q, k, v))
    got = np.asarray(
        jax.jit(lambda q, k, v: sequence_parallel_attention(q, k, v, mesh))(
            q, k, v
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_policy_sequence_parallel_non_divisible_tokens():
    """Policy(sp_mesh=...) works unmodified when the model's token count
    doesn't divide the mesh axis (auto-pad in the dispatch path)."""
    from perceiverio_pytorch_tpu import PerceiverIO, Policy, TrainableQuery

    mesh = make_mesh((2, 4))
    kwargs = dict(
        num_blocks=1,
        num_self_attends_per_block=1,
        num_latents=4,
        num_latent_channels=32,
        final_project=True,
        final_project_out_channels=8,
        input_channels=16,
        output_queries=TrainableQuery(output_index_dims=3, num_channels=16),
    )
    model = PerceiverIO(**kwargs)
    model_sp = PerceiverIO(
        policy=Policy(sp_mesh=mesh, sp_axis="model", sp_min_kv=32), **kwargs
    )
    x = jnp.asarray(np.random.RandomState(5).randn(2, 61, 16), jnp.float32)
    mask = jnp.asarray(np.random.RandomState(6).rand(2, 61) > 0.2)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    ref = jax.jit(lambda p, x, m: model.apply(p, x, input_mask=m))(params, x, mask)
    sp = jax.jit(lambda p, x, m: model_sp.apply(p, x, input_mask=m))(params, x, mask)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(sp), rtol=1e-5, atol=1e-5)


class TestRingFlash:
    """Ring attention: per-device Pallas flash (interpret mode on CPU) over
    the local KV shard with global lse merge, vs dense attention."""

    def _sp(self, *args, mesh, **kw):
        from perceiverio_pytorch_tpu.parallel import sequence_parallel_attention

        return sequence_parallel_attention(
            *args, mesh, impl="flash", interpret=True, **kw
        )

    def test_matches_dense(self):
        from perceiverio_pytorch_tpu.ops.attention_xla import attend_xla

        rng = np.random.RandomState(7)
        mesh = make_mesh((2, 4))
        q = jnp.asarray(rng.randn(2, 16, 2, 32), jnp.float32)
        k = jnp.asarray(rng.randn(2, 64, 2, 32), jnp.float32)
        v = jnp.asarray(rng.randn(2, 64, 2, 32), jnp.float32)
        kv_mask = jnp.asarray(rng.rand(2, 64) > 0.3)

        ref = np.asarray(
            attend_xla(
                q, k, v,
                attention_mask=kv_mask[:, None, :] & jnp.ones((2, 16, 1), bool),
            )
        )
        got = np.asarray(
            jax.jit(lambda q, k, v, m: self._sp(q, k, v, mesh=mesh, kv_mask=m))(
                q, k, v, kv_mask
            )
        )
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

        ref2 = np.asarray(attend_xla(q, k, v))
        got2 = np.asarray(
            jax.jit(lambda q, k, v: self._sp(q, k, v, mesh=mesh))(q, k, v)
        )
        np.testing.assert_allclose(got2, ref2, rtol=1e-5, atol=1e-5)

    def test_autopad_non_divisible(self):
        from perceiverio_pytorch_tpu.ops.attention_xla import attend_xla

        rng = np.random.RandomState(8)
        mesh = make_mesh((2, 4))  # 61 % 4 != 0
        q = jnp.asarray(rng.randn(1, 8, 2, 16), jnp.float32)
        k = jnp.asarray(rng.randn(1, 61, 2, 16), jnp.float32)
        v = jnp.asarray(rng.randn(1, 61, 2, 16), jnp.float32)
        ref = np.asarray(attend_xla(q, k, v))
        got = np.asarray(
            jax.jit(lambda q, k, v: self._sp(q, k, v, mesh=mesh))(q, k, v)
        )
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_all_masked_rows_zero(self):
        rng = np.random.RandomState(9)
        mesh = make_mesh((2, 4))
        q = jnp.asarray(rng.randn(1, 8, 1, 32), jnp.float32)
        k = jnp.asarray(rng.randn(1, 32, 1, 32), jnp.float32)
        v = jnp.asarray(rng.randn(1, 32, 1, 32), jnp.float32)
        out = jax.jit(
            lambda q, k, v, m: self._sp(q, k, v, mesh=mesh, kv_mask=m)
        )(q, k, v, jnp.zeros((1, 32), bool))
        assert np.all(np.asarray(out) == 0.0)

    def test_gradients_match_dense(self):
        from perceiverio_pytorch_tpu.ops.attention_xla import attend_xla

        rng = np.random.RandomState(10)
        mesh = make_mesh((2, 4))
        q = jnp.asarray(rng.randn(1, 8, 2, 16), jnp.float32)
        k = jnp.asarray(rng.randn(1, 64, 2, 16), jnp.float32)
        v = jnp.asarray(rng.randn(1, 64, 2, 16), jnp.float32)
        kv_mask = jnp.asarray(rng.rand(1, 64) > 0.3)

        g_sp = jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(
                self._sp(q, k, v, mesh=mesh, kv_mask=kv_mask) ** 2
            ), argnums=(0, 1, 2),
        ))(q, k, v)
        mask3 = kv_mask[:, None, :] & jnp.ones((1, 8, 1), bool)
        g_ref = jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(
                attend_xla(q, k, v, attention_mask=mask3) ** 2
            ), argnums=(0, 1, 2),
        ))(q, k, v)
        for a, b in zip(g_sp, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )

    def test_encoder_integration_policy_knob(self):
        """PerceiverIO with Policy(sp_mesh=..., sp_impl='flash') encodes
        identically to the single-device default model."""
        from perceiverio_pytorch_tpu import PerceiverIO, Policy, TrainableQuery

        mesh = make_mesh((2, 4))
        kwargs = dict(
            num_blocks=1,
            num_self_attends_per_block=1,
            num_latents=4,
            num_latent_channels=32,
            final_project=True,
            final_project_out_channels=8,
            input_channels=16,
            output_queries=TrainableQuery(output_index_dims=3, num_channels=16),
        )
        model = PerceiverIO(**kwargs)
        model_sp = PerceiverIO(
            policy=Policy(
                sp_mesh=mesh, sp_axis="model", sp_min_kv=32,
                sp_impl="flash", interpret=True,
            ),
            **kwargs,
        )
        x = jnp.asarray(np.random.RandomState(11).randn(2, 61, 16), jnp.float32)
        mask = jnp.asarray(np.random.RandomState(12).rand(2, 61) > 0.2)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        ref = jax.jit(lambda p, x, m: model.apply(p, x, input_mask=m))(
            params, x, mask
        )
        sp = jax.jit(lambda p, x, m: model_sp.apply(p, x, input_mask=m))(
            params, x, mask
        )
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(sp), rtol=1e-5, atol=1e-5
        )


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_sharded_conv_classification_training_batchnorm(mesh_shape):
    """DP/DP+TP training through Conv2DDownsample's BatchNorm: under
    jit+GSPMD the batch statistics reduce over the GLOBAL batch (the
    sharded-axis mean IS the cross-replica mean), so the sharded step must
    match single-device training exactly -- loss, params, and the
    batch_stats EMA."""
    from perceiverio_pytorch_tpu.models import ClassificationPerceiver, PrepType
    from perceiverio_pytorch_tpu.training import classification_cross_entropy

    model = ClassificationPerceiver(
        num_classes=5, img_size=(32, 32), num_self_attends_per_block=1,
        num_blocks=1, num_latents=8, num_latent_channels=32,
        prep_type=PrepType.FOURIER_POS_CONVNET,
    )
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(8, 3, 32, 32), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 5, (8,)), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)

    # model_state = every non-param collection (batch_stats EMA + the
    # immutable "consts" Fourier tables), carried through the TrainState
    def loss_fn(params, model_state, img, labels):
        logits, mutated = model.apply(
            {"params": params, **model_state},
            img,
            deterministic=False,
            mutable=["batch_stats"],
        )
        return classification_cross_entropy(logits, labels), {
            **model_state,
            **mutated,
        }

    tx = optax.sgd(1e-2)
    aux = {k: v for k, v in variables.items() if k != "params"}

    # single-device reference
    ref_state = create_train_state(variables["params"], tx, model_state=aux)
    ref_step = make_train_step(loss_fn, tx, donate=False, with_model_state=True)
    ref_state, ref_loss = ref_step(ref_state, img, labels)
    ref_state, ref_loss2 = ref_step(ref_state, img, labels)

    mesh = make_mesh(mesh_shape)
    state = create_sharded_train_state(
        variables["params"], tx, mesh, model_state=aux
    )
    step = make_sharded_train_step(
        loss_fn, tx, mesh, state, num_batch_args=2, donate=False,
        with_model_state=True,
    )
    from perceiverio_pytorch_tpu.parallel.sharding import batch_sharding

    img_s = jax.device_put(img, batch_sharding(mesh))
    labels_s = jax.device_put(labels, batch_sharding(mesh))
    state, loss = step(state, img_s, labels_s)
    state, loss2 = step(state, img_s, labels_s)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(float(loss2), float(ref_loss2), rtol=1e-5)
    # batch_stats EMA identical to single-device (global-batch statistics)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.model_state),
        jax.tree_util.tree_leaves(ref_state.model_state),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(ref_state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_multimodal_chunk_parallel_decode_matches():
    """Decoding query chunks in data-axis-parallel waves (chunk_mesh=...)
    must match the sequential scan exactly; the chunk axis is
    embarrassingly parallel."""
    from perceiverio_pytorch_tpu.models import MultiModalPerceiver

    model = MultiModalPerceiver(
        img_size=(16, 16),
        num_frames=2,
        num_classes=11,
        audio_samples_per_frame=128,
        audio_samples_per_patch=16,
        num_self_attends_per_block=1,
        num_blocks=1,
        num_latents=8,
        num_latent_channels=512,
    )
    rng = np.random.RandomState(4)
    images = jnp.asarray(rng.rand(1, 2, 3, 16, 16), jnp.float32)
    audio = jnp.asarray(rng.uniform(-1, 1, (1, 256, 1)), jnp.float32)

    params = jax.jit(lambda key, i, a: model.init(key, i, a, 8))(
        jax.random.PRNGKey(0), images, audio
    )
    ref = jax.jit(lambda v, i, a: model.apply(v, i, a, 8))(
        params, images, audio
    )

    mesh = make_mesh((8, 1))
    par = jax.jit(
        lambda v, i, a: model.apply(v, i, a, 8, chunk_mesh=mesh)
    )(params, images, audio)
    for key in ("image", "audio", "label"):
        np.testing.assert_allclose(
            np.asarray(par[key]), np.asarray(ref[key]),
            rtol=1e-5, atol=1e-6, err_msg=key,
        )

    # n_chunks not a multiple of the data axis -> actionable error
    with pytest.raises(ValueError, match="multiple of the mesh"):
        model.apply(params, images, audio, 4, chunk_mesh=mesh)


def test_sequence_parallel_attention_gradients():
    """Gradients flow through the KV-sharded attention (psum/pmax path) and
    match the dense reference."""
    from perceiverio_pytorch_tpu.ops.attention_xla import attend_xla
    from perceiverio_pytorch_tpu.parallel import sequence_parallel_attention

    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(1, 8, 2, 16), jnp.float32)
    k = jnp.asarray(rng.randn(1, 32, 2, 16), jnp.float32)
    v = jnp.asarray(rng.randn(1, 32, 2, 16), jnp.float32)
    mesh = make_mesh((2, 4))

    g_sp = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(
            sequence_parallel_attention(q, k, v, mesh) ** 2
        ), argnums=(0, 1, 2),
    ))(q, k, v)
    g_ref = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(attend_xla(q, k, v) ** 2), argnums=(0, 1, 2),
    ))(q, k, v)
    for a, b in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_sequence_parallel_auto_respects_backend_override(monkeypatch):
    """Policy.backend must reach the SP impl='auto' decision exactly as it
    reaches the single-chip dispatch sites: on a CPU-default process,
    backend='tpu' selects the ring-flash branch (regression: the SP site
    used to consult only the process default and silently fell back to the
    stat-merge path, materialising the local logits)."""
    from perceiverio_pytorch_tpu.parallel import sequence_parallel
    from perceiverio_pytorch_tpu.parallel import sequence_parallel_attention

    rng = np.random.RandomState(4)
    mesh = make_mesh((2, 4))
    q = jnp.asarray(rng.randn(2, 8, 2, 16), jnp.float32)
    k = jnp.asarray(rng.randn(2, 64, 2, 16), jnp.float32)
    v = jnp.asarray(rng.randn(2, 64, 2, 16), jnp.float32)

    class _FlashSelected(Exception):
        pass

    def _sentinel(*a, **kw):
        raise _FlashSelected

    monkeypatch.setattr(sequence_parallel, "_make_ring_flash", _sentinel)

    # local_kv = 16 >= flash_min_shard=8: auto takes flash iff the backend
    # resolves to TPU.  This process resolves to CPU, so without the
    # override auto must use the stat-merge path (no sentinel).
    out = sequence_parallel_attention(q, k, v, mesh, flash_min_shard=8)
    assert np.isfinite(np.asarray(out)).all()

    with pytest.raises(_FlashSelected):
        sequence_parallel_attention(
            q, k, v, mesh, flash_min_shard=8, backend="tpu"
        )


def test_sharded_train_step_with_adafactor():
    """Adafactor's factored state (row/col vectors, scalars) must flow
    through create_sharded_train_state's GSPMD init and the sharded step."""
    from perceiverio_pytorch_tpu.training import (
        build_optimizer,
        create_sharded_train_state,
        make_sharded_train_step,
    )

    def loss_fn(params, x, y):
        return jnp.mean((x @ params["dense"]["kernel"] - y) ** 2)

    mesh = make_mesh((4, 2))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 16), jnp.float32)
    y = jnp.asarray(rng.randn(8, 4), jnp.float32)
    params = {"dense": {"kernel": rng.randn(16, 4).astype(np.float32)}}
    tx = build_optimizer(1e-2, optimizer="adafactor", clip_norm=1.0)

    state = create_sharded_train_state(params, tx, mesh)
    step = make_sharded_train_step(loss_fn, tx, mesh, state, num_batch_args=2)
    first = None
    for _ in range(5):
        state, loss = step(state, x, y)
        first = float(loss) if first is None else first
    assert float(loss) < first


def test_sharded_train_step_with_trainable_mask():
    """Parameter freezing (optax.multi_transform MaskedNode state) flows
    through the GSPMD sharded state init and step: frozen leaves stay
    bit-identical on the mesh, trainable ones move."""
    from perceiverio_pytorch_tpu.training import (
        build_optimizer,
        create_sharded_train_state,
        make_sharded_train_step,
    )

    def loss_fn(params, x, y):
        return jnp.mean((x @ params["w"] @ params["head"] - y) ** 2)

    mesh = make_mesh((8, 1))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(16, 4), jnp.float32)
    y = jnp.asarray(rng.randn(16, 2), jnp.float32)
    params = {
        "w": rng.randn(4, 3).astype(np.float32),
        "head": rng.randn(3, 2).astype(np.float32),
    }
    w0 = params["w"].copy()
    tx = build_optimizer(
        5e-2, clip_norm=1.0, trainable_mask={"w": False, "head": True}
    )
    state = create_sharded_train_state(params, tx, mesh)
    step = make_sharded_train_step(loss_fn, tx, mesh, state, num_batch_args=2)
    first = None
    for _ in range(3):
        state, loss = step(state, x, y)
        first = float(loss) if first is None else first
    assert float(loss) < first
    np.testing.assert_array_equal(np.asarray(state.params["w"]), w0)
    assert float(np.abs(np.asarray(state.params["head"]) - params["head"]).max()) > 0


def test_multimodal_rejects_nondivisible_n_chunks():
    """n_chunks that doesn't divide the query counts raises a clear error
    at trace time instead of a cryptic reshape failure at stitch time."""
    import pytest

    from perceiverio_pytorch_tpu.models import MultiModalPerceiver

    model = MultiModalPerceiver(
        img_size=(16, 16), num_frames=2, num_classes=11,
        audio_samples_per_frame=128, audio_samples_per_patch=16,
        num_self_attends_per_block=1, num_blocks=1,
        num_latents=8, num_latent_channels=512,
    )
    images = jnp.zeros((1, 2, 3, 16, 16), jnp.float32)
    audio = jnp.zeros((1, 256, 1), jnp.float32)  # 16 audio patches
    # 512 image queries and 16 audio patches: n_chunks=3 divides neither
    with pytest.raises(ValueError, match="n_chunks"):
        jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), images, audio, 3)
        )


def test_flow_inference_dp_pad_exceeding_tile_count():
    """A mesh data axis larger than the tile grid pads with CYCLIC repeats
    (tiles[:pad_n] alone under-fills when pad_n > n_tiles) and matches the
    unmeshed result."""
    from perceiverio_pytorch_tpu.models import FlowInference, FlowPerceiver

    model = FlowPerceiver(
        img_size=(16, 24), num_latents=8, num_latent_channels=32,
        num_self_attends_per_block=1, num_blocks=1,
    )
    rng = np.random.RandomState(1)
    # height == patch height -> single tile row; grid of 2 tiles, dp=8
    img1 = jnp.asarray(rng.uniform(-1, 1, (1, 3, 16, 40)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(-1, 1, (1, 3, 16, 40)), jnp.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 24)), jnp.zeros((1, 3, 16, 24))
    )
    ref = FlowInference(model, params, min_overlap=8)(img1, img2)
    mesh = make_mesh((8, 1))
    dp = FlowInference(model, params, min_overlap=8, mesh=mesh)(img1, img2)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(dp), rtol=1e-5, atol=1e-5
    )
