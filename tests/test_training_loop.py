"""Trainer loop + orbax checkpoint round-trip."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from perceiverio_pytorch_tpu.models import LanguagePerceiver
from perceiverio_pytorch_tpu.training import (
    Trainer,
    create_train_state,
    masked_token_cross_entropy,
)
from perceiverio_pytorch_tpu.training.checkpoint import (
    restore_train_state,
    save_train_state,
)

TINY = dict(
    vocab_size=262, max_seq_len=32, embed_dim=16,
    num_self_attends_per_block=1, num_blocks=1,
    num_latents=8, num_latent_channels=64,
)


def test_trainer_fit_logs_and_learns(tmp_path):
    model = LanguagePerceiver(**TINY)
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, 262, (4, 32)), jnp.int32)
    mask = jnp.ones((4, 32), bool)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens, mask)

    def loss_fn(params, tokens, mask):
        logits = model.apply(params, tokens, mask)
        return masked_token_cross_entropy(logits, tokens, mask)

    metrics_path = str(tmp_path / "metrics.jsonl")
    trainer = Trainer(
        loss_fn, optax.adamw(1e-3), metrics_path=metrics_path, log_every=2
    )
    state = trainer.init_state(params)
    state = trainer.fit(state, iter([(tokens, mask)] * 6), num_steps=6)
    assert int(state.step) == 6

    lines = [json.loads(l) for l in open(metrics_path)]
    assert len(lines) == 3
    assert lines[-1]["loss"] < lines[0]["loss"]


def test_multi_step_matches_sequential_steps():
    """make_multi_step (N updates per dispatch via lax.scan) must produce
    the same state and per-step losses as N sequential make_train_step
    calls on the same batches."""
    from perceiverio_pytorch_tpu.training import (
        make_multi_step,
        make_train_step,
    )

    model = LanguagePerceiver(**TINY)
    rng = np.random.RandomState(1)
    n_steps = 3
    tokens = jnp.asarray(rng.randint(0, 262, (n_steps, 4, 32)), jnp.int32)
    mask = jnp.ones((n_steps, 4, 32), bool)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens[0], mask[0])

    def loss_fn(params, tokens, mask):
        logits = model.apply(params, tokens, mask)
        return masked_token_cross_entropy(logits, tokens, mask)

    tx = optax.adamw(1e-3)
    state_a = create_train_state(params, tx)
    step = make_train_step(loss_fn, tx, donate=False)
    losses_seq = []
    for i in range(n_steps):
        state_a, loss = step(state_a, tokens[i], mask[i])
        losses_seq.append(float(loss))

    state_b = create_train_state(params, tx)
    multi = make_multi_step(loss_fn, tx, donate=False)
    state_b, losses = multi(state_b, tokens, mask)

    assert int(state_b.step) == n_steps
    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(losses_seq), rtol=1e-6, atol=1e-7
    )
    flat_a = jax.tree_util.tree_leaves(state_a.params)
    flat_b = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-6, atol=1e-7
        )


def test_trainer_steps_per_call(tmp_path):
    """Trainer(steps_per_call=N) groups batches into one dispatch per N
    updates and still counts steps / fires cadences correctly."""
    model = LanguagePerceiver(**TINY)
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, 262, (4, 32)), jnp.int32)
    mask = jnp.ones((4, 32), bool)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens, mask)

    def loss_fn(params, tokens, mask):
        logits = model.apply(params, tokens, mask)
        return masked_token_cross_entropy(logits, tokens, mask)

    metrics_path = str(tmp_path / "metrics.jsonl")
    trainer = Trainer(
        loss_fn, optax.adamw(1e-3), metrics_path=metrics_path,
        log_every=2, steps_per_call=2,
    )
    state = trainer.init_state(params)
    state = trainer.fit(state, iter([(tokens, mask)] * 6), num_steps=6)
    assert int(state.step) == 6

    lines = [json.loads(l) for l in open(metrics_path)]
    assert [l["step"] for l in lines] == [2, 4, 6]
    assert lines[-1]["loss"] < lines[0]["loss"]


def test_checkpoint_roundtrip(tmp_path):
    model = LanguagePerceiver(**TINY)
    tokens = jnp.zeros((2, 32), jnp.int32)
    mask = jnp.ones((2, 32), bool)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens, mask)
    tx = optax.adamw(1e-3)
    state = create_train_state(params, tx)

    path = str(tmp_path / "ckpt")
    save_train_state(path, state)
    restored = restore_train_state(path, state)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_build_optimizer_schedule_clip_accum():
    """Schedules ramp and decay; clipping bounds the update; MultiSteps
    accumulation over k micro-batches equals one step on the concatenated
    batch (SGD-free check via adamw determinism on identical grads)."""
    import optax
    from perceiverio_pytorch_tpu.training import build_optimizer, build_schedule

    sched = build_schedule(1.0, schedule="cosine", total_steps=100, warmup_steps=10)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(10)) - 1.0) < 1e-6
    assert float(sched(100)) < 0.01
    lin = build_schedule(1.0, schedule="linear", total_steps=100, end_lr_ratio=0.1)
    assert abs(float(lin(100)) - 0.1) < 1e-6
    with pytest.raises(ValueError, match="total_steps"):
        build_schedule(1.0, schedule="cosine")
    with pytest.raises(ValueError, match="schedule must be"):
        build_schedule(1.0, schedule="cosune")

    # clipping: any gradient above the norm cap is rescaled to the cap, so
    # a huge gradient and its norm-1 direction produce identical updates
    params = {"w": jnp.zeros((4,))}
    tx = build_optimizer(1.0, clip_norm=1.0)
    u_big, _ = tx.update({"w": jnp.full((4,), 1e6)}, tx.init(params), params)
    u_unit, _ = tx.update({"w": jnp.full((4,), 0.5)}, tx.init(params), params)
    np.testing.assert_allclose(
        np.asarray(u_big["w"]), np.asarray(u_unit["w"]), rtol=1e-6
    )

    # accumulation: k micro-steps -> exactly one param update, with the
    # averaged gradient
    tx_acc = build_optimizer(1e-1, accum_steps=2)
    tx_ref = build_optimizer(1e-1)
    p = {"w": jnp.ones((3,))}
    st_acc, st_ref = tx_acc.init(p), tx_ref.init(p)
    g1, g2 = {"w": jnp.full((3,), 2.0)}, {"w": jnp.full((3,), 4.0)}
    u1, st_acc = tx_acc.update(g1, st_acc, p)
    assert float(jnp.abs(u1["w"]).max()) == 0.0  # mid-accumulation: no-op
    u2, st_acc = tx_acc.update(g2, st_acc, p)
    g_avg = {"w": jnp.full((3,), 3.0)}
    u_ref, _ = tx_ref.update(g_avg, st_ref, p)
    np.testing.assert_allclose(
        np.asarray(u2["w"]), np.asarray(u_ref["w"]), rtol=1e-6
    )


def test_weight_decay_mask_skips_1d_leaves():
    """weight_decay_mask='non_1d' decays kernels but leaves biases/LN
    scales untouched; adamw and lion honour it; bad strings are rejected."""
    from perceiverio_pytorch_tpu.training import (
        build_optimizer,
        non_1d_weight_decay_mask,
    )

    params = {"w": jnp.ones((2, 2)), "b": jnp.ones((3,))}
    mask = non_1d_weight_decay_mask(params)
    assert mask == {"w": True, "b": False}

    zero_g = {"w": jnp.zeros((2, 2)), "b": jnp.zeros((3,))}
    for name in ("adamw", "lion", "adafactor"):
        tx = build_optimizer(
            0.1, optimizer=name, weight_decay=0.5, weight_decay_mask="non_1d"
        )
        # zero gradients isolate the decay term: masked leaves must not move
        u, _ = tx.update(zero_g, tx.init(params), params)
        assert float(jnp.abs(u["b"]).max()) == 0.0, name
        assert float(jnp.abs(u["w"]).max()) > 0.0, name

    # unmasked control: the bias decays too
    tx_all = build_optimizer(0.1, weight_decay=0.5)
    u_all, _ = tx_all.update(zero_g, tx_all.init(params), params)
    assert float(jnp.abs(u_all["b"]).max()) > 0.0

    with pytest.raises(ValueError, match="weight_decay_mask"):
        build_optimizer(0.1, weight_decay=0.5, weight_decay_mask="non1d")


def test_skip_nonfinite_updates_drops_bad_gradients():
    """A NaN gradient leaves params and moments untouched; finite ones
    still apply; persistent non-finites get accepted after the limit."""
    from perceiverio_pytorch_tpu.training import build_optimizer

    tx = build_optimizer(0.1, skip_nonfinite_updates=2)
    params = {"w": jnp.ones((3,))}
    st = tx.init(params)
    good = {"w": jnp.full((3,), 1.0)}
    bad = {"w": jnp.array([1.0, jnp.nan, 1.0])}

    u, st = tx.update(bad, st, params)
    assert float(jnp.abs(u["w"]).max()) == 0.0  # dropped
    u, st = tx.update(good, st, params)
    assert float(jnp.abs(u["w"]).max()) > 0.0  # finite applies
    # two consecutive bad ones exhaust the limit; the third is accepted
    u, st = tx.update(bad, st, params)
    assert float(jnp.abs(u["w"]).max()) == 0.0
    u, st = tx.update(bad, st, params)
    assert float(jnp.abs(u["w"]).max()) == 0.0
    u, st = tx.update(bad, st, params)
    assert not bool(jnp.isfinite(u["w"]).all())  # surfaced, not masked


def test_skip_nonfinite_composes_with_accumulation():
    """A NaN micro-batch is dropped BEFORE the MultiSteps accumulator: the
    window still emits the update of its good micro-batches only."""
    from perceiverio_pytorch_tpu.training import build_optimizer

    params = {"w": jnp.ones((3,))}
    good1 = {"w": jnp.full((3,), 2.0)}
    good2 = {"w": jnp.full((3,), 4.0)}
    bad = {"w": jnp.array([1.0, jnp.nan, 1.0])}

    tx = build_optimizer(1e-1, accum_steps=2, skip_nonfinite_updates=5)
    st = tx.init(params)
    u, st = tx.update(bad, st, params)  # dropped, accumulator untouched
    assert float(jnp.abs(u["w"]).max()) == 0.0
    u, st = tx.update(good1, st, params)  # mid-accumulation no-op
    assert float(jnp.abs(u["w"]).max()) == 0.0
    u, st = tx.update(good2, st, params)  # window closes: real update

    tx_ref = build_optimizer(1e-1, accum_steps=2)
    st_ref = tx_ref.init(params)
    _, st_ref = tx_ref.update(good1, st_ref, params)
    u_ref, _ = tx_ref.update(good2, st_ref, params)
    np.testing.assert_allclose(
        np.asarray(u["w"]), np.asarray(u_ref["w"]), rtol=1e-6
    )


def test_trainer_eval_hook(tmp_path):
    """eval_fn runs every eval_every steps over the eval batches and lands
    in the JSONL metrics."""
    import json
    import optax

    model = LanguagePerceiver(**TINY)
    tokens = jnp.zeros((2, 32), jnp.int32)
    mask = jnp.ones((2, 32), bool)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens, mask)

    from perceiverio_pytorch_tpu.training import masked_token_cross_entropy

    def loss_fn(params, tokens, mask):
        return masked_token_cross_entropy(
            model.apply(params, tokens, mask), tokens, mask
        )

    metrics_path = str(tmp_path / "m.jsonl")
    trainer = Trainer(
        loss_fn, optax.adamw(1e-3), metrics_path=metrics_path, log_every=2,
        eval_fn=loss_fn, eval_every=2,
    )
    state = trainer.init_state(params)
    state = trainer.fit(
        state, iter([(tokens, mask)] * 4), num_steps=4,
        eval_batches=[(tokens, mask)],
    )
    lines = [json.loads(l) for l in open(metrics_path)]
    evals = [l for l in lines if "eval_loss" in l]
    assert len(evals) == 2 and all(np.isfinite(e["eval_loss"]) for e in evals)


def test_trainer_fsdp_fit_and_checkpoint_roundtrip(tmp_path):
    """Trainer(fsdp=True): ZeRO-3-sharded weights + moments train through
    fit() and survive the Orbax round trip into an equally-sharded
    template."""
    import optax
    from perceiverio_pytorch_tpu.parallel import make_mesh
    from perceiverio_pytorch_tpu.training.checkpoint import (
        restore_train_state,
        save_train_state,
    )

    def loss_fn(params, x, y):
        return jnp.mean((x @ params["w"] - y) ** 2)

    mesh = make_mesh((8, 1))
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(16, 4), jnp.float32)
    y = jnp.asarray(rng.randn(16, 8), jnp.float32)
    params = {"w": rng.randn(4, 8).astype(np.float32)}

    trainer = Trainer(
        loss_fn, optax.adam(1e-3), mesh=mesh, fsdp=True, num_batch_args=2,
        log_every=100,
    )
    state = trainer.init_state(params)
    spec = state.params["w"].sharding.spec
    assert "data" in tuple(spec), spec
    assert state.opt_state[0].mu["w"].sharding == state.params["w"].sharding

    state = trainer.fit(state, iter([(x, y)] * 3), num_steps=3)
    assert int(state.step) == 3

    path = str(tmp_path / "fsdp_ckpt")
    save_train_state(path, state)
    template = trainer.init_state(params)
    restored = restore_train_state(path, template)
    np.testing.assert_array_equal(
        np.asarray(restored.params["w"]), np.asarray(state.params["w"])
    )
    assert restored.params["w"].sharding == state.params["w"].sharding


def test_checkpoint_roundtrip_with_model_state(tmp_path):
    """TrainState.model_state (BatchNorm stats) must survive the Orbax
    round trip; legacy states without model_state still restore."""
    import optax
    from perceiverio_pytorch_tpu.training import create_train_state
    from perceiverio_pytorch_tpu.training.checkpoint import (
        restore_train_state,
        save_train_state,
    )

    params = {"w": jnp.arange(4.0)}
    stats = {"bn": {"mean": jnp.ones((3,)), "var": jnp.full((3,), 2.0)}}
    state = create_train_state(params, optax.adamw(1e-3), model_state=stats)
    path = str(tmp_path / "ck")
    save_train_state(path, state)
    restored = restore_train_state(path, state)
    np.testing.assert_array_equal(
        np.asarray(restored.model_state["bn"]["var"]), np.full((3,), 2.0)
    )

    legacy = create_train_state(params, optax.adamw(1e-3))
    path2 = str(tmp_path / "ck2")
    save_train_state(path2, legacy)
    assert restore_train_state(path2, legacy).model_state is None


def test_flow_train_step_learns():
    """End-to-end flow training: endpoint-error loss decreases over a few
    adamw steps on a repeated batch (tiny config)."""
    import optax

    from perceiverio_pytorch_tpu.models import FlowPerceiver
    from perceiverio_pytorch_tpu.training import (
        flow_endpoint_error,
        make_train_step,
    )

    model = FlowPerceiver(
        img_size=(16, 24), num_latents=8, num_latent_channels=32,
        num_self_attends_per_block=1, num_blocks=1,
    )
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.uniform(-1, 1, (2, 3, 16, 24)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(-1, 1, (2, 3, 16, 24)), jnp.float32)
    gt = jnp.asarray(rng.randn(2, 2, 16, 24) * 0.1, jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img1, img2)

    def loss_fn(p, a, b, flow):
        return flow_endpoint_error(model.apply(p, a, b), flow)

    tx = optax.adamw(1e-3)
    state = create_train_state(params, tx)
    step = make_train_step(loss_fn, tx)
    losses = []
    for _ in range(5):
        state, loss = step(state, img1, img2, gt)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_multimodal_train_step_learns():
    """End-to-end multimodal training with the rematted chunk decode: the
    autoencode loss decreases over a few adamw steps (tiny config)."""
    import optax

    from perceiverio_pytorch_tpu.models import MultiModalPerceiver
    from perceiverio_pytorch_tpu.training import (
        make_train_step,
        multimodal_autoencode_loss,
    )

    model = MultiModalPerceiver(
        img_size=(16, 16), num_frames=2, num_classes=11,
        audio_samples_per_frame=128, audio_samples_per_patch=16,
        num_self_attends_per_block=1, num_blocks=1,
        num_latents=8, num_latent_channels=512, remat=True,
    )
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.rand(1, 2, 3, 16, 16), jnp.float32)
    aud = jnp.asarray(rng.uniform(-1, 1, (1, 256, 1)), jnp.float32)
    lab = jnp.asarray([5], jnp.int32)
    variables = jax.jit(lambda k, i, a: model.init(k, i, a, 4))(
        jax.random.PRNGKey(0), imgs, aud
    )
    consts = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p, i, a, l):
        out = model.apply({"params": p, **consts}, i, a, 4)
        return multimodal_autoencode_loss(
            out, {"image": i, "audio": a, "label": l}
        )

    tx = optax.adamw(1e-4)
    state = create_train_state(variables["params"], tx)
    step = make_train_step(loss_fn, tx)
    losses = []
    for _ in range(5):
        state, loss = step(state, imgs, aud, lab)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_restore_refuses_to_drop_model_state(tmp_path):
    """Restoring a checkpoint that carries model_state with a template that
    has none must raise (silently dropping e.g. BatchNorm batch_stats would
    resume training on freshly-initialised statistics)."""
    import optax

    model = LanguagePerceiver(**TINY)
    tokens = jnp.zeros((2, 32), jnp.int32)
    mask = jnp.ones((2, 32), bool)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens, mask)
    tx = optax.adamw(1e-3)
    state = create_train_state(
        params, tx, model_state={"batch_stats": {"mean": jnp.ones((3,))}}
    )
    path = str(tmp_path / "ck")
    save_train_state(path, state)

    bare = create_train_state(params, tx)  # no model_state
    with pytest.raises(ValueError, match="model_state"):
        restore_train_state(path, bare)


def test_restore_eval_variables_full_variables_params(tmp_path):
    """Trainer checkpoints whose TrainState.params is the FULL variables
    dict (the MLM demo trains directly on model.init's output) must restore
    through restore_eval_variables without double-nesting "params"
    (regression: evaluate_mlm --checkpoint raised
    ApplyScopeInvalidVariablesStructureError)."""
    import optax

    from perceiverio_pytorch_tpu.training.checkpoint import (
        restore_eval_variables,
        save_train_state,
    )

    model = LanguagePerceiver(**TINY)
    tokens = jnp.zeros((2, 32), jnp.int32)
    mask = jnp.ones((2, 32), bool)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), tokens, mask)
    tx = optax.adamw(1e-3)
    # the full variables dict as TrainState.params -- train_mlm convention
    state = create_train_state(variables, tx)
    path = str(tmp_path / "ck")
    save_train_state(path, state)

    template = jax.jit(model.init)(jax.random.PRNGKey(1), tokens, mask)
    restored = restore_eval_variables(template, checkpoint=path)
    assert set(restored) == set(variables)
    assert "params" not in restored["params"]  # no double nesting
    # restored values come from the checkpoint, not the template
    a = jax.tree.leaves(restored["params"])[0]
    b = jax.tree.leaves(variables["params"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the restored tree applies cleanly
    out = jax.jit(model.apply)(restored, tokens, mask)
    assert np.isfinite(np.asarray(out)).all()


def test_classification_train_step_updates_batch_stats():
    """deterministic=False must run BatchNorm in batch-stats mode and allow
    mutable EMA updates through the conv preprocessor."""
    import optax
    from perceiverio_pytorch_tpu.models import ClassificationPerceiver, PrepType
    from perceiverio_pytorch_tpu.training import classification_cross_entropy

    model = ClassificationPerceiver(
        num_classes=5, img_size=(32, 32), num_self_attends_per_block=1,
        num_blocks=1, num_latents=8, num_latent_channels=32,
        prep_type=PrepType.FOURIER_POS_CONVNET,
    )
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(4, 3, 32, 32), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 5, (4,)), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)

    def loss_fn(params, model_state, img, labels):
        logits, mutated = model.apply(
            {"params": params, **model_state},
            img,
            deterministic=False,
            mutable=["batch_stats"],
        )
        return classification_cross_entropy(logits, labels), mutated

    aux = {k: v for k, v in variables.items() if k != "params"}
    (loss, mutated), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(variables["params"], aux, img, labels)
    assert np.isfinite(float(loss))
    # EMA stats must actually move
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )
    # gradients flow into the conv kernel
    conv_grad = grads["perceiver"]["input_preprocessors"]["convnet"]["convs_0"]["kernel"]
    assert float(jnp.abs(conv_grad).sum()) > 0


def test_prefetch_and_epoch_batches():
    from perceiverio_pytorch_tpu.utils.data import epoch_batches, prefetch_to_device

    x = np.arange(20 * 3, dtype=np.float32).reshape(20, 3)
    y = np.arange(20, dtype=np.int32)
    batches = list(epoch_batches((x, y), batch_size=8, shuffle=True, seed=0))
    assert len(batches) == 2  # drop remainder
    assert batches[0][0].shape == (8, 3)

    seen = []
    for bx, by in prefetch_to_device(
        epoch_batches((x, y), batch_size=8, shuffle=False), size=2
    ):
        assert isinstance(bx, jax.Array)
        seen.append(np.asarray(by))
    np.testing.assert_array_equal(np.concatenate(seen), y[:16])


def test_ema_and_metrics_single_chip():
    """EMA params follow the closed-form recurrence; metrics carry the
    true gradient/param norms (checked against a hand jax.grad)."""
    import optax as _optax

    from perceiverio_pytorch_tpu.training import make_train_step

    def loss_fn(params, x, y):
        pred = x @ params["w"]
        return jnp.mean((pred - y) ** 2)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 4), jnp.float32)
    y = jnp.asarray(rng.randn(8, 2), jnp.float32)
    params = {"w": jnp.asarray(rng.randn(4, 2), jnp.float32)}

    tx = optax.sgd(0.1)
    decay = 0.8
    state = create_train_state(params, tx, ema_decay=decay)
    np.testing.assert_array_equal(
        np.asarray(state.ema_params["w"]), np.asarray(params["w"])
    )
    step = make_train_step(
        loss_fn, tx, donate=False, ema_decay=decay, with_metrics=True
    )

    expected_ema = np.asarray(params["w"])
    st = state
    for i in range(3):
        grads = jax.grad(loss_fn)(st.params, x, y)
        expected_gnorm = float(_optax.global_norm(grads))
        st2, metrics = step(st, x, y)
        assert set(metrics) == {"loss", "grad_norm", "param_norm"}
        assert np.isclose(float(metrics["grad_norm"]), expected_gnorm, rtol=1e-5)
        assert np.isclose(
            float(metrics["param_norm"]),
            float(_optax.global_norm(st2.params)),
            rtol=1e-5,
        )
        expected_ema = expected_ema * decay + np.asarray(st2.params["w"]) * (
            1 - decay
        )
        np.testing.assert_allclose(
            np.asarray(st2.ema_params["w"]), expected_ema, rtol=1e-5
        )
        st = st2
    # EMA lags the live params
    assert not np.allclose(np.asarray(st.ema_params["w"]), np.asarray(st.params["w"]))


def test_ema_multi_step_matches_sequential():
    from perceiverio_pytorch_tpu.training import make_multi_step, make_train_step

    def loss_fn(params, x, y):
        return jnp.mean((x @ params["w"] - y) ** 2)

    rng = np.random.RandomState(1)
    xs = jnp.asarray(rng.randn(3, 8, 4), jnp.float32)
    ys = jnp.asarray(rng.randn(3, 8, 2), jnp.float32)
    params = {"w": jnp.asarray(rng.randn(4, 2), jnp.float32)}
    tx = optax.adam(1e-2)

    st_a = create_train_state(params, tx, ema_decay=0.9)
    step = make_train_step(loss_fn, tx, donate=False, ema_decay=0.9)
    for i in range(3):
        st_a, _ = step(st_a, xs[i], ys[i])

    st_b = create_train_state(params, tx, ema_decay=0.9)
    multi = make_multi_step(loss_fn, tx, donate=False, ema_decay=0.9)
    st_b, losses = multi(st_b, xs, ys)

    np.testing.assert_allclose(
        np.asarray(st_a.ema_params["w"]), np.asarray(st_b.ema_params["w"]),
        rtol=1e-6,
    )
    assert losses.shape == (3,)


def test_ema_sharded_and_checkpoint_roundtrip(tmp_path):
    from perceiverio_pytorch_tpu.parallel import make_mesh
    from perceiverio_pytorch_tpu.training import (
        create_sharded_train_state,
        make_sharded_train_step,
    )
    from perceiverio_pytorch_tpu.training.checkpoint import (
        restore_train_state,
        save_train_state,
    )

    def loss_fn(params, x, y):
        return jnp.mean((x @ params["w"] - y) ** 2)

    mesh = make_mesh((8, 1))
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(16, 4), jnp.float32)
    y = jnp.asarray(rng.randn(16, 2), jnp.float32)
    # numpy params: on the virtual CPU mesh, device_put of an already
    # device-resident array may alias its buffer, and the donated step
    # would delete it out from under the template below.
    params = {"w": rng.randn(4, 2).astype(np.float32)}
    tx = optax.adamw(1e-3)

    state = create_sharded_train_state(params, tx, mesh, ema_decay=0.95)
    assert state.ema_params["w"].sharding == state.params["w"].sharding
    step = make_sharded_train_step(
        loss_fn, tx, mesh, state, num_batch_args=2,
        ema_decay=0.95, with_metrics=True,
    )
    state, metrics = step(state, x, y)
    assert float(metrics["grad_norm"]) > 0
    assert not np.allclose(
        np.asarray(state.ema_params["w"]), np.asarray(state.params["w"])
    )

    path = str(tmp_path / "ema_ckpt")
    save_train_state(path, state)
    template = create_sharded_train_state(params, tx, mesh, ema_decay=0.95)
    restored = restore_train_state(path, template)
    np.testing.assert_array_equal(
        np.asarray(restored.ema_params["w"]), np.asarray(state.ema_params["w"])
    )
    assert int(restored.step) == 1


def test_trainer_ema_decay_threads_through():
    def loss_fn(params, x, y):
        return jnp.mean((x @ params["w"] - y) ** 2)

    rng = np.random.RandomState(3)
    xs = rng.randn(16, 4).astype(np.float32)
    ys = rng.randn(16, 2).astype(np.float32)
    params = {"w": jnp.zeros((4, 2))}
    trainer = Trainer(loss_fn, optax.sgd(0.1), log_every=100, ema_decay=0.9)
    state = trainer.init_state(params)
    from perceiverio_pytorch_tpu.training import batch_iterator

    state = trainer.fit(
        state, batch_iterator((xs, ys), 8, epochs=None), num_steps=4
    )
    assert state.ema_params is not None
    assert not np.allclose(
        np.asarray(state.ema_params["w"]), np.asarray(state.params["w"])
    )


def test_trainer_log_grad_norm(tmp_path):
    def loss_fn(params, x, y):
        return jnp.mean((x @ params["w"] - y) ** 2)

    rng = np.random.RandomState(4)
    xs = rng.randn(16, 4).astype(np.float32)
    ys = rng.randn(16, 2).astype(np.float32)
    metrics_path = str(tmp_path / "m.jsonl")
    trainer = Trainer(
        loss_fn, optax.sgd(0.1), log_every=2, metrics_path=metrics_path,
        log_grad_norm=True,
    )
    state = trainer.init_state({"w": jnp.zeros((4, 2))})
    from perceiverio_pytorch_tpu.training import batch_iterator

    trainer.fit(state, batch_iterator((xs, ys), 8, epochs=None), num_steps=4)
    lines = [json.loads(l) for l in open(metrics_path)]
    assert lines and all(
        "grad_norm" in l and "param_norm" in l and l["grad_norm"] > 0
        for l in lines
    )

    with pytest.raises(ValueError, match="steps_per_call"):
        Trainer(loss_fn, optax.sgd(0.1), steps_per_call=4, log_grad_norm=True)


def test_trainer_fsdp_without_mesh_rejected():
    with pytest.raises(ValueError, match="mesh"):
        Trainer(lambda p, x: jnp.sum(x), optax.sgd(0.1), fsdp=True)


def test_async_checkpoint_writer_roundtrip(tmp_path):
    """AsyncCheckpointWriter finalises on wait(): the tree (including
    masked zero-size leaves + sidecar) restores template-free, and a second
    save to the same path overwrites."""
    from perceiverio_pytorch_tpu.training.checkpoint import (
        AsyncCheckpointWriter,
        restore_variables,
    )

    tree = {
        "w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "pad": jnp.zeros((1, 0), jnp.float32),  # zero-size sidecar path
    }
    path = str(tmp_path / "async_ckpt")
    with AsyncCheckpointWriter() as w:
        w.save(path, tree)
        w.wait()
        got = restore_variables(path)
        np.testing.assert_array_equal(np.asarray(got["w"]), np.asarray(tree["w"]))
        assert got["pad"].shape == (1, 0)

        w.save(path, {**tree, "w": tree["w"] + 1}, overwrite=True)
    got2 = restore_variables(path)
    np.testing.assert_array_equal(
        np.asarray(got2["w"]), np.asarray(tree["w"]) + 1
    )


def test_trainer_async_checkpoint_matches_sync_and_resumes(tmp_path):
    """checkpoint_async=True: saves overlap stepping, the in-flight save is
    finalised by fit() before returning, latest_checkpoint sees it, and a
    resumed run matches the uninterrupted control exactly."""
    from perceiverio_pytorch_tpu.training.checkpoint import latest_checkpoint

    def loss_fn(params, x, y):
        return jnp.mean((x @ params["w"] - y) ** 2)

    rng = np.random.RandomState(6)
    batch = (rng.randn(8, 4).astype(np.float32),
             rng.randn(8, 2).astype(np.float32))
    ckpt_dir = str(tmp_path / "ckpts")

    def make_trainer():
        return Trainer(
            loss_fn, optax.sgd(0.1), checkpoint_dir=ckpt_dir,
            checkpoint_every=2, checkpoint_async=True, log_every=100,
        )

    t1 = make_trainer()
    s1 = t1.init_state({"w": jnp.zeros((4, 2))})
    s1 = t1.fit(s1, iter([batch] * 4), num_steps=4)
    assert latest_checkpoint(ckpt_dir).endswith("step_00000004")

    t2 = make_trainer()
    s2 = t2.init_state({"w": jnp.zeros((4, 2))})
    s2 = t2.fit(s2, iter([batch] * 10), num_steps=6, resume=True)
    assert int(s2.step) == 6

    t3 = Trainer(loss_fn, optax.sgd(0.1), log_every=100)
    s3 = t3.init_state({"w": jnp.zeros((4, 2))})
    s3 = t3.fit(s3, iter([batch] * 6), num_steps=6)
    np.testing.assert_allclose(
        np.asarray(s2.params["w"]), np.asarray(s3.params["w"]), rtol=1e-6
    )


def test_trainer_resume_from_latest_checkpoint(tmp_path):
    """fit(resume=True) restores the newest step_XXXXXXXX checkpoint,
    continues counting from it (num_steps = total budget), and matches an
    uninterrupted run on the same batch stream."""
    from perceiverio_pytorch_tpu.training.checkpoint import latest_checkpoint

    def loss_fn(params, x, y):
        return jnp.mean((x @ params["w"] - y) ** 2)

    rng = np.random.RandomState(5)
    x = rng.randn(8, 4).astype(np.float32)
    y = rng.randn(8, 2).astype(np.float32)
    batch = (x, y)
    ckpt_dir = str(tmp_path / "ckpts")

    def make_trainer(metrics_path=None):
        return Trainer(
            loss_fn, optax.sgd(0.1), checkpoint_dir=ckpt_dir,
            checkpoint_every=2, log_every=100, metrics_path=metrics_path,
        )

    # interrupted run: 4 steps, checkpoints at 2 and 4
    t1 = make_trainer()
    s1 = t1.init_state({"w": jnp.zeros((4, 2))})
    s1 = t1.fit(s1, iter([batch] * 4), num_steps=4)
    assert latest_checkpoint(ckpt_dir).endswith("step_00000004")

    # resumed run: fresh template state, total budget 6 -> runs 2 more steps
    metrics_path = str(tmp_path / "resume.jsonl")
    t2 = make_trainer(metrics_path)
    s2 = t2.init_state({"w": jnp.zeros((4, 2))})
    s2 = t2.fit(s2, iter([batch] * 10), num_steps=6, resume=True)
    assert int(s2.step) == 6
    lines = [json.loads(l) for l in open(metrics_path)]
    assert lines[0]["resumed_from"] == "step_00000004"

    # uninterrupted control
    t3 = Trainer(loss_fn, optax.sgd(0.1), log_every=100)
    s3 = t3.init_state({"w": jnp.zeros((4, 2))})
    s3 = t3.fit(s3, iter([batch] * 6), num_steps=6)
    np.testing.assert_allclose(
        np.asarray(s2.params["w"]), np.asarray(s3.params["w"]), rtol=1e-6
    )

    # finished run restarts as a no-op
    s4 = make_trainer().init_state({"w": jnp.zeros((4, 2))})
    s4 = make_trainer().fit(s4, iter([batch] * 10), num_steps=6, resume=True)
    assert int(s4.step) == 6


def test_trainer_preemption_checkpoints_and_resumes(tmp_path):
    """SIGTERM mid-run (spot-VM eviction) completes the in-flight step,
    writes a checkpoint, logs preempted=True, returns early; resume then
    matches an uninterrupted run.  The handler is restored after fit."""
    import os
    import signal

    from perceiverio_pytorch_tpu.training.checkpoint import latest_checkpoint

    def loss_fn(params, x, y):
        return jnp.mean((x @ params["w"] - y) ** 2)

    rng = np.random.RandomState(7)
    x = rng.randn(8, 4).astype(np.float32)
    y = rng.randn(8, 2).astype(np.float32)

    def batches():
        for i in range(10):
            if i == 3:  # delivered while the loop is mid-stream
                os.kill(os.getpid(), signal.SIGTERM)
            yield (x, y)

    ckpt_dir = str(tmp_path / "ckpts")
    metrics_path = str(tmp_path / "preempt.jsonl")
    prev_handler = signal.getsignal(signal.SIGTERM)
    t1 = Trainer(
        loss_fn, optax.sgd(0.1), checkpoint_dir=ckpt_dir, log_every=100,
        metrics_path=metrics_path,
    )
    s1 = t1.init_state({"w": jnp.zeros((4, 2))})
    s1 = t1.fit(s1, batches(), num_steps=10)
    assert signal.getsignal(signal.SIGTERM) is prev_handler
    # the signal fired while batch 3 (0-based) was being fetched; that step
    # still ran, then the loop stopped: 4 of the 10 budgeted steps.
    assert int(s1.step) == 4
    assert latest_checkpoint(ckpt_dir).endswith("step_00000004")
    lines = [json.loads(l) for l in open(metrics_path)]
    assert lines[-1] == {"step": 4, "preempted": True}

    # resume to the full budget and match an uninterrupted control run
    t2 = Trainer(
        loss_fn, optax.sgd(0.1), checkpoint_dir=ckpt_dir, log_every=100
    )
    s2 = t2.init_state({"w": jnp.zeros((4, 2))})
    s2 = t2.fit(s2, iter([(x, y)] * 10), num_steps=6, resume=True)
    assert int(s2.step) == 6
    t3 = Trainer(loss_fn, optax.sgd(0.1), log_every=100)
    s3 = t3.init_state({"w": jnp.zeros((4, 2))})
    s3 = t3.fit(s3, iter([(x, y)] * 6), num_steps=6)
    np.testing.assert_allclose(
        np.asarray(s2.params["w"]), np.asarray(s3.params["w"]), rtol=1e-6
    )


def test_lr_schedule_logging(tmp_path):
    """Trainer(lr_schedule=) logs the per-step learning rate."""
    import json

    from perceiverio_pytorch_tpu.training import build_optimizer, build_schedule

    def loss_fn(params, x, y):
        return jnp.mean((x @ params["w"] - y) ** 2)

    rng = np.random.RandomState(11)
    x = rng.randn(8, 4).astype(np.float32)
    y = rng.randn(8, 2).astype(np.float32)
    sched = build_schedule(1.0, schedule="linear", total_steps=4)
    metrics_path = str(tmp_path / "m.jsonl")
    t = Trainer(
        loss_fn,
        build_optimizer(1.0, schedule="linear", total_steps=4),
        log_every=1, metrics_path=metrics_path, lr_schedule=sched,
    )
    s = t.init_state({"w": jnp.zeros((4, 2))})
    t.fit(s, iter([(x, y)] * 4), num_steps=4)
    lines = [json.loads(l) for l in open(metrics_path)]
    lrs = [l["lr"] for l in lines if "lr" in l]
    assert len(lrs) == 4
    np.testing.assert_allclose(
        lrs, [float(sched(i)) for i in range(4)], rtol=1e-6
    )


def test_trainable_mask_freezes_parameters():
    """trainable_mask=False leaves get zero updates and no moment state;
    composes with clipping and a Trainer end to end."""
    from perceiverio_pytorch_tpu.training import build_optimizer

    params = {"head": jnp.ones((2, 2)), "body": jnp.ones((3,))}
    grads = {"head": jnp.full((2, 2), 0.5), "body": jnp.full((3,), 0.5)}
    tx = build_optimizer(
        0.1, clip_norm=1.0, trainable_mask={"head": True, "body": False}
    )
    st = tx.init(params)
    u, st = tx.update(grads, st, params)
    assert float(jnp.abs(u["head"]).max()) > 0.0
    assert float(jnp.abs(u["body"]).max()) == 0.0
    # no adam moments allocated for the frozen leaf
    leaves = jax.tree_util.tree_leaves(st)
    assert not any(
        getattr(l, "shape", None) == (3,) for l in leaves
    ), "frozen leaf has optimizer state"

    # callable mask + Trainer: the frozen subtree is bit-identical after fit
    def loss_fn(p, x, y):
        return jnp.mean((x @ p["w"] @ p["head"] - y) ** 2)

    rng = np.random.RandomState(10)
    x = rng.randn(8, 4).astype(np.float32)
    y = rng.randn(8, 2).astype(np.float32)
    p0 = {
        "w": jnp.asarray(rng.randn(4, 3), jnp.float32),
        "head": jnp.asarray(rng.randn(3, 2), jnp.float32),
    }
    tx2 = build_optimizer(
        0.05,
        trainable_mask=lambda p: jax.tree_util.tree_map_with_path(
            lambda path, _: "head" in jax.tree_util.keystr(path), p
        ),
    )
    w0 = np.asarray(p0["w"]).copy()  # donated by the first step otherwise
    head0 = np.asarray(p0["head"]).copy()
    t = Trainer(loss_fn, tx2, log_every=100)
    s = t.init_state(p0)
    s = t.fit(s, iter([(x, y)] * 5), num_steps=5)
    np.testing.assert_array_equal(np.asarray(s.params["w"]), w0)
    assert float(np.abs(np.asarray(s.params["head"]) - head0).max()) > 0.0


def test_eval_fn_metric_dicts(tmp_path):
    """eval_fn may return {name: scalar}: means are logged per key; the
    scalar form keeps its eval_loss name and float return."""
    import json

    def loss_fn(params, x, y):
        return jnp.mean((x @ params["w"] - y) ** 2)

    def eval_fn(params, x, y):
        err = x @ params["w"] - y
        return {"eval_mse": jnp.mean(err**2), "eval_mae": jnp.mean(jnp.abs(err))}

    rng = np.random.RandomState(9)
    x = rng.randn(8, 4).astype(np.float32)
    y = rng.randn(8, 2).astype(np.float32)
    metrics_path = str(tmp_path / "m.jsonl")
    t = Trainer(
        loss_fn, optax.sgd(0.1), log_every=100, metrics_path=metrics_path,
        eval_fn=eval_fn, eval_every=2,
    )
    s = t.init_state({"w": jnp.zeros((4, 2))})
    s = t.fit(s, iter([(x, y)] * 4), num_steps=4, eval_batches=[(x, y)])

    ev = t.evaluate(s, [(x, y)])
    assert set(ev) == {"eval_mse", "eval_mae"}
    lines = [json.loads(l) for l in open(metrics_path)]
    dict_lines = [l for l in lines if "eval_mse" in l]
    assert len(dict_lines) == 2 and all("eval_mae" in l for l in dict_lines)

    # scalar eval_fn keeps the old contract
    t2 = Trainer(loss_fn, optax.sgd(0.1), eval_fn=loss_fn)
    s2 = t2.init_state({"w": jnp.zeros((4, 2))})
    assert isinstance(t2.evaluate(s2, [(x, y)]), float)


def test_checkpoint_retention_and_final_save(tmp_path):
    """checkpoint_keep prunes to the newest N (sweeping stale partial
    saves); checkpoint_final checkpoints off-grid ends; resume still works
    from the pruned directory."""
    import os

    from perceiverio_pytorch_tpu.training.checkpoint import (
        latest_checkpoint,
        prune_checkpoints,
    )

    def loss_fn(params, x, y):
        return jnp.mean((x @ params["w"] - y) ** 2)

    rng = np.random.RandomState(8)
    x = rng.randn(8, 4).astype(np.float32)
    y = rng.randn(8, 2).astype(np.float32)
    ckpt_dir = str(tmp_path / "ckpts")

    # a stale unfinalized leftover (crash mid-save at step 2)
    os.makedirs(os.path.join(ckpt_dir, "step_00000002"))

    t = Trainer(
        loss_fn, optax.sgd(0.1), checkpoint_dir=ckpt_dir, log_every=100,
        checkpoint_every=4, checkpoint_keep=2, checkpoint_final=True,
    )
    s = t.init_state({"w": jnp.zeros((4, 2))})
    s = t.fit(s, iter([(x, y)] * 14), num_steps=14)
    # periodic saves at 4, 8, 12 + final save at 14, pruned to the newest
    # two throughout; the stale step_2 partial is swept
    names = sorted(n for n in os.listdir(ckpt_dir) if n.startswith("step_"))
    assert names == ["step_00000012", "step_00000014"]
    assert latest_checkpoint(ckpt_dir).endswith("step_00000014")

    # resume from the pruned dir continues to a larger budget
    t2 = Trainer(
        loss_fn, optax.sgd(0.1), checkpoint_dir=ckpt_dir, log_every=100,
        checkpoint_final=True,
    )
    s2 = t2.init_state({"w": jnp.zeros((4, 2))})
    s2 = t2.fit(s2, iter([(x, y)] * 10), num_steps=16, resume=True)
    assert int(s2.step) == 16
    assert latest_checkpoint(ckpt_dir).endswith("step_00000016")

    # a finished run restarted with checkpoint_final does NOT re-save
    # (zero steps ran): the newest checkpoint is untouched
    before = os.path.getmtime(latest_checkpoint(ckpt_dir))
    s3 = t2.init_state({"w": jnp.zeros((4, 2))})
    t2.fit(s3, iter([(x, y)] * 4), num_steps=16, resume=True)
    assert os.path.getmtime(latest_checkpoint(ckpt_dir)) == before

    with pytest.raises(ValueError, match="keep must be positive"):
        prune_checkpoints(ckpt_dir, 0)


def test_evaluate_uses_ema_params_when_present():
    """With ema_decay, the periodic eval runs on the averaged weights; an
    eval_fn that depends on params distinguishes the two."""

    def loss_fn(params, x, y):
        return jnp.mean((x @ params["w"] - y) ** 2)

    rng = np.random.RandomState(6)
    x = rng.randn(8, 4).astype(np.float32)
    y = rng.randn(8, 2).astype(np.float32)
    trainer = Trainer(
        loss_fn, optax.sgd(0.1), log_every=100, ema_decay=0.5,
        eval_fn=loss_fn,
    )
    state = trainer.init_state({"w": jnp.zeros((4, 2))})
    state = trainer.fit(state, iter([(x, y)] * 5), num_steps=5)

    ev_default = trainer.evaluate(state, [(x, y)])
    ev_ema = trainer.evaluate(state, [(x, y)], use_ema=True)
    ev_live = trainer.evaluate(state, [(x, y)], use_ema=False)
    assert ev_default == ev_ema  # EMA is the default when present
    assert ev_ema != ev_live  # averaged weights lag the live ones

    # without EMA, asking for it is an error
    t2 = Trainer(loss_fn, optax.sgd(0.1), eval_fn=loss_fn)
    s2 = t2.init_state({"w": jnp.zeros((4, 2))})
    with pytest.raises(ValueError, match="ema_params"):
        t2.evaluate(s2, [(x, y)], use_ema=True)


def test_restore_refuses_ema_template_mismatch(tmp_path):
    """Both directions of the EMA template/checkpoint mismatch fail loudly
    instead of silently dropping (or obscurely missing) the averaged
    weights."""
    def loss_fn(params, x, y):
        return jnp.mean((x @ params["w"] - y) ** 2)

    params = {"w": jnp.zeros((4, 2))}
    tx = optax.sgd(0.1)
    with_ema = create_train_state(params, tx, ema_decay=0.9)
    without_ema = create_train_state(params, tx)

    p1 = str(tmp_path / "with_ema")
    save_train_state(p1, with_ema)
    with pytest.raises(ValueError, match="contains 'ema_params'"):
        restore_train_state(p1, without_ema)

    p2 = str(tmp_path / "without_ema")
    save_train_state(p2, without_ema)
    with pytest.raises(ValueError, match="expects 'ema_params'"):
        restore_train_state(p2, with_ema)


def test_latest_checkpoint_skips_unfinalized(tmp_path):
    from perceiverio_pytorch_tpu.training.checkpoint import latest_checkpoint

    params = {"w": jnp.zeros((2,))}
    state = create_train_state(params, optax.sgd(0.1))
    good = str(tmp_path / "step_00000002")
    save_train_state(good, state)
    # newer but unfinalized (non-empty, no orbax finalization marker)
    broken = tmp_path / "step_00000004"
    broken.mkdir()
    (broken / "d").mkdir()
    assert latest_checkpoint(str(tmp_path)) == good


def test_template_free_restore_zero_size_in_sequence(tmp_path):
    """Zero-size leaves inside tuple state (sequence path keys) survive a
    template-free restore -- orbax's dict layout uses string keys there."""
    from perceiverio_pytorch_tpu.training.checkpoint import (
        restore_variables,
        save_variables,
    )

    tree = {"opt": ({"mu": jnp.zeros((1, 0), jnp.float32)},
                    {"nu": jnp.ones((2,), jnp.float32)})}
    path = str(tmp_path / "seq")
    save_variables(path, tree)
    restored = restore_variables(path)  # no template
    leaves = jax.tree_util.tree_leaves(restored)
    shapes = sorted(tuple(l.shape) for l in leaves)
    assert (1, 0) in shapes


def test_prefetch_consumer_drop_stops_worker():
    import threading
    import time as _time

    from perceiverio_pytorch_tpu.training import prefetch_to_device

    # snapshot thread OBJECTS: filtering by name against a name-set passes
    # vacuously when an earlier test's worker (same name) is still draining
    before = set(threading.enumerate())
    it = prefetch_to_device(iter([(np.zeros(2),)] * 10), size=2)
    next(it)
    it.close()  # consumer walks away mid-stream
    deadline = _time.time() + 5.0
    while _time.time() < deadline:
        alive = [
            t for t in threading.enumerate()
            if t.name == "prefetch_to_device" and t not in before
        ]
        if not alive:
            break
        _time.sleep(0.05)
    assert not alive, "prefetch worker thread leaked after consumer drop"


def test_batch_iterator_accepts_python_lists():
    from perceiverio_pytorch_tpu.utils.data import epoch_batches

    batches = list(epoch_batches(([1.0, 2.0, 3.0, 4.0], [0, 1, 0, 1]), 2,
                                 shuffle=False))
    assert len(batches) == 2
    np.testing.assert_array_equal(batches[0][0], [1.0, 2.0])


def test_ema_step_with_ema_free_state_raises():
    from perceiverio_pytorch_tpu.training import make_train_step

    def loss_fn(params, x):
        return jnp.sum(params["w"] * x)

    tx = optax.sgd(0.1)
    state = create_train_state({"w": jnp.ones((2,))}, tx)  # no ema
    step = make_train_step(loss_fn, tx, ema_decay=0.9)
    with pytest.raises(ValueError, match="ema_decay"):
        step(state, jnp.ones((2,)))


def test_fit_resume_without_checkpoint_dir_raises():
    def loss_fn(params, x):
        return jnp.sum(params["w"] * x)

    trainer = Trainer(loss_fn, optax.sgd(0.1))
    state = trainer.init_state({"w": jnp.ones((2,))})
    with pytest.raises(ValueError, match="checkpoint_dir"):
        trainer.fit(state, iter([(jnp.ones((2,)),)]), num_steps=1, resume=True)


def test_build_optimizer_variants_step_and_reduce_loss():
    """Each optimizer family drives the toy loss down and carries a state
    shape the sharded builders can init (plain GradientTransformation)."""
    from perceiverio_pytorch_tpu.training import build_optimizer, make_train_step

    def loss_fn(params, x, y):
        return jnp.mean((x @ params["w"] - y) ** 2)

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(16, 4), jnp.float32)
    w_true = rng.randn(4, 2).astype(np.float32)
    y = jnp.asarray(x @ w_true, jnp.float32)

    for name in ("adamw", "adafactor", "lion", "sgd"):
        tx = build_optimizer(1e-2, optimizer=name, clip_norm=1.0)
        state = create_train_state({"w": jnp.zeros((4, 2))}, tx)
        step = make_train_step(loss_fn, tx, donate=False)
        first = None
        for _ in range(20):
            state, loss = step(state, x, y)
            first = float(loss) if first is None else first
        assert float(loss) < first, f"{name} did not reduce the loss"

    with pytest.raises(ValueError, match="optimizer must be"):
        build_optimizer(1e-2, optimizer="adan")


def test_resume_overwrites_unfinalized_checkpoint(tmp_path):
    """Crash-mid-save scenario: the newest step dir exists but was never
    finalized; resume picks the previous good one, and re-reaching the
    crashed step re-saves over the leftover directory."""
    from perceiverio_pytorch_tpu.training.checkpoint import latest_checkpoint

    def loss_fn(params, x, y):
        return jnp.mean((x @ params["w"] - y) ** 2)

    rng = np.random.RandomState(8)
    batch = (rng.randn(8, 4).astype(np.float32),
             rng.randn(8, 2).astype(np.float32))
    ckpt_dir = str(tmp_path / "ckpts")

    def make_trainer():
        return Trainer(loss_fn, optax.sgd(0.1), checkpoint_dir=ckpt_dir,
                       checkpoint_every=2, log_every=100)

    t1 = make_trainer()
    s1 = t1.init_state({"w": jnp.zeros((4, 2))})
    t1.fit(s1, iter([batch] * 6), num_steps=6)  # ckpts at 2, 4, 6

    # simulate the crash: step_00000006 exists but never finalized
    os.remove(os.path.join(ckpt_dir, "step_00000006", "_CHECKPOINT_METADATA"))
    assert latest_checkpoint(ckpt_dir).endswith("step_00000004")

    t2 = make_trainer()
    s2 = t2.init_state({"w": jnp.zeros((4, 2))})
    s2 = t2.fit(s2, iter([batch] * 10), num_steps=6, resume=True)
    assert int(s2.step) == 6
    # the re-save finalized the once-broken checkpoint
    assert latest_checkpoint(ckpt_dir).endswith("step_00000006")


def test_multimodal_loss_partial_weights():
    """A partial weights dict applies defaults to unnamed modalities; an
    explicit weight scales only its own term."""
    from perceiverio_pytorch_tpu.training import multimodal_autoencode_loss

    rng = np.random.RandomState(12)
    outputs = {
        "image": jnp.asarray(rng.randn(2, 8), jnp.float32),
        "label": jnp.asarray(rng.randn(2, 5), jnp.float32),
    }
    targets = {
        "image": jnp.asarray(rng.randn(2, 8), jnp.float32),
        "label": jnp.asarray([1, 3]),
    }
    base = float(multimodal_autoencode_loss(outputs, targets))
    only_label = float(
        multimodal_autoencode_loss(outputs, targets, weights={"label": 2.0})
    )
    img_term = float(jnp.mean((outputs["image"] - targets["image"]) ** 2))
    np.testing.assert_allclose(only_label - base, base - img_term, rtol=1e-5)


def test_template_free_train_state_restore_unmasks_namedtuple_paths(tmp_path):
    """Template-free restore of a Trainer checkpoint whose zero-size leaves
    sit inside optax namedtuple state (recorded as '.mu'/'.nu' by the
    save-time keypath formatting, plain 'mu'/'nu' in orbax's layout) --
    regression for the evaluate-from-checkpoint path."""
    import jax.numpy as jnp
    import optax as _optax

    from perceiverio_pytorch_tpu.training import create_train_state
    from perceiverio_pytorch_tpu.training.checkpoint import (
        restore_variables,
        save_train_state,
    )

    params = {"w": jnp.ones((2, 3)), "pad": jnp.zeros((1, 0))}
    state = create_train_state(params, _optax.adam(1e-3))
    save_train_state(str(tmp_path / "ck"), state)
    tree = restore_variables(str(tmp_path / "ck"))  # NO template
    assert tree["params"]["pad"].shape == (1, 0)
    zero_leaves = [
        l for l in jax.tree_util.tree_leaves(tree)
        if hasattr(l, "shape") and l.shape == (1, 0)
    ]
    # params + adam mu + adam nu
    assert len(zero_leaves) == 3
