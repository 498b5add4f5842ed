"""LoRA parameter-efficient fine-tuning (training/lora.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from perceiverio_pytorch_tpu.models import LanguagePerceiver
from perceiverio_pytorch_tpu.training import (
    Trainer,
    init_lora,
    lora_paths,
    masked_token_cross_entropy,
    merge_lora,
    wrap_loss,
)
from perceiverio_pytorch_tpu.training.checkpoint import (
    restore_train_state,
    save_train_state,
)

TINY = dict(
    vocab_size=262, max_seq_len=32, embed_dim=16,
    num_self_attends_per_block=2, num_blocks=1,
    num_latents=8, num_latent_channels=64,
)


def _tiny():
    model = LanguagePerceiver(**TINY)
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, 262, (4, 32)), jnp.int32)
    mask = jnp.ones((4, 32), bool)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens, mask)
    return model, params, tokens, mask


def test_fresh_adapter_merges_to_identity():
    """b is zero-initialised, so merge(base, init_lora(...)) == base exactly
    and the merged forward is bit-identical to the base forward."""
    model, params, tokens, mask = _tiny()
    lora = init_lora(jax.random.PRNGKey(1), params["params"], rank=4)
    merged = merge_lora(params["params"], lora)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params["params"])[0],
        jax.tree_util.tree_flatten_with_path(merged)[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_default_targets_select_attention_and_mlp_only():
    model, params, tokens, mask = _tiny()
    lora = init_lora(jax.random.PRNGKey(1), params["params"], rank=2)
    paths = lora_paths(lora)
    assert paths, "no adapters selected"
    for p in paths:
        leafname = p.rsplit("/", 2)[-2]
        assert leafname in ("proj_q", "proj_k", "proj_v", "final", "fc1", "fc2")
    # the embedding table and layernorms carry no adapter
    assert not any("embed" in p for p in paths)
    # every adapter has the right shapes
    for kpath, leaf in jax.tree_util.tree_flatten_with_path(lora)[0]:
        names = [str(getattr(k, "key", k)) for k in kpath]
        assert names[-1] in ("a", "b")
        assert leaf.ndim == 2
        if names[-1] == "a":
            assert leaf.shape[1] == 2
        else:
            assert leaf.shape[0] == 2
            np.testing.assert_array_equal(np.asarray(leaf), 0.0)


def test_targets_subset_and_no_match_raises():
    model, params, tokens, mask = _tiny()
    lora = init_lora(
        jax.random.PRNGKey(1), params["params"], rank=2, targets=("proj_q",)
    )
    assert all(p.rsplit("/", 2)[-2] == "proj_q" for p in lora_paths(lora))
    with pytest.raises(ValueError, match="matched no kernels"):
        init_lora(jax.random.PRNGKey(1), params["params"], rank=2,
                  targets=("nonexistent_module",))


def test_merge_rejects_foreign_adapter_paths():
    model, params, tokens, mask = _tiny()
    lora = init_lora(jax.random.PRNGKey(1), params["params"], rank=2)
    with pytest.raises(ValueError, match="absent from params"):
        merge_lora({"embed_only": params["params"]["embed"]}, lora)


def test_lora_training_learns_and_freezes_base():
    """Trainer over the adapter tree: loss decreases, base params are
    untouched (frozen by construction), merged output moves."""
    model, params, tokens, mask = _tiny()
    base = params["params"]
    base_copy = jax.tree_util.tree_map(np.asarray, base)

    def loss_fn(p, tokens, mask):
        logits = model.apply({"params": p}, tokens, mask)
        return masked_token_cross_entropy(logits, tokens, mask)

    lora = init_lora(jax.random.PRNGKey(1), base, rank=4)
    trainer = Trainer(wrap_loss(loss_fn, base), optax.adamw(1e-2))
    state = trainer.init_state(lora)
    loss0 = float(jax.jit(wrap_loss(loss_fn, base))(lora, tokens, mask))
    state = trainer.fit(state, iter([(tokens, mask)] * 8), num_steps=8)
    loss1 = float(
        jax.jit(wrap_loss(loss_fn, base))(state.params, tokens, mask)
    )
    assert loss1 < loss0

    # base params never moved
    for a, b in zip(jax.tree_util.tree_leaves(base_copy),
                    jax.tree_util.tree_leaves(base)):
        np.testing.assert_array_equal(a, np.asarray(b))

    # merged model differs from base model after training
    out_base = jax.jit(model.apply)({"params": base}, tokens, mask)
    merged = merge_lora(base, state.params)
    out_merged = jax.jit(model.apply)({"params": merged}, tokens, mask)
    assert float(jnp.abs(out_merged - out_base).max()) > 0

    # optimizer state is adapter-sized (tiny fixture: ~10%; at the shipped
    # configs the kernels are 1024x1024-scale so rank-4 adapters are <1%)
    n_base = sum(x.size for x in jax.tree_util.tree_leaves(base))
    n_lora = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    assert n_lora < n_base / 5


def test_lora_state_checkpoint_roundtrip(tmp_path):
    model, params, tokens, mask = _tiny()
    base = params["params"]

    def loss_fn(p, tokens, mask):
        logits = model.apply({"params": p}, tokens, mask)
        return masked_token_cross_entropy(logits, tokens, mask)

    lora = init_lora(jax.random.PRNGKey(1), base, rank=4)
    trainer = Trainer(wrap_loss(loss_fn, base), optax.adamw(1e-2))
    state = trainer.init_state(lora)
    state = trainer.fit(state, iter([(tokens, mask)] * 2), num_steps=2)
    save_train_state(str(tmp_path / "ck"), state)
    restored = restore_train_state(str(tmp_path / "ck"), state)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_alpha_scales_delta_linearly():
    model, params, tokens, mask = _tiny()
    base = params["params"]
    lora = init_lora(jax.random.PRNGKey(1), base, rank=4)
    # give b a nonzero value so the delta is visible
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.01 if x.shape[0] == 4 else x, lora
    )
    m1 = merge_lora(base, lora, alpha=4.0)   # == default (rank 4)
    m2 = merge_lora(base, lora, alpha=8.0)
    d1 = jax.tree_util.tree_map(lambda a, b: np.asarray(a - b), m1, base)
    d2 = jax.tree_util.tree_map(lambda a, b: np.asarray(a - b), m2, base)
    for a, b in zip(jax.tree_util.tree_leaves(d1), jax.tree_util.tree_leaves(d2)):
        np.testing.assert_allclose(2.0 * a, b, rtol=1e-5, atol=1e-7)
