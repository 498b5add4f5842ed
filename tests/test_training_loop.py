"""Trainer loop + orbax checkpoint round-trip."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

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
