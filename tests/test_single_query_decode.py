"""Single-query classification decode (models/classification.py).

The reference decodes all num_classes trainable queries and keeps row 0
(classification_perceiver.py:103-125, postprocessors.py:187); decoding only
row 0 must be numerically identical because every decoder stage
(LayerNorm, Q projection, attention softmax, final Dense) is row-independent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceiverio_pytorch_tpu.core.queries import BasicQuery, TrainableQuery
from perceiverio_pytorch_tpu.models.classification import (
    ClassificationPerceiver,
    PrepType,
)

SMALL = dict(
    num_classes=16,
    img_size=(32, 32),
    num_self_attends_per_block=1,
    num_blocks=1,
    num_latents=8,
    num_latent_channels=64,
)


def test_trainable_query_subsampling_gathers_rows():
    """subsampled_points on a TRAINABLE query selects table rows (the
    reference silently returns the full table -- a latent no-op)."""
    q = TrainableQuery(output_index_dims=10, num_channels=8)
    dummy = jnp.zeros((2, 3))
    params = q.init(jax.random.PRNGKey(0), dummy)
    full = q.apply(params, dummy)
    assert full.shape == (2, 10, 8)
    idx = jnp.asarray([7, 0, 3])
    sub = q.apply(params, dummy, subsampled_points=idx)
    np.testing.assert_array_equal(
        np.asarray(sub), np.asarray(full[:, np.asarray(idx), :])
    )


@pytest.mark.parametrize(
    "prep", [PrepType.FOURIER_POS_CONVNET, PrepType.LEARNED_POS_1X1CONV]
)
def test_single_query_decode_matches_full_decode(prep):
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 3, 32, 32), jnp.float32)

    fast = ClassificationPerceiver(prep_type=prep, single_query_decode=True,
                                   **SMALL)
    slow = ClassificationPerceiver(prep_type=prep, single_query_decode=False,
                                   **SMALL)
    variables = jax.jit(fast.init)(jax.random.PRNGKey(0), img)
    out_fast = jax.jit(fast.apply)(variables, img)
    out_slow = jax.jit(slow.apply)(variables, img)
    assert out_fast.shape == out_slow.shape == (2, 16)
    np.testing.assert_allclose(
        np.asarray(out_fast), np.asarray(out_slow), rtol=1e-6, atol=1e-6
    )


def test_single_query_decode_param_tree_unchanged():
    """The full [num_classes, C] query table must survive (checkpoint
    compatibility): only the apply-time decode shrinks."""
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, 3, 32, 32), jnp.float32)
    fast = ClassificationPerceiver(single_query_decode=True, **SMALL)
    slow = ClassificationPerceiver(single_query_decode=False, **SMALL)
    pf = jax.jit(fast.init)(jax.random.PRNGKey(0), img)
    ps = jax.jit(slow.init)(jax.random.PRNGKey(0), img)
    sf = jax.tree_util.tree_map(lambda x: (x.shape, str(x.dtype)), pf)
    ss = jax.tree_util.tree_map(lambda x: (x.shape, str(x.dtype)), ps)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a == b, sf, ss)
    )


def test_language_predict_positions_matches_full_decode():
    """LanguagePerceiver(predict_positions=...) returns exactly the selected
    rows of the full [B, T, vocab] logits, including under a padding mask."""
    from perceiverio_pytorch_tpu.models import LanguagePerceiver

    model = LanguagePerceiver(
        vocab_size=262, max_seq_len=32, embed_dim=16,
        num_self_attends_per_block=1, num_blocks=1,
        num_latents=8, num_latent_channels=64,
    )
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, 262, (2, 32)), jnp.int32)
    mask = jnp.asarray(rng.rand(2, 32) > 0.2)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens, mask)

    full = jax.jit(model.apply)(params, tokens, mask)
    positions = jnp.asarray([5, 0, 31, 17])
    sub = jax.jit(
        lambda p, t, m: model.apply(p, t, m, predict_positions=positions)
    )(params, tokens, mask)
    assert sub.shape == (2, 4, 262)
    np.testing.assert_allclose(
        np.asarray(sub), np.asarray(full[:, np.asarray(positions), :]),
        rtol=1e-5, atol=1e-6,
    )


def test_single_query_decode_gradients_match_full_decode():
    """Training through the 1-row decode gives the same gradients: rows
    1..N-1 of the query table receive zero grad either way."""
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 3, 32, 32), jnp.float32)
    labels = jnp.asarray([3, 5])

    fast = ClassificationPerceiver(single_query_decode=True, **SMALL)
    slow = ClassificationPerceiver(single_query_decode=False, **SMALL)
    variables = jax.jit(fast.init)(jax.random.PRNGKey(0), img)

    def loss(model):
        def f(params):
            logits = model.apply(
                {**variables, "params": params}, img,
                deterministic=True,
            )
            lp = jax.nn.log_softmax(logits)
            return -lp[jnp.arange(2), labels].mean()

        return jax.jit(jax.grad(f))(variables["params"])

    gf, gs = loss(fast), loss(slow)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(gf)[0],
        jax.tree_util.tree_flatten_with_path(gs)[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6,
            err_msg=str(pa),
        )
