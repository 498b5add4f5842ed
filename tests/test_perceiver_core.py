"""Core PerceiverIO invariants: restructure ordering, channel padding,
decoder-query assembly, encode/decode split, subsampled decoding, masking.
(Reference semantics: /root/reference/perceiver_io/perceiver.py.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceiverio_pytorch_tpu import (
    PerceiverIO,
    TrainableQuery,
    restructure,
)
from perceiverio_pytorch_tpu.core.queries import FourierQuery
from perceiverio_pytorch_tpu.io_processors import OneHotPreprocessor


def test_restructure_sorted_order():
    x = jnp.arange(2 * 6 * 3).reshape(2, 6, 3)
    out = restructure({"b": 4, "a": 2}, x)
    # 'a' first (sorted), taking the first 2 tokens
    np.testing.assert_array_equal(np.asarray(out["a"]), np.asarray(x[:, :2]))
    np.testing.assert_array_equal(np.asarray(out["b"]), np.asarray(x[:, 2:6]))


def _tiny_io(**overrides):
    kwargs = dict(
        num_blocks=1,
        num_self_attends_per_block=1,
        num_latents=4,
        num_latent_channels=32,
        final_project=True,
        final_project_out_channels=8,
        input_channels={"x": 12, "y": 16},
        input_padding_channels=2,
        output_queries={
            "x": TrainableQuery(output_index_dims=3, num_channels=16),
            "y": TrainableQuery(output_index_dims=5, num_channels=24),
        },
        output_query_padding_channels=1,
    )
    kwargs.update(overrides)
    return PerceiverIO(**kwargs)


def test_multimodal_channel_padding_and_query_assembly():
    model = _tiny_io()
    inputs = {
        "x": jnp.ones((2, 7, 12)),
        "y": jnp.ones((2, 9, 16)),
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(0), inputs)
    out = jax.jit(model.apply)(params, inputs)
    # without postprocessors the raw [B, N_q, C] decode is returned
    # (reference: perceiver.py:312-319 only restructures for postprocessors);
    # total queries = 3 (x) + 5 (y) in sorted order
    assert out.shape == (2, 8, 8)
    # query channels = max(16, 24) + 1 padding
    flat = params["params"]
    assert flat["padding_embeddings_x"]["pos_embs"].shape == (1, 25 - 16)
    assert flat["padding_embeddings_y"]["pos_embs"].shape == (1, 25 - 24)
    # input common channels = max(12, 16) + 2
    enc_kv_ln = flat["encoder"]["cross_attend"]["layer_norm_kv"]["scale"]
    assert enc_kv_ln.shape == (18,)


def test_query_only_modality_gets_dummy_input():
    """A query for a modality with no input must still decode
    (perceiver.py:335-339)."""
    model = _tiny_io(
        output_queries={
            "x": TrainableQuery(output_index_dims=3, num_channels=16),
            "z": TrainableQuery(output_index_dims=2, num_channels=8),
        },
    )
    inputs = {"x": jnp.ones((2, 7, 12)), "y": jnp.ones((2, 9, 16))}
    params = jax.jit(model.init)(jax.random.PRNGKey(0), inputs)
    out = jax.jit(model.apply)(params, inputs)
    assert out.shape == (2, 5, 8)  # 3 (x) + 2 (z) queries


def test_encode_decode_split_matches_call():
    model = _tiny_io()
    inputs = {
        "x": jnp.asarray(np.random.RandomState(0).randn(2, 7, 12), jnp.float32),
        "y": jnp.asarray(np.random.RandomState(1).randn(2, 9, 16), jnp.float32),
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(0), inputs)
    full = jax.jit(model.apply)(params, inputs)
    assert full.shape == (2, 8, 8)

    def split_fn(params, inputs):
        def inner(mdl):
            latents, state = mdl.encode(inputs)
            return mdl.decode(latents, state)

        return model.apply(params, method=inner)

    split = jax.jit(split_fn)(params, inputs)
    np.testing.assert_allclose(np.asarray(full), np.asarray(split), rtol=1e-6)


def test_subsampled_decode_chunking_invariant():
    """Chunked decoding must be exactly consistent: decoding two disjoint
    index chunks and concatenating equals decoding their union in one call
    (the invariant behind the multimodal 128-chunk decode,
    multimodal_perceiver.py:137-167).

    Note the subsampled position formula (-1 + 2c/dim,
    output_queries.py:58) intentionally does NOT coincide with the full
    decode's linspace(-1, 1) positions -- that asymmetry is reference
    behaviour, so no slice-of-full-decode equality is expected."""
    model = PerceiverIO(
        num_blocks=1,
        num_self_attends_per_block=1,
        num_latents=4,
        num_latent_channels=32,
        final_project=True,
        final_project_out_channels=8,
        input_channels=12,
        output_queries=FourierQuery(
            output_index_dims=(4, 6), num_bands=4, max_resolution=(4, 6)
        ),
    )
    inputs = jnp.asarray(np.random.RandomState(0).randn(2, 10, 12), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), inputs)

    decode = jax.jit(
        lambda p, x, idx: model.apply(
            p, x, subsampled_output_points={"__default": idx}
        )
    )
    all_idx = jnp.arange(24)
    union = decode(params, inputs, all_idx)
    chunk_a = decode(params, inputs, all_idx[:12])
    chunk_b = decode(params, inputs, all_idx[12:])
    np.testing.assert_allclose(
        np.asarray(union),
        np.concatenate([np.asarray(chunk_a), np.asarray(chunk_b)], axis=1),
        rtol=1e-5,
        atol=1e-6,
    )


def test_input_mask_changes_output():
    model = _tiny_io()
    rng = np.random.RandomState(0)
    inputs = {
        "x": jnp.asarray(rng.randn(2, 7, 12), jnp.float32),
        "y": jnp.asarray(rng.randn(2, 9, 16), jnp.float32),
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(0), inputs)
    full = jax.jit(model.apply)(params, inputs)
    mask = jnp.ones((2, 16), bool).at[:, 8:].set(False)
    masked = jax.jit(lambda p, x, m: model.apply(p, x, input_mask=m))(
        params, inputs, mask
    )
    assert not np.allclose(np.asarray(full), np.asarray(masked))


def test_mask_probs_deterministic_extremes():
    """mask_prob 1.0 replaces every token with the mask token; 0.0 is a
    no-op (perceiver.py:481-493)."""
    model = PerceiverIO(
        num_blocks=1,
        num_self_attends_per_block=1,
        num_latents=4,
        num_latent_channels=32,
        final_project=True,
        final_project_out_channels=8,
        input_preprocessors={
            "a": OneHotPreprocessor(input_channels=6),
            "b": OneHotPreprocessor(input_channels=6),
        },
        input_mask_probs={"a": 1.0, "b": 0.0},
        output_queries={"a": TrainableQuery(output_index_dims=2, num_channels=8)},
    )
    rng = np.random.RandomState(0)
    inputs = {
        "a": jnp.asarray(rng.randn(2, 6), jnp.float32),
        "b": jnp.asarray(rng.randn(2, 6), jnp.float32),
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(0), inputs)
    out1 = jax.jit(model.apply)(params, inputs)
    # fully masked modality "a": its input values must not affect the output
    inputs2 = dict(inputs, a=jnp.asarray(rng.randn(2, 6), jnp.float32))
    out2 = jax.jit(model.apply)(params, inputs2)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)
    # unmasked modality "b" does affect it
    inputs3 = dict(inputs, b=jnp.asarray(rng.randn(2, 6), jnp.float32))
    out3 = jax.jit(model.apply)(params, inputs3)
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_single_tensor_input_unwraps_default():
    model = PerceiverIO(
        num_blocks=1,
        num_self_attends_per_block=1,
        num_latents=4,
        num_latent_channels=32,
        final_project=True,
        final_project_out_channels=8,
        input_channels=12,
        output_queries=TrainableQuery(output_index_dims=3, num_channels=16),
    )
    x = jnp.ones((2, 5, 12))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(params, x)
    assert isinstance(out, jnp.ndarray) and out.shape == (2, 3, 8)


def test_custom_preprocessor_without_train_kwarg():
    """A user preprocessor following the older protocol (no ``train``
    kwarg) still works through MultimodalPreprocessor — the framework
    retries without it (docs/MIGRATION.md "Custom preprocessors")."""
    import flax.linen as nn

    class LegacyPreprocessor(nn.Module):
        def n_output_channels(self):
            return 16

        @nn.compact
        def __call__(self, inputs, *, pos=None):
            return nn.Dense(16)(inputs), inputs

    model = PerceiverIO(
        num_blocks=1,
        num_self_attends_per_block=1,
        num_latents=4,
        num_latent_channels=32,
        final_project=True,
        final_project_out_channels=8,
        input_preprocessors={"a": LegacyPreprocessor()},
        output_queries={"a": TrainableQuery(output_index_dims=2, num_channels=8)},
    )
    x = {"a": jnp.ones((2, 5, 12))}
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(params, x)
    assert out.shape == (2, 2, 8)


def test_train_aware_preprocessor_internal_typeerror_propagates():
    """A TypeError raised INSIDE a train-accepting preprocessor must
    surface, not be swallowed by the legacy-protocol retry (which would
    silently re-run the preprocessor without ``train``)."""
    import flax.linen as nn

    class BuggyPreprocessor(nn.Module):
        def n_output_channels(self):
            return 16

        @nn.compact
        def __call__(self, inputs, *, pos=None, train: bool = False):
            # Simulates forwarding train= to a submodule lacking the kwarg.
            raise TypeError("got an unexpected keyword argument 'train'")

    model = PerceiverIO(
        num_blocks=1,
        num_self_attends_per_block=1,
        num_latents=4,
        num_latent_channels=32,
        final_project=True,
        final_project_out_channels=8,
        input_preprocessors={"a": BuggyPreprocessor()},
        output_queries={"a": TrainableQuery(output_index_dims=2, num_channels=8)},
    )
    x = {"a": jnp.ones((2, 5, 12))}
    with pytest.raises(TypeError, match="unexpected keyword argument"):
        jax.jit(model.init)(jax.random.PRNGKey(0), x)


def test_stochastic_mask_probs_use_rng():
    """0 < p < 1 mask probs draw from the 'mask' rng stream."""
    from perceiverio_pytorch_tpu.io_processors import OneHotPreprocessor

    model = PerceiverIO(
        num_blocks=1,
        num_self_attends_per_block=1,
        num_latents=4,
        num_latent_channels=32,
        final_project=True,
        final_project_out_channels=8,
        input_preprocessors={"a": OneHotPreprocessor(input_channels=6)},
        input_mask_probs={"a": 0.5},
        output_queries={"a": TrainableQuery(output_index_dims=2, num_channels=8)},
    )
    x = {"a": jnp.asarray(np.random.RandomState(0).randn(4, 6), jnp.float32)}
    params = jax.jit(
        lambda k, x: model.init({"params": k, "mask": jax.random.PRNGKey(9)}, x)
    )(jax.random.PRNGKey(0), x)
    out1 = jax.jit(
        lambda p, x: model.apply(p, x, rngs={"mask": jax.random.PRNGKey(1)})
    )(params, x)
    out1b = jax.jit(
        lambda p, x: model.apply(p, x, rngs={"mask": jax.random.PRNGKey(1)})
    )(params, x)
    out2 = jax.jit(
        lambda p, x: model.apply(p, x, rngs={"mask": jax.random.PRNGKey(2)})
    )(params, x)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out1b))
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_modality_dict_insertion_order_irrelevant():
    """Sorted-key concat (perceiver.py:363-364, 495-498) must make results
    independent of dict insertion order."""
    q = {
        "x": TrainableQuery(output_index_dims=3, num_channels=16),
        "y": TrainableQuery(output_index_dims=5, num_channels=24),
    }
    q_rev = {k: q[k] for k in reversed(list(q))}
    m1 = _tiny_io(output_queries=q)
    m2 = _tiny_io(output_queries=q_rev)
    inputs = {
        "x": jnp.asarray(np.random.RandomState(0).randn(2, 7, 12), jnp.float32),
        "y": jnp.asarray(np.random.RandomState(1).randn(2, 9, 16), jnp.float32),
    }
    inputs_rev = {k: inputs[k] for k in reversed(list(inputs))}
    params = jax.jit(m1.init)(jax.random.PRNGKey(0), inputs)
    out1 = jax.jit(m1.apply)(params, inputs)
    out2 = jax.jit(m2.apply)(params, inputs_rev)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)


def test_invalid_configurations_raise():
    """Knob validation matches the reference's errors (transformer_primitives
    :66-71, perceiver.py:53-59, preprocessors.py:92-97, 106-114)."""
    import pytest
    from perceiverio_pytorch_tpu import Attention, CrossAttention, PerceiverEncoder
    from perceiverio_pytorch_tpu.io_processors import ImagePreprocessor

    x = jnp.ones((1, 4, 16))
    with pytest.raises(ValueError, match="divisible"):
        Attention(q_in_channels=16, num_heads=3).init(
            jax.random.PRNGKey(0), x, x, x
        )
    with pytest.raises(ValueError, match="shape_for_attention"):
        CrossAttention(
            q_in_channels=16, kv_in_channels=16, shape_for_attn="bogus",
            num_heads=2,
        ).init(jax.random.PRNGKey(0), x, x)
    with pytest.raises(ValueError, match="divisible"):
        PerceiverEncoder(
            num_input_channels=16, num_latents=4, num_latent_channels=30,
            num_self_attend_heads=8,
        ).init(jax.random.PRNGKey(0), x, jnp.ones((1, 4, 30)))
    with pytest.raises(ValueError, match="Invalid prep_type"):
        ImagePreprocessor(img_size=(8, 8), prep_type="bogus").init(
            jax.random.PRNGKey(0), jnp.ones((1, 3, 8, 8))
        )
    with pytest.raises(ValueError, match="powers of 4"):
        ImagePreprocessor(img_size=(8, 8), prep_type="conv", spatial_downsample=3).init(
            jax.random.PRNGKey(0), jnp.ones((1, 3, 8, 8))
        )


def test_flow_inference_waves_match_wide_batch():
    """FlowInference's scanned fixed-size waves must equal the single wide
    batched call exactly (same per-tile math; only the dispatch shape
    changes), including the non-divisible pad-and-drop path."""
    import numpy as np

    from perceiverio_pytorch_tpu.models import FlowInference, FlowPerceiver

    model = FlowPerceiver(
        img_size=(16, 20), num_latents=8, num_latent_channels=32,
        num_self_attends_per_block=1, num_blocks=1,
    )
    rng = np.random.RandomState(0)
    # 24x32 image with 16x20 tiles and overlap 4 -> 2x2 grid = 4 tiles;
    # wave_size=3 forces the pad-and-drop path (4 -> 6 stacked tiles).
    img1 = jnp.asarray(rng.uniform(-1, 1, (1, 3, 24, 32)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(-1, 1, (1, 3, 24, 32)), jnp.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 3, 16, 20)),
        jnp.zeros((1, 3, 16, 20)),
    )
    wide = FlowInference(model, params, min_overlap=4, wave_size=0)
    for wave in (2, 3):
        waved = FlowInference(model, params, min_overlap=4, wave_size=wave)
        np.testing.assert_allclose(
            np.asarray(waved(img1, img2)),
            np.asarray(wide(img1, img2)),
            rtol=1e-5, atol=1e-6,
        )
    # wave_size only bounds memory on the stacked-batch path; combining it
    # with batch_tiles=False must be rejected, not silently ignored.
    with pytest.raises(ValueError, match="batch_tiles"):
        FlowInference(model, params, batch_tiles=False, wave_size=2)


def test_basic_query_channels_default_when_kwargs_omit_num_channels():
    """trainable_position_encoding_kwargs without num_channels is a valid
    config (the encoding defaults to 128, as in the reference) -- the
    channel-count helper must agree instead of KeyError-ing."""
    from perceiverio_pytorch_tpu.core.queries import BasicQuery

    q = BasicQuery(
        output_index_dims=6,
        trainable_position_encoding_kwargs={"init_scale": 0.01},
    )
    assert q.n_query_channels() == 128
    out = jax.jit(
        lambda key, x: q.init_with_output(key, x)[0]
    )(jax.random.PRNGKey(0), jnp.zeros((2, 6, 4)))
    assert out.shape == (2, 6, 128)
