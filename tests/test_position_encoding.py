"""Unit tests for position encodings against the documented reference layout
(/root/reference/perceiver_io/position_encoding.py:33-47)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceiverio_pytorch_tpu.core.position_encoding import (
    FourierPositionEncoding,
    PosEncodingType,
    TrainablePositionEncoding,
    build_linear_positions,
    build_position_encoding,
    generate_fourier_features,
)


def test_fourier_channel_order_and_values():
    """Channel order: [pos, sin(all bands dim-major), cos(...)] with bands
    linspace(1, res/2) and a pi multiplier."""
    pos = np.array([[0.25, -0.5], [1.0, 0.0]], np.float32)
    num_bands = 4
    res = (10, 20)
    feats = np.asarray(
        generate_fourier_features(jnp.asarray(pos), num_bands, res, True, False)
    )
    assert feats.shape == (2, 2 + 2 * 2 * num_bands)

    bands0 = np.linspace(1.0, res[0] / 2, num_bands)
    bands1 = np.linspace(1.0, res[1] / 2, num_bands)
    for n in range(2):
        expected = np.concatenate(
            [
                pos[n],
                np.sin(np.pi * pos[n, 0] * bands0),
                np.sin(np.pi * pos[n, 1] * bands1),
                np.cos(np.pi * pos[n, 0] * bands0),
                np.cos(np.pi * pos[n, 1] * bands1),
            ]
        )
        np.testing.assert_allclose(feats[n], expected, rtol=1e-6, atol=1e-6)


def test_fourier_sine_only_and_no_concat():
    pos = np.random.RandomState(0).uniform(-1, 1, (5, 3)).astype(np.float32)
    feats = generate_fourier_features(
        jnp.asarray(pos), 8, (4, 4, 4), concat_pos=False, sine_only=True
    )
    assert feats.shape == (5, 3 * 8)


def test_build_linear_positions():
    grid = np.asarray(build_linear_positions((3, 5)))
    assert grid.shape == (3, 5, 2)
    np.testing.assert_allclose(grid[0, 0], [-1, -1], atol=1e-6)
    np.testing.assert_allclose(grid[-1, -1], [1, 1], atol=1e-6)
    np.testing.assert_allclose(grid[1, 2], [0, 0], atol=1e-6)


def test_trainable_position_encoding_shapes():
    enc = TrainablePositionEncoding(index_dim=7, num_channels=16)
    params = enc.init(jax.random.PRNGKey(0), 3)
    out = enc.apply(params, 3)
    assert out.shape == (3, 7, 16)
    assert enc.n_output_channels() == 16
    # batch broadcast shares the same table
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(out[2]))


def test_fourier_encoding_module_channels():
    enc = FourierPositionEncoding(
        index_dims=(6, 6), num_bands=4, concat_pos=True, sine_only=False
    )
    assert enc.n_output_channels() == 2 + 2 * 2 * 4
    out = enc.apply({}, 2)
    assert out.shape == (2, 36, enc.n_output_channels())


def test_build_position_encoding_with_projection():
    enc = build_position_encoding(
        PosEncodingType.TRAINABLE,
        index_dims=(4, 4),
        project_pos_dim=8,
        trainable_position_encoding_kwargs=dict(num_channels=12),
    )
    assert enc.n_output_channels() == 8
    params = enc.init(jax.random.PRNGKey(0), 2)
    assert enc.apply(params, 2).shape == (2, 16, 8)


def test_unknown_encoding_raises():
    with pytest.raises(ValueError):
        build_position_encoding(PosEncodingType.NONE, index_dims=(4,))


def test_fourier_consts_table_matches_traced_path():
    """pos=None reads a precomputed 'consts' buffer (init-time table); it
    must equal the in-graph path fed the same implicit linear positions."""
    enc = FourierPositionEncoding(
        index_dims=(5, 7), num_bands=3, concat_pos=True, sine_only=False
    )
    variables = enc.init(jax.random.PRNGKey(0), batch_size=2)
    assert "consts" in variables  # the table is a buffer, not an HLO const
    const = enc.apply(variables, batch_size=2)
    pos = build_linear_positions((5, 7)).reshape(1, 35, 2)
    pos = jnp.broadcast_to(pos, (2, 35, 2))
    traced = enc.apply(variables, batch_size=2, pos=pos)
    np.testing.assert_allclose(
        np.asarray(const), np.asarray(traced), rtol=1e-6, atol=1e-6
    )
    # sine_only / no-concat variant
    enc2 = FourierPositionEncoding(
        index_dims=(4,), num_bands=2, concat_pos=False, sine_only=True
    )
    v2 = enc2.init(jax.random.PRNGKey(0), batch_size=1)
    const2 = enc2.apply(v2, batch_size=1)
    traced2 = enc2.apply(
        v2, batch_size=1, pos=build_linear_positions((4,)).reshape(1, 4, 1)
    )
    np.testing.assert_allclose(
        np.asarray(const2), np.asarray(traced2), rtol=1e-6, atol=1e-6
    )
