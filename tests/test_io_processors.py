"""Unit tests for IO processors against reference semantics
(/root/reference/perceiver_io/io_processors/, utils/utils.py:72-140)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceiverio_pytorch_tpu.io_processors import (
    AudioPostprocessor,
    AudioPreprocessor,
    ClassificationPostprocessor,
    EmbeddingPreprocessor,
    FlowPostprocessor,
    ImagePreprocessor,
    OneHotPreprocessor,
    ProjectionPostprocessor,
    extract_patches,
    patches_for_flow,
    reverse_space_to_depth,
    space_to_depth,
)
from perceiverio_pytorch_tpu.utils.bytes_tokenizer import BytesTokenizer, pad_sequence
from perceiverio_pytorch_tpu.utils.conv_shapes import conv_output_shape, same_padding
from conftest import requires_reference


def test_space_to_depth_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 3), jnp.float32)
    y = space_to_depth(x, spatial_block_size=2)
    assert y.shape == (2, 4, 4, 12)
    np.testing.assert_array_equal(
        np.asarray(reverse_space_to_depth(y, 1, 2)), np.asarray(x)
    )
    v = jnp.asarray(rng.randn(1, 4, 8, 8, 3), jnp.float32)
    w = space_to_depth(v, temporal_block_size=2, spatial_block_size=2)
    assert w.shape == (1, 2, 4, 4, 24)
    np.testing.assert_array_equal(
        np.asarray(reverse_space_to_depth(w, 2, 2)), np.asarray(v)
    )


@requires_reference
def test_extract_patches_matches_unfold():
    """Channel order of flattened patches must match the reference's
    F.unfold + rearrange (processor_utils.py:91-94): (ph, pw, c)."""
    import torch
    from perceiver_io.io_processors.processor_utils import (
        extract_patches as torch_extract_patches,
    )

    rng = np.random.RandomState(0)
    img = rng.randn(2, 3, 10, 12).astype(np.float32)  # NCHW for torch
    for size, stride, dilation in [((3, 3), 1, 1), ((2, 4), 2, 1), ((3, 3), 1, 2)]:
        expected = torch_extract_patches(
            torch.from_numpy(img), size=list(size), stride=stride, dilation=dilation
        ).numpy()
        got = np.asarray(
            extract_patches(
                jnp.asarray(np.moveaxis(img, 1, -1)),  # channel-last for ours
                size=size,
                stride=stride,
                dilation=dilation,
            )
        )
        np.testing.assert_allclose(got, expected, rtol=1e-6)


@requires_reference
def test_patches_for_flow_matches_reference():
    import torch
    from perceiver_io.io_processors.processor_utils import (
        patches_for_flow as torch_patches_for_flow,
    )

    rng = np.random.RandomState(1)
    frames = rng.randn(1, 2, 3, 8, 10).astype(np.float32)  # [N, T, C, H, W]
    expected = torch_patches_for_flow(torch.from_numpy(frames)).numpy()
    got = np.asarray(
        patches_for_flow(jnp.asarray(np.moveaxis(frames, 2, -1)))
    )
    np.testing.assert_allclose(got, expected, rtol=1e-6)


@requires_reference
def test_same_padding_matches_reference():
    from utils.utils import same_padding as ref_same_padding

    for input_size, k, s in [
        ((3, 224, 224), 7, 2),
        ((64, 112, 112), 3, 2),
        ((64, 57, 57), 3, 2),
        ((3, 31, 33), 7, 2),
    ]:
        assert same_padding(input_size, k, s, dims=2) == ref_same_padding(
            input_size, k, s, dims=2
        )


def test_conv_output_shape():
    assert conv_output_shape((10, 12), (3, 3), 1, 0, 1) == [8, 10]
    assert conv_output_shape((10, 12), (3, 3), 2, 1, 1) == [5, 6]


def test_embedding_preprocessor_output():
    pre = EmbeddingPreprocessor(vocab_size=50, max_seq_len=16, embedding_dims=8)
    tokens = jnp.zeros((2, 16), jnp.int32)
    params = pre.init(jax.random.PRNGKey(0), tokens)
    with_pos, without_pos = pre.apply(params, tokens)
    assert with_pos.shape == (2, 16, 8)
    # with_pos - without_pos must equal the broadcast position table
    delta = np.asarray(with_pos - without_pos)
    np.testing.assert_allclose(delta[0], delta[1], rtol=1e-6)
    assert pre.n_output_channels() == 8


def test_onehot_preprocessor():
    pre = OneHotPreprocessor(input_channels=5)
    x = jnp.ones((3, 5))
    a, b = pre.apply({}, x)
    assert a.shape == (3, 1, 5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_audio_preprocessor_patching():
    pre = AudioPreprocessor(
        samples_per_batch=96,
        samples_per_patch=16,
        fourier_position_encoding_kwargs=dict(
            num_bands=4, max_resolution=(96,), sine_only=False, concat_pos=True
        ),
    )
    audio = jnp.asarray(np.arange(2 * 96, dtype=np.float32).reshape(2, 96, 1))
    params = pre.init(jax.random.PRNGKey(0), audio)
    with_pos, without_pos = pre.apply(params, audio)
    assert without_pos.shape == (2, 6, 16)
    assert with_pos.shape == (2, 6, 16 + pre._pos_enc_channels())
    # patching is a plain reshape
    np.testing.assert_array_equal(
        np.asarray(without_pos[0, 0]), np.arange(16, dtype=np.float32)
    )


@pytest.mark.parametrize("prep_type,spatial_downsample", [("pixels", 2), ("patches", 2)])
def test_image_preprocessor_shapes(prep_type, spatial_downsample):
    pre = ImagePreprocessor(
        img_size=(8, 8),
        prep_type=prep_type,
        spatial_downsample=spatial_downsample,
        fourier_position_encoding_kwargs=dict(
            num_bands=4, max_resolution=(4, 4), sine_only=False, concat_pos=True
        ),
    )
    img = jnp.ones((2, 3, 8, 8))
    params = pre.init(jax.random.PRNGKey(0), img)
    with_pos, without_pos = pre.apply(params, img)
    n_tokens = (8 // spatial_downsample) ** 2
    assert with_pos.shape[:2] == (2, n_tokens)
    assert with_pos.shape[-1] == pre.n_output_channels()


def test_classification_postprocessor_takes_row0():
    post = ClassificationPostprocessor(num_input_channels=7, num_classes=7, project=False)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 7), jnp.float32)
    out = post.apply({}, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x[:, 0, :]))


def test_projection_and_audio_postprocessors():
    proj = ProjectionPostprocessor(num_inputs=8, num_outputs=3)
    x = jnp.ones((2, 5, 8))
    params = proj.init(jax.random.PRNGKey(0), x)
    assert proj.apply(params, x).shape == (2, 5, 3)

    audio = AudioPostprocessor(in_channels=8, samples_per_patch=4)
    params = audio.init(jax.random.PRNGKey(0), x)
    assert audio.apply(params, x).shape == (2, 20)


def test_flow_postprocessor_scale_reshape():
    post = FlowPostprocessor(img_size=(4, 6), flow_scale_factor=0.5)
    x = jnp.ones((2, 24, 2))
    out = post.apply({}, x)
    assert out.shape == (2, 2, 4, 6)
    assert float(out[0, 0, 0, 0]) == 0.5


def test_bytes_tokenizer_roundtrip():
    tok = BytesTokenizer()
    s = "Hello, Perceiver!"
    ids = tok.to_int(s)
    assert tok.vocab_size == 262
    assert tok.to_string(ids) == s
    padded, mask = pad_sequence(32, ids[None], np.ones((1, len(ids))), tok.pad_token)
    assert padded.shape == (1, 32)
    assert mask[0, len(ids):].sum() == 0


def test_flow_viz_shapes():
    from perceiverio_pytorch_tpu.utils.flow_viz import flow_to_image, make_colorwheel

    assert make_colorwheel().shape == (55, 3)
    flow = np.random.RandomState(0).randn(6, 8, 2).astype(np.float32)
    img = flow_to_image(flow)
    assert img.shape == (6, 8, 3) and img.dtype == np.uint8


def test_plot_flow_legend_renders_wheel():
    """Reference flow_utils.py:21-38: the legend IS flow_uv_to_colors over
    the [-1, 1]^2 meshgrid; spot-check the center (zero flow -> white)."""
    from perceiverio_pytorch_tpu.utils.flow_viz import (
        flow_uv_to_colors,
        plot_flow_legend,
    )

    wheel = plot_flow_legend(size=41, show=False)
    assert wheel.shape == (41, 41, 3) and wheel.dtype == np.uint8
    u, v = np.meshgrid(np.linspace(-1, 1, 41), np.linspace(-1, 1, 41))
    np.testing.assert_array_equal(wheel, flow_uv_to_colors(u, v))
    assert (wheel[20, 20] >= 250).all()  # zero flow renders ~white


def test_get_error_image_reference_contract():
    """Reference flow_utils.py:155-176: [H,W,2] flows -> uint8 PIL image,
    linear scale to 255 at the max error, optional validity mask."""
    from perceiverio_pytorch_tpu.utils.flow_viz import get_error_image

    pred = np.zeros((4, 5, 2), np.float32)
    gt = np.zeros((4, 5, 2), np.float32)
    gt[1, 2] = (3.0, 4.0)  # EPE 5 at one pixel
    gt[0, 0] = (0.0, 2.5)  # EPE 2.5 at another
    img = get_error_image(pred, gt)
    arr = np.asarray(img)
    assert arr.shape == (4, 5) and arr.dtype == np.uint8
    assert arr[1, 2] == 255 and arr[0, 0] == 127 and arr[3, 4] == 0
    valid = np.ones((4, 5), np.float32)
    valid[1, 2] = 0.0
    arr_masked = np.asarray(get_error_image(pred, gt, valid))
    assert arr_masked[1, 2] == 0 and arr_masked[0, 0] == 255


def test_image_postprocessor_conv_upsample_functional():
    """The reference leaves the conv postprocessor as a NotImplementedError
    stub (postprocessors.py:66-88); ours is functional."""
    from perceiverio_pytorch_tpu.io_processors import ImagePostprocessor

    post = ImagePostprocessor(
        img_size=(16, 16), postproc_type="conv", n_outputs=3,
        spatial_upsample=4, input_reshape_size=(4, 4),
    )
    x = jnp.ones((2, 16, 8))  # [B, N=4*4, C]
    params = post.init(jax.random.PRNGKey(0), x)
    out = post.apply(params, x)
    assert out.shape == (2, 16, 16, 3)  # 4x upsampled, channel-last


def test_compute_grid_indices_never_overflows():
    """Every tile origin keeps the tile inside the image — the reference
    clamps only the LAST origin (flow_perceiver.py:113-117), so dimensions
    in (k*step, k*step+min_overlap) emitted an out-of-bounds tile."""
    from perceiverio_pytorch_tpu.models.flow import compute_grid_indices

    # height 700 with patch 368, overlap 20 (step 348): naive ys=[0,348,696]
    # -> clamping only the last gave [0,348,332]; 348+368 > 700 overflows
    grid = compute_grid_indices((700, 496), (368, 496), 20)
    for y, x in grid:
        assert 0 <= y <= 700 - 368 and 0 <= x <= 496 - 496
    assert len(set(grid)) == len(grid)  # no duplicate tiles
    assert max(y for y, _ in grid) == 700 - 368  # flush with the boundary
    # exact-fit image: one tile
    assert compute_grid_indices((368, 496), (368, 496), 20) == [(0, 0)]
