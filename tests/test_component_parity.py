"""Component-level parity vs the PyTorch reference (beyond the end-to-end
model parity): attention with bias/return_matrix, individual pre/postprocessors."""

import jax
import jax.numpy as jnp
import numpy as np

from perceiverio_pytorch_tpu.utils.torch_checkpoint import convert_state_dict

from conftest import requires_reference
from parity_utils import randomize_state_dict, to_numpy

TOL = dict(rtol=2e-4, atol=2e-5)


@requires_reference
def test_attention_bias_and_matrix_parity():
    import torch
    from perceiver_io.transformer_primitives import Attention as TAttention

    from perceiverio_pytorch_tpu.core.attention import Attention

    torch.manual_seed(0)
    ta = TAttention(
        q_in_channels=16, k_in_channels=12, v_in_channels=12,
        num_heads=2, qk_out_channels=8, v_out_channels=10, output_channels=20,
    ).eval()
    sd = randomize_state_dict(ta, seed=0)

    rng = np.random.RandomState(0)
    xq = rng.randn(2, 5, 16).astype(np.float32)
    xk = rng.randn(2, 7, 12).astype(np.float32)
    bias = rng.randn(2, 2, 5, 7).astype(np.float32)

    with torch.inference_mode():
        t_mat, t_out = ta(
            torch.from_numpy(xq), torch.from_numpy(xk), torch.from_numpy(xk),
            attention_bias=torch.from_numpy(bias), return_matrix=True,
        )

    attn = Attention(
        q_in_channels=16, k_in_channels=12, v_in_channels=12,
        num_heads=2, qk_out_channels=8, v_out_channels=10, output_channels=20,
    )
    tmpl = jax.jit(lambda k, a, b: attn.init(k, a, b, b))(
        jax.random.PRNGKey(0), jnp.asarray(xq), jnp.asarray(xk)
    )
    variables, unused = convert_state_dict(sd, tmpl)
    assert unused == []
    mat, out = jax.jit(
        lambda v, a, b, bb: attn.apply(
            v, a, b, b, attention_bias=bb, return_matrix=True
        )
    )(variables, jnp.asarray(xq), jnp.asarray(xk), jnp.asarray(bias))

    np.testing.assert_allclose(np.asarray(out), to_numpy(t_out), **TOL)
    np.testing.assert_allclose(np.asarray(mat), to_numpy(t_mat), **TOL)


@requires_reference
def test_audio_preprocessor_parity():
    import torch
    from perceiver_io.io_processors.preprocessors import (
        AudioPreprocessor as TAudio,
    )
    from perceiver_io.position_encoding import PosEncodingType as TPos

    from perceiverio_pytorch_tpu.core.position_encoding import PosEncodingType
    from perceiverio_pytorch_tpu.io_processors import AudioPreprocessor

    kwargs = dict(
        samples_per_batch=192,
        samples_per_patch=16,
        prep_type="patches",
    )
    fkw = dict(num_bands=8, max_resolution=(192,), sine_only=False, concat_pos=True)
    ta = TAudio(
        position_encoding_type=TPos.FOURIER,
        fourier_position_encoding_kwargs=fkw,
        **kwargs,
    ).eval()
    sd = ta.state_dict()  # fourier audio preprocessor has no params

    rng = np.random.RandomState(0)
    audio = rng.uniform(-1, 1, (2, 192, 1)).astype(np.float32)
    with torch.inference_mode():
        t_with, t_without = ta(torch.from_numpy(audio))

    pre = AudioPreprocessor(
        position_encoding_type=PosEncodingType.FOURIER,
        fourier_position_encoding_kwargs=fkw,
        **kwargs,
    )
    variables = pre.init(jax.random.PRNGKey(0), jnp.asarray(audio))
    assert len(sd) == 0
    with_pos, without_pos = jax.jit(pre.apply)(variables, jnp.asarray(audio))
    np.testing.assert_allclose(np.asarray(with_pos), to_numpy(t_with), **TOL)
    np.testing.assert_allclose(np.asarray(without_pos), to_numpy(t_without), **TOL)


@requires_reference
def test_embedding_preprocessor_parity():
    import torch
    from perceiver_io.io_processors.preprocessors import (
        EmbeddingPreprocessor as TEmb,
    )

    from perceiverio_pytorch_tpu.io_processors import EmbeddingPreprocessor

    te = TEmb(vocab_size=40, max_seq_len=12, embedding_dims=8).eval()
    sd = randomize_state_dict(te, seed=1)
    tokens = np.random.RandomState(1).randint(0, 40, (3, 12))
    with torch.inference_mode():
        t_with, t_without = te(torch.from_numpy(tokens))

    pre = EmbeddingPreprocessor(vocab_size=40, max_seq_len=12, embedding_dims=8)
    tmpl = jax.jit(pre.init)(jax.random.PRNGKey(0), jnp.asarray(tokens))
    variables, unused = convert_state_dict(sd, tmpl)
    assert unused == []
    with_pos, without_pos = jax.jit(pre.apply)(variables, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(with_pos), to_numpy(t_with), **TOL)
    np.testing.assert_allclose(np.asarray(without_pos), to_numpy(t_without), **TOL)


@requires_reference
def test_conv2d_downsample_parity_multilayer():
    """Two stacked conv+BN+pool layers (16x downsample), odd input size --
    exercises the asymmetric TF-SAME pads at every stage."""
    import torch
    from perceiver_io.io_processors.processor_utils import (
        Conv2DDownsample as TConv,
    )

    from perceiverio_pytorch_tpu.io_processors import Conv2DDownsample

    tc = TConv(num_layers=2, in_channels=3, num_channels=8, use_batchnorm=True).eval()
    sd = randomize_state_dict(tc, seed=2)
    img = np.random.RandomState(2).randn(2, 3, 37, 45).astype(np.float32)
    with torch.inference_mode():
        t_out = to_numpy(tc(torch.from_numpy(img)))  # NCHW

    conv = Conv2DDownsample(num_layers=2, num_channels=8, use_batchnorm=True)
    x = jnp.asarray(np.moveaxis(img, 1, -1))  # channel-last
    tmpl = jax.jit(conv.init)(jax.random.PRNGKey(0), x)
    variables, unused = convert_state_dict(sd, tmpl)
    assert unused == []
    out = jax.jit(conv.apply)(variables, x)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(out), -1, 1), t_out, **TOL
    )


@requires_reference
def test_image_preprocessor_video_conv_parity():
    """conv prep with a temporal dim: T folds into batch, index dims include
    frames (preprocessors.py:206-225)."""
    import torch
    from perceiver_io.io_processors.preprocessors import (
        ImagePreprocessor as TImage,
    )
    from perceiver_io.position_encoding import PosEncodingType as TPos

    from perceiverio_pytorch_tpu.core.position_encoding import PosEncodingType
    from perceiverio_pytorch_tpu.io_processors import ImagePreprocessor

    fkw = dict(num_bands=4, max_resolution=(2, 4, 4), sine_only=False, concat_pos=True)
    kwargs = dict(
        img_size=(16, 16), num_frames=2, input_channels=3,
        prep_type="conv", spatial_downsample=4, num_channels=8,
    )
    tm = TImage(
        position_encoding_type=TPos.FOURIER,
        fourier_position_encoding_kwargs=fkw,
        **kwargs,
    ).eval()
    sd = randomize_state_dict(tm, seed=3)
    video = np.random.RandomState(3).randn(2, 2, 3, 16, 16).astype(np.float32)
    with torch.inference_mode():
        t_with, t_without = tm(torch.from_numpy(video))

    pre = ImagePreprocessor(
        position_encoding_type=PosEncodingType.FOURIER,
        fourier_position_encoding_kwargs=fkw,
        **kwargs,
    )
    tmpl = jax.jit(pre.init)(jax.random.PRNGKey(0), jnp.asarray(video))
    variables, unused = convert_state_dict(sd, tmpl)
    assert unused == []
    with_pos, without_pos = jax.jit(pre.apply)(variables, jnp.asarray(video))
    np.testing.assert_allclose(np.asarray(with_pos), to_numpy(t_with), **TOL)
    np.testing.assert_allclose(np.asarray(without_pos), to_numpy(t_without), **TOL)
