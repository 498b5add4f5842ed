"""Mid/full-scale numerical parity vs the PyTorch reference.

The fast suite (test_models_parity.py) shrinks every dimension; these
slow-marked oracles run each model at its REAL channel widths and depths
(language at the exact shipped config, the others with real latent stacks
and reduced spatial extents only) so full-scale numerics aren't certified
by bench throughput alone.  Reference configs:
/root/reference/perceiver_io/language_perceiver.py:24-31,
classification_perceiver.py:35-44, flow_perceiver.py:34-42,
multimodal_perceiver.py:30-41.

Run time is minutes per test on this machine's single CPU core; deselect
with ``-m "not slow"`` for quick iteration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceiverio_pytorch_tpu.utils.torch_checkpoint import (
    LANGUAGE_OVERRIDES,
    convert_state_dict,
)

from conftest import requires_reference
from parity_utils import randomize_state_dict, to_numpy

# Accumulated fp32 rounding at real depth/width is larger than at toy
# scale (26-48 attention layers); tolerances stay well below any logit
# decision boundary.
TOL = dict(rtol=2e-3, atol=2e-4)


@requires_reference
@pytest.mark.slow
def test_language_parity_full_scale():
    """Exact shipped MLM config: seq 2048, embed 768, 26 self-attends,
    256x1280 latents (language_perceiver.py:24-31)."""
    import torch
    from perceiver_io.language_perceiver import LanguagePerceiver as TorchLanguage

    from perceiverio_pytorch_tpu.models import LanguagePerceiver

    torch_model = TorchLanguage().eval()
    sd = randomize_state_dict(torch_model, seed=10)

    rng = np.random.RandomState(10)
    tokens = rng.randint(0, 262, (1, 2048)).astype(np.int64)
    mask = np.ones((1, 2048), bool)
    mask[:, 1500:] = False

    with torch.inference_mode():
        torch_out = to_numpy(
            torch_model(torch.from_numpy(tokens), torch.from_numpy(mask))
        )

    model = LanguagePerceiver()
    template = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(tokens), jnp.asarray(mask)
    )
    variables, unused = convert_state_dict(sd, template, LANGUAGE_OVERRIDES)
    assert unused == ["perceiver._output_postprocessors.__default._embedding.weight"]

    out = np.asarray(
        jax.jit(model.apply)(variables, jnp.asarray(tokens), jnp.asarray(mask))
    )
    assert out.shape == torch_out.shape
    np.testing.assert_allclose(out, torch_out, **TOL)
    # the argmax decode (the reference example's oracle) must agree everywhere
    np.testing.assert_array_equal(out.argmax(-1), torch_out.argmax(-1))


@requires_reference
@pytest.mark.slow
def test_classification_parity_mid_scale():
    """Real widths (512x1024 latents, conv-64 prep, fourier 64 bands) at
    112x112 input and 4 weight-shared blocks (classification_perceiver.py:35-58
    uses 224x224 and 8 blocks; the numerics paths are identical)."""
    import torch
    from perceiver_io.classification_perceiver import (
        ClassificationPerceiver as TorchClassification,
        PrepType as TorchPrepType,
    )

    from perceiverio_pytorch_tpu.models import ClassificationPerceiver, PrepType

    kwargs = dict(
        num_classes=1000,
        img_size=(112, 112),
        num_self_attends_per_block=6,
        num_blocks=4,
        num_latents=512,
        num_latent_channels=1024,
    )
    torch_model = TorchClassification(
        prep_type=TorchPrepType.FOURIER_POS_CONVNET, **kwargs
    ).eval()
    sd = randomize_state_dict(torch_model, seed=11)

    rng = np.random.RandomState(11)
    img = rng.randn(1, 3, 112, 112).astype(np.float32)

    with torch.inference_mode():
        torch_out = to_numpy(torch_model(torch.from_numpy(img)))

    model = ClassificationPerceiver(
        prep_type=PrepType.FOURIER_POS_CONVNET, **kwargs
    )
    template = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(img))
    variables, unused = convert_state_dict(sd, template)
    assert unused == []

    out = np.asarray(jax.jit(model.apply)(variables, jnp.asarray(img)))
    assert out.shape == torch_out.shape
    np.testing.assert_allclose(out, torch_out, **TOL)
    np.testing.assert_array_equal(out.argmax(-1), torch_out.argmax(-1))


@requires_reference
@pytest.mark.slow
def test_flow_parity_mid_scale():
    """Real flow stack (2048x512 latents, 24 self-attends, 16 heads,
    conv-after-patching 64ch, fourier 64 bands) on a quarter tile 92x124
    (flow_perceiver.py:34-42 ships 368x496)."""
    import torch
    from perceiver_io.flow_perceiver import FlowPerceiver as TorchFlow

    from perceiverio_pytorch_tpu.models import FlowPerceiver

    kwargs = dict(
        img_size=(92, 124),
        num_latents=2048,
        num_latent_channels=512,
        num_self_attends_per_block=24,
        num_blocks=1,
    )
    torch_model = TorchFlow(**kwargs).eval()
    sd = randomize_state_dict(torch_model, seed=12)

    rng = np.random.RandomState(12)
    img1 = rng.uniform(-1, 1, (1, 3, 92, 124)).astype(np.float32)
    img2 = rng.uniform(-1, 1, (1, 3, 92, 124)).astype(np.float32)

    with torch.inference_mode():
        torch_out = to_numpy(
            torch_model(
                torch.from_numpy(img1), torch.from_numpy(img2), test_mode=False
            )
        )

    model = FlowPerceiver(**kwargs)
    template = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(img1), jnp.asarray(img2)
    )
    variables, unused = convert_state_dict(sd, template)
    assert unused == []

    out = np.asarray(
        jax.jit(model.apply)(variables, jnp.asarray(img1), jnp.asarray(img2))
    )
    assert out.shape == torch_out.shape
    np.testing.assert_allclose(out, torch_out, **TOL)


@requires_reference
@pytest.mark.slow
def test_multimodal_parity_mid_scale():
    """Real multimodal trunk (784x512 latents, 8 self-attends, channel
    padding +4/+2, label mask prob 1.0) at 112x112/4-frame scale with a
    16-chunk decode (multimodal_perceiver.py:30-41 ships 224x224/16
    frames/128 chunks)."""
    import torch
    from perceiver_io.multimodal_perceiver import MultiModalPerceiver as TorchMM

    from perceiverio_pytorch_tpu.models import MultiModalPerceiver

    kwargs = dict(
        img_size=(112, 112),
        num_frames=4,
        num_classes=700,
        audio_samples_per_frame=1920,
        audio_samples_per_patch=16,
        num_self_attends_per_block=8,
        num_blocks=1,
        num_latents=784,
        num_latent_channels=512,
    )
    torch_model = TorchMM(**kwargs).eval()
    sd = randomize_state_dict(torch_model, seed=13)

    rng = np.random.RandomState(13)
    images = rng.rand(1, 4, 3, 112, 112).astype(np.float32)
    audio = rng.uniform(-1, 1, (1, 4 * 1920, 1)).astype(np.float32)

    with torch.inference_mode():
        torch_out = torch_model(
            torch.from_numpy(images), torch.from_numpy(audio), n_chunks=16
        )

    model = MultiModalPerceiver(**kwargs)
    template = jax.jit(lambda k, i, a: model.init(k, i, a, 16))(
        jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(audio)
    )
    variables, unused = convert_state_dict(sd, template)
    assert unused == []

    out = jax.jit(lambda v, i, a: model.apply(v, i, a, 16))(
        variables, jnp.asarray(images), jnp.asarray(audio)
    )
    for key in ("image", "audio", "label"):
        ours = np.asarray(out[key])
        theirs = to_numpy(torch_out[key])
        assert ours.shape == theirs.shape, key
        np.testing.assert_allclose(ours, theirs, err_msg=key, **TOL)
