"""End-to-end numerical parity vs the PyTorch reference.

Each test builds the reference model (/root/reference) and our model with
identical hyperparameters, randomises the reference weights, converts them
through the checkpoint adapter (utils/torch_checkpoint.py), and asserts the
outputs match within fp32 tolerance -- the same oracle the pretrained
checkpoints would provide (reference examples: example_language.py:63-70,
example_img_classify.py:63-77, example_opt_flow.py:41-42,
example_multimodal.py:100-113).
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

TOL = dict(rtol=2e-4, atol=2e-5)


@requires_reference
def test_language_parity():
    import torch
    from perceiver_io.language_perceiver import LanguagePerceiver as TorchLanguage

    from perceiverio_pytorch_tpu.models import LanguagePerceiver

    kwargs = dict(
        vocab_size=262,
        max_seq_len=32,
        embed_dim=16,
        num_self_attends_per_block=2,
        num_blocks=1,
        num_latents=8,
        num_latent_channels=64,
    )
    torch_model = TorchLanguage(**kwargs).eval()
    sd = randomize_state_dict(torch_model, seed=0)

    rng = np.random.RandomState(0)
    tokens = rng.randint(0, 262, (2, 32)).astype(np.int64)
    mask = np.ones((2, 32), bool)
    mask[:, 20:] = False

    with torch.inference_mode():
        torch_out = to_numpy(
            torch_model(torch.from_numpy(tokens), torch.from_numpy(mask))
        )

    model = LanguagePerceiver(**kwargs)
    template = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(tokens), jnp.asarray(mask)
    )
    variables, unused = convert_state_dict(sd, template, LANGUAGE_OVERRIDES)
    # only the tied postprocessor duplicate may remain unused
    assert unused == ["perceiver._output_postprocessors.__default._embedding.weight"]

    out = np.asarray(
        jax.jit(model.apply)(variables, jnp.asarray(tokens), jnp.asarray(mask))
    )
    assert out.shape == torch_out.shape
    np.testing.assert_allclose(out, torch_out, **TOL)


@requires_reference
@pytest.mark.parametrize("prep", ["FOURIER_POS_CONVNET", "LEARNED_POS_1X1CONV", "FOURIER_POS_PIXEL"])
def test_classification_parity(prep):
    import torch
    from perceiver_io.classification_perceiver import (
        ClassificationPerceiver as TorchClassification,
        PrepType as TorchPrepType,
    )

    from perceiverio_pytorch_tpu.models import ClassificationPerceiver, PrepType

    kwargs = dict(
        num_classes=7,
        img_size=(32, 32),
        num_self_attends_per_block=2,
        num_blocks=2,
        num_latents=8,
        num_latent_channels=32,
    )
    torch_model = TorchClassification(
        prep_type=getattr(TorchPrepType, prep), **kwargs
    ).eval()
    sd = randomize_state_dict(torch_model, seed=1)

    rng = np.random.RandomState(1)
    img = rng.randn(2, 3, 32, 32).astype(np.float32)

    with torch.inference_mode():
        torch_out = to_numpy(torch_model(torch.from_numpy(img)))

    model = ClassificationPerceiver(prep_type=getattr(PrepType, prep), **kwargs)
    template = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(img))
    variables, unused = convert_state_dict(sd, template)
    assert unused == []

    out = np.asarray(jax.jit(model.apply)(variables, jnp.asarray(img)))
    assert out.shape == torch_out.shape
    np.testing.assert_allclose(out, torch_out, **TOL)


@requires_reference
def test_flow_parity_single_tile():
    import torch
    from perceiver_io.flow_perceiver import FlowPerceiver as TorchFlow

    from perceiverio_pytorch_tpu.models import FlowPerceiver

    kwargs = dict(
        img_size=(16, 24),
        num_latents=8,
        num_latent_channels=32,
        num_self_attends_per_block=2,
        num_blocks=1,
    )
    torch_model = TorchFlow(**kwargs).eval()
    sd = randomize_state_dict(torch_model, seed=2)

    rng = np.random.RandomState(2)
    img1 = rng.uniform(-1, 1, (1, 3, 16, 24)).astype(np.float32)
    img2 = rng.uniform(-1, 1, (1, 3, 16, 24)).astype(np.float32)

    with torch.inference_mode():
        torch_out = to_numpy(
            torch_model(torch.from_numpy(img1), torch.from_numpy(img2), test_mode=False)
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
def test_flow_parity_tiled():
    import torch
    from perceiver_io.flow_perceiver import FlowPerceiver as TorchFlow

    from perceiverio_pytorch_tpu.models import FlowInference, FlowPerceiver

    kwargs = dict(
        img_size=(16, 24),
        num_latents=8,
        num_latent_channels=32,
        num_self_attends_per_block=1,
        num_blocks=1,
    )
    torch_model = TorchFlow(**kwargs).eval()
    sd = randomize_state_dict(torch_model, seed=3)

    rng = np.random.RandomState(3)
    img1 = rng.uniform(-1, 1, (1, 3, 24, 40)).astype(np.float32)
    img2 = rng.uniform(-1, 1, (1, 3, 24, 40)).astype(np.float32)

    with torch.inference_mode():
        torch_out = to_numpy(
            torch_model(
                torch.from_numpy(img1),
                torch.from_numpy(img2),
                test_mode=True,
                min_overlap=8,
            )
        )

    model = FlowPerceiver(**kwargs)
    template = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 3, 16, 24)),
        jnp.zeros((1, 3, 16, 24)),
    )
    variables, _ = convert_state_dict(sd, template)
    infer = FlowInference(model, variables, min_overlap=8)
    out = np.asarray(infer(jnp.asarray(img1), jnp.asarray(img2), test_mode=True))
    assert out.shape == torch_out.shape
    np.testing.assert_allclose(out, torch_out, rtol=2e-4, atol=2e-4)


@requires_reference
def test_multimodal_parity():
    import torch
    from perceiver_io.multimodal_perceiver import MultiModalPerceiver as TorchMM

    from perceiverio_pytorch_tpu.models import MultiModalPerceiver

    kwargs = dict(
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
    torch_model = TorchMM(**kwargs).eval()
    sd = randomize_state_dict(torch_model, seed=4)

    rng = np.random.RandomState(4)
    images = rng.rand(1, 2, 3, 16, 16).astype(np.float32)
    audio = rng.uniform(-1, 1, (1, 256, 1)).astype(np.float32)

    with torch.inference_mode():
        torch_out = torch_model(
            torch.from_numpy(images), torch.from_numpy(audio), n_chunks=4
        )

    model = MultiModalPerceiver(**kwargs)
    template = jax.jit(lambda key, i, a: model.init(key, i, a, 4))(
        jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(audio)
    )
    variables, unused = convert_state_dict(sd, template)
    assert unused == []

    out = jax.jit(lambda v, i, a: model.apply(v, i, a, 4))(
        variables, jnp.asarray(images), jnp.asarray(audio)
    )
    for key in ("image", "audio", "label"):
        ours = np.asarray(out[key])
        theirs = to_numpy(torch_out[key])
        assert ours.shape == theirs.shape, key
        np.testing.assert_allclose(ours, theirs, err_msg=key, **TOL)


@requires_reference
def test_export_state_dict_roundtrip():
    """flax -> torch export loads back into the reference model and
    reproduces our outputs (full interop round trip)."""
    import torch
    from perceiver_io.language_perceiver import LanguagePerceiver as TorchLanguage

    from perceiverio_pytorch_tpu.models import LanguagePerceiver
    from perceiverio_pytorch_tpu.utils.torch_checkpoint import (
        LANGUAGE_TIED,
        export_state_dict,
    )

    kwargs = dict(
        vocab_size=262, max_seq_len=32, embed_dim=16,
        num_self_attends_per_block=1, num_blocks=1,
        num_latents=8, num_latent_channels=64,
    )
    model = LanguagePerceiver(**kwargs)
    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 262, (2, 32)), jnp.int32)
    mask = jnp.ones((2, 32), bool)
    variables = jax.jit(model.init)(jax.random.PRNGKey(42), tokens, mask)
    ours = np.asarray(jax.jit(model.apply)(variables, tokens, mask))

    sd = export_state_dict(variables, LANGUAGE_OVERRIDES, LANGUAGE_TIED)
    torch_model = TorchLanguage(**kwargs).eval()
    torch_model.load_state_dict({k: torch.from_numpy(v.copy()) for k, v in sd.items()})
    with torch.inference_mode():
        theirs = to_numpy(
            torch_model(
                torch.from_numpy(np.asarray(tokens, np.int64)),
                torch.from_numpy(np.asarray(mask)),
            )
        )
    np.testing.assert_allclose(ours, theirs, **TOL)
