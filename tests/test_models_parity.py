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
def test_language_gradient_parity():
    """TRAINING numerics oracle: dL/dparam matches torch autograd.

    The forward parity tests certify inference; this certifies the
    backward graph (tied-embedding double accumulation, post-matmul
    scaling, mask fill) by comparing every parameter gradient.  Torch
    grads are pushed through the SAME checkpoint adapter as the weights —
    the layout transposes (Linear w.T etc., utils/utils.py:143-180) are
    linear, so they map gradients exactly as they map parameters.
    """
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
    torch_model = TorchLanguage(**kwargs).train()
    sd = randomize_state_dict(torch_model, seed=3)

    rng = np.random.RandomState(3)
    tokens = rng.randint(0, 262, (2, 32)).astype(np.int64)
    mask = np.ones((2, 32), bool)
    mask[:, 24:] = False
    target = rng.randn(2, 32, 262).astype(np.float32)

    out = torch_model(torch.from_numpy(tokens), torch.from_numpy(mask))
    loss = ((out - torch.from_numpy(target)) ** 2).mean()
    loss.backward()
    grad_sd = {
        k: v.grad.clone()
        for k, v in torch_model.state_dict(keep_vars=True).items()
        if v.grad is not None
    }

    model = LanguagePerceiver(**kwargs)
    template = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(tokens), jnp.asarray(mask)
    )
    variables, _ = convert_state_dict(sd, template, LANGUAGE_OVERRIDES)

    def loss_fn(params):
        logits = model.apply(
            {**variables, "params": params},
            jnp.asarray(tokens),
            jnp.asarray(mask),
        )
        return jnp.mean((logits - jnp.asarray(target)) ** 2)

    l_jax, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    np.testing.assert_allclose(float(l_jax), float(loss.detach()), rtol=1e-5)

    # map the torch grads into our tree with the weight adapter
    grad_vars, _ = convert_state_dict(grad_sd, template, LANGUAGE_OVERRIDES)
    flat_ours = jax.tree_util.tree_flatten_with_path(grads)[0]
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(grad_vars["params"])[0])
    checked = 0
    for path, g in flat_ours:
        ref = flat_ref[path]
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(ref), rtol=2e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )
        checked += 1
    assert checked == len(flat_ref) and checked > 20


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
def test_classification_gradient_parity_convnet():
    """Gradient oracle through the conv pathway: conv kernels, BatchNorm
    affine (eval mode -- EMA-stat normalization on both sides), maxpool
    routing, and the classification head all backpropagate identically."""
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
        num_blocks=1,
        num_latents=8,
        num_latent_channels=32,
    )
    torch_model = TorchClassification(
        prep_type=TorchPrepType.FOURIER_POS_CONVNET, **kwargs
    ).eval()
    sd = randomize_state_dict(torch_model, seed=4)

    rng = np.random.RandomState(4)
    img = rng.randn(2, 3, 32, 32).astype(np.float32)
    target = rng.randn(2, 7).astype(np.float32)

    out = torch_model(torch.from_numpy(img))
    ((out - torch.from_numpy(target)) ** 2).mean().backward()
    grad_sd = {
        # BN running stats are buffers without grads; zero-fill so the
        # adapter's template walk (which expects every leaf) stays happy
        k: (v.grad.clone() if getattr(v, "grad", None) is not None
            else torch.zeros_like(v))
        for k, v in torch_model.state_dict(keep_vars=True).items()
    }

    model = ClassificationPerceiver(
        prep_type=PrepType.FOURIER_POS_CONVNET, **kwargs
    )
    template = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(img))
    variables, _ = convert_state_dict(sd, template)

    def loss_fn(params):
        logits = model.apply({**variables, "params": params}, jnp.asarray(img))
        return jnp.mean((logits - jnp.asarray(target)) ** 2)

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    grad_vars, _ = convert_state_dict(grad_sd, template)
    flat_ref = dict(
        jax.tree_util.tree_flatten_with_path(grad_vars["params"])[0]
    )
    checked = 0
    for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]:
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(flat_ref[path]), rtol=2e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )
        checked += 1
    assert checked == len(flat_ref) and checked > 20


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
