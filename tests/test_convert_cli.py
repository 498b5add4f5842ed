"""convert.py: the .pth <-> orbax conversion CLI's core round trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from perceiverio_pytorch_tpu.convert import convert
from perceiverio_pytorch_tpu.models import LanguagePerceiver
from perceiverio_pytorch_tpu.utils.torch_checkpoint import (
    LANGUAGE_OVERRIDES,
    LANGUAGE_TIED,
    save_torch_checkpoint,
)


def _tiny_language():
    model = LanguagePerceiver(
        vocab_size=262, max_seq_len=32, embed_dim=16,
        num_latents=8, num_latent_channels=32,
        num_self_attends_per_block=1, num_blocks=1,
    )
    tokens = jnp.zeros((1, 32), jnp.int32)
    mask = jnp.ones((1, 32), bool)
    variables = jax.jit(model.init)(jax.random.PRNGKey(3), tokens, mask)
    return model, variables, (tokens, mask)


def test_convert_roundtrip_pth_orbax_pth(tmp_path):
    model, variables, (tokens, mask) = _tiny_language()
    want = jax.jit(model.apply)(variables, tokens, mask)

    # native weights -> a reference-convention .pth
    pth_in = str(tmp_path / "ref.pth")
    save_torch_checkpoint(pth_in, variables, LANGUAGE_OVERRIDES, LANGUAGE_TIED)

    # .pth -> orbax (template from a fresh DIFFERENT-seed init: values must
    # come from the checkpoint, not the template)
    template = jax.jit(model.init)(
        jax.random.PRNGKey(9), tokens, mask
    )
    ckpt_dir = str(tmp_path / "orbax")
    unused = convert(pth_in, ckpt_dir, template, LANGUAGE_OVERRIDES)
    # the torch checkpoint stores the tied embedding twice; the alias key
    # is read from the preprocessor side and legitimately left unused
    assert set(unused) <= set(LANGUAGE_TIED)
    assert os.path.isdir(ckpt_dir)

    from perceiverio_pytorch_tpu.training.checkpoint import restore_variables

    restored = restore_variables(ckpt_dir, template=template)
    got = jax.jit(model.apply)(restored, tokens, mask)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )

    # orbax -> .pth again; the two torch checkpoints match key for key
    pth_out = str(tmp_path / "back.pth")
    convert(ckpt_dir, pth_out, template, LANGUAGE_OVERRIDES, LANGUAGE_TIED)
    sd_a = torch.load(pth_in, weights_only=False)["model_state_dict"]
    sd_b = torch.load(pth_out, weights_only=False)["model_state_dict"]
    assert set(sd_a) == set(sd_b)
    for k in sd_a:
        np.testing.assert_allclose(
            sd_a[k].numpy(), sd_b[k].numpy(), rtol=1e-6, atol=1e-7
        )


def test_convert_rejects_ambiguous_direction(tmp_path):
    _, variables, _ = _tiny_language()
    with pytest.raises(ValueError, match="exactly one"):
        convert("a.pth", "b.pth", variables)
    with pytest.raises(ValueError, match="exactly one"):
        convert(str(tmp_path / "a"), str(tmp_path / "b"), variables)
