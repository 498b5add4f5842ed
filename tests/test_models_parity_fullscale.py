"""FULL-scale exact-config parity vs the PyTorch reference, with the
PRODUCTION attention paths engaged (Pallas flash in interpreter mode,
FoldedQuery decoder-pad fold) -- not just the XLA fallback.

These close the round-2 certification gap: the mid-scale oracles
(test_models_parity_midscale.py) reduce spatial extents for flow and
multimodal, so the exact shapes where the flash kernel and the query-pad
fold engage on TPU (flow's 182,528-token tile, the full Kinetics chunk
decode) were never put against the torch reference.  Reference configs:
/root/reference/perceiver_io/flow_perceiver.py:34-42 (368x496 tile, 2048x512
latents, 24 self-attends, 16 heads), multimodal_perceiver.py:30-41 (224x224
x16 frames, 784x512 latents, 704-ch input concat, 1026-ch query).

Interpreter-mode flash uses LARGE block sizes (Policy.flash_block_q/k):
the interpreter's unit of overhead is the grid cell, and 182k tokens at the
hardware blocks (512x1024) is ~700 cells -- hours on one CPU core.  Block
size does not change kernel math (same online-softmax recurrence, blocks
only tile the loops), so the code path certified here is the one TPU runs.

Each test is several minutes on one CPU core; deselect with ``-m "not
slow"``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceiverio_pytorch_tpu import Policy
from perceiverio_pytorch_tpu.ops.attention import attention_path
from perceiverio_pytorch_tpu.utils.torch_checkpoint import convert_state_dict

from conftest import requires_reference
from parity_utils import randomize_state_dict, to_numpy

# Same budget as the mid-scale oracles: accumulated fp32 rounding over
# 24-26 attention layers at real width, plus the flash kernel's online
# softmax reassociation.
TOL = dict(rtol=2e-3, atol=2e-4)


@requires_reference
@pytest.mark.slow
def test_flow_parity_full_scale_flash():
    """One flow tile at the EXACT shipped config -- 368x496 (182,528
    tokens), 2048x512 latents, 24 self-attends, 16 heads -- vs the live
    torch reference, with ALL THREE attention sites on the Pallas flash
    kernel (interpret mode), exactly as dispatched on TPU."""
    import torch
    from perceiver_io.flow_perceiver import FlowPerceiver as TorchFlow

    from perceiverio_pytorch_tpu.models import FlowPerceiver

    # The production TPU dispatch puts every site on flash at these shapes:
    # encoder cross-attend (2048 latents <- 182,528 tokens), latent
    # self-attends (T=2048 >= flash_min_self), decoder cross-attend
    # (182,528 queries x 2048 latents via the long-Q rule).
    assert attention_path("auto", q_len=2048, kv_len=182528, interpret=True) == "flash"
    assert attention_path("auto", q_len=2048, kv_len=2048, interpret=True) == "flash"
    assert attention_path("auto", q_len=182528, kv_len=2048, interpret=True) == "flash"

    torch_model = TorchFlow().eval()
    sd = randomize_state_dict(torch_model, seed=20)

    rng = np.random.RandomState(20)
    img1 = rng.uniform(-1, 1, (1, 3, 368, 496)).astype(np.float32)
    img2 = rng.uniform(-1, 1, (1, 3, 368, 496)).astype(np.float32)

    with torch.inference_mode():
        torch_out = to_numpy(
            torch_model(
                torch.from_numpy(img1), torch.from_numpy(img2), test_mode=False
            )
        )

    # Param trees are policy-invariant: init with the cheap XLA path, apply
    # with the production flash dispatch (interpret mode on CPU).
    init_model = FlowPerceiver()
    template = jax.jit(init_model.init)(
        jax.random.PRNGKey(0), jnp.asarray(img1), jnp.asarray(img2)
    )
    variables, unused = convert_state_dict(sd, template)
    assert unused == []

    flash_model = FlowPerceiver(
        policy=Policy(interpret=True, flash_block_q=8192, flash_block_k=16384)
    )
    out = np.asarray(
        jax.jit(flash_model.apply)(
            variables, jnp.asarray(img1), jnp.asarray(img2)
        )
    )
    assert out.shape == torch_out.shape
    np.testing.assert_allclose(out, torch_out, **TOL)


@requires_reference
@pytest.mark.slow
def test_multimodal_parity_full_scale_chunked():
    """The full-width Kinetics config -- 224x224 x16 frames (802,816 image
    queries), 784x512 latents, real 704-ch input concat and 1026-ch decoder
    query -- through the chunked decode with the production paths engaged:
    flash encoder cross-attend (Tk~52k, interpret mode) and the FoldedQuery
    decoder-pad fold (fold_query_pad=True); the decode cross-attend takes
    the short-KV XLA rule exactly as on TPU (kv=784 < flash_long_q_min_kv).

    n_chunks=8 (shipped example uses 128): outputs are chunk-count
    invariant (test_models_parity.py covers invariance) and the torch
    reference re-encodes the 52k-token input once PER chunk, so 128 chunks
    is hours on one CPU core."""
    import torch
    from perceiver_io.multimodal_perceiver import MultiModalPerceiver as TorchMM

    from perceiverio_pytorch_tpu.models import MultiModalPerceiver

    # Encoder cross-attend dispatches to flash; decode takes the XLA
    # short-KV rule (the round-2 +6% win) -- same choices as on TPU.
    n_tokens = 50176 + 1920 + 1  # image + audio + label concat
    assert attention_path("auto", q_len=784, kv_len=n_tokens, interpret=True) == "flash"
    assert (
        attention_path("auto", q_len=100352 + 3840 + 1, kv_len=784, interpret=True)
        == "xla"
    )

    n_chunks = 8
    torch_model = TorchMM().eval()
    sd = randomize_state_dict(torch_model, seed=21)

    rng = np.random.RandomState(21)
    images = rng.rand(1, 16, 3, 224, 224).astype(np.float32)
    audio = rng.uniform(-1, 1, (1, 16 * 1920, 1)).astype(np.float32)

    with torch.inference_mode():
        torch_out = torch_model(
            torch.from_numpy(images), torch.from_numpy(audio), n_chunks=n_chunks
        )

    init_model = MultiModalPerceiver()
    template = jax.jit(lambda k, i, a: init_model.init(k, i, a, n_chunks))(
        jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(audio)
    )
    variables, unused = convert_state_dict(sd, template)
    assert unused == []

    prod_model = MultiModalPerceiver(
        policy=Policy(
            interpret=True, fold_query_pad=True, flash_block_k=16384
        )
    )
    out = jax.jit(lambda v, i, a: prod_model.apply(v, i, a, n_chunks))(
        variables, jnp.asarray(images), jnp.asarray(audio)
    )
    for key in ("image", "audio", "label"):
        ours = np.asarray(out[key])
        theirs = to_numpy(torch_out[key])
        assert ours.shape == theirs.shape, key
        np.testing.assert_allclose(ours, theirs, err_msg=key, **TOL)
