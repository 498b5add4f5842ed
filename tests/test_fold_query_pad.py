"""fold_query_pad: the factored decoder-query path must match the
materialised concat bit-for-bit up to fp reassociation.

The multimodal decoder query is concat([pos features, broadcast constant
pad]) per modality (reference multimodal_perceiver.py:137-167); with
``policy.fold_query_pad`` the pad channels are folded through
LayerNorm + the Q projection analytically (core/attention.py
``_project_q_folded``) instead of being materialised.  These tests check
the folded and unfolded paths agree on the SAME parameters, in both the
forward values and the parameter gradients (the fold is
training-compatible).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceiverio_pytorch_tpu import PARITY
from perceiverio_pytorch_tpu.models import MultiModalPerceiver

MM_KWARGS = dict(
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

FOLDED = dataclasses.replace(PARITY, fold_query_pad=True)


@pytest.fixture(scope="module")
def mm_setup():
    rng = np.random.RandomState(7)
    images = jnp.asarray(rng.rand(1, 2, 3, 16, 16), jnp.float32)
    audio = jnp.asarray(rng.uniform(-1, 1, (1, 256, 1)), jnp.float32)
    base = MultiModalPerceiver(policy=PARITY, **MM_KWARGS)
    params = jax.jit(lambda k, i, a: base.init(k, i, a, 4))(
        jax.random.PRNGKey(0), images, audio
    )
    return images, audio, params


def test_param_structure_identical(mm_setup):
    images, audio, params = mm_setup
    folded = MultiModalPerceiver(policy=FOLDED, **MM_KWARGS)
    params_f = jax.jit(lambda k, i, a: folded.init(k, i, a, 4))(
        jax.random.PRNGKey(0), images, audio
    )
    paths = lambda tree: {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
    }
    assert paths(params) == paths(params_f)


def test_forward_equality(mm_setup):
    images, audio, params = mm_setup
    base = MultiModalPerceiver(policy=PARITY, **MM_KWARGS)
    folded = MultiModalPerceiver(policy=FOLDED, **MM_KWARGS)
    out_b = jax.jit(lambda p, i, a: base.apply(p, i, a, 4))(params, images, audio)
    out_f = jax.jit(lambda p, i, a: folded.apply(p, i, a, 4))(
        params, images, audio
    )
    for key in out_b:
        np.testing.assert_allclose(
            np.asarray(out_f[key]),
            np.asarray(out_b[key]),
            rtol=2e-4,
            atol=2e-5,
            err_msg=f"modality {key}",
        )


def test_fold_composes_with_chunk_mesh(mm_setup):
    """FoldedQuery must flow through the chunk-parallel decode path
    (nn.vmap over chunk indices, sharded over the mesh data axis)."""
    from perceiverio_pytorch_tpu.parallel import make_mesh

    images, audio, params = mm_setup
    base = MultiModalPerceiver(policy=PARITY, **MM_KWARGS)
    folded = MultiModalPerceiver(policy=FOLDED, **MM_KWARGS)
    mesh = make_mesh((8, 1))
    out_b = jax.jit(lambda p, i, a: base.apply(p, i, a, 8))(
        params, images, audio
    )
    out_f = jax.jit(
        lambda p, i, a: folded.apply(p, i, a, 8, chunk_mesh=mesh)
    )(params, images, audio)
    for key in out_b:
        np.testing.assert_allclose(
            np.asarray(out_f[key]),
            np.asarray(out_b[key]),
            rtol=2e-4,
            atol=2e-5,
            err_msg=f"modality {key}",
        )


def test_remat_decode_gradient_equality(mm_setup):
    """remat=True (chunk decode recomputed in backward -- required to fit
    full-scale multimodal training in HBM) must not change gradients."""
    images, audio, params = mm_setup
    base = MultiModalPerceiver(policy=PARITY, **MM_KWARGS)
    remat = MultiModalPerceiver(policy=PARITY, remat=True, **MM_KWARGS)

    def loss(model):
        def f(p):
            out = model.apply(p, images, audio, 4)
            return jnp.mean(out["image"] ** 2) + jnp.mean(out["label"] ** 2)

        return f

    trainable = params["params"]
    consts = {k: v for k, v in params.items() if k != "params"}
    g_b = jax.jit(jax.grad(lambda t: loss(base)({"params": t, **consts})))(
        trainable
    )
    g_r = jax.jit(jax.grad(lambda t: loss(remat)({"params": t, **consts})))(
        trainable
    )
    for (k, vb), (_, vr) in zip(
        jax.tree_util.tree_leaves_with_path(g_b),
        jax.tree_util.tree_leaves_with_path(g_r),
    ):
        np.testing.assert_allclose(
            np.asarray(vr),
            np.asarray(vb),
            rtol=1e-5,
            atol=1e-6,  # recompute reassociates fp32 sums (~1e-7 noise)
            err_msg=jax.tree_util.keystr(k),
        )


def test_gradient_equality(mm_setup):
    images, audio, params = mm_setup
    base = MultiModalPerceiver(policy=PARITY, **MM_KWARGS)
    folded = MultiModalPerceiver(policy=FOLDED, **MM_KWARGS)

    def loss(model):
        def f(p):
            out = model.apply(p, images, audio, 4)
            return (
                jnp.mean(out["image"] ** 2)
                + jnp.mean(out["audio"] ** 2)
                + jnp.mean(out["label"] ** 2)
            )

        return f

    trainable = params["params"]
    consts = {k: v for k, v in params.items() if k != "params"}
    g_b = jax.jit(jax.grad(lambda t: loss(base)({"params": t, **consts})))(
        trainable
    )
    g_f = jax.jit(jax.grad(lambda t: loss(folded)({"params": t, **consts})))(
        trainable
    )
    flat_b = jax.tree_util.tree_leaves_with_path(g_b)
    flat_f = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(g_f)
    )
    for key, vb in flat_b:
        vf = flat_f[jax.tree_util.keystr(key)]
        np.testing.assert_allclose(
            np.asarray(vf),
            np.asarray(vb),
            rtol=5e-4,
            atol=5e-6,
            err_msg=jax.tree_util.keystr(key),
        )
