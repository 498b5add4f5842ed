"""Pipeline parallelism (parallel/pipeline.py) on the virtual 8-device CPU
mesh: GPipe schedule over a depth-sharded distinct-layer self-attend stack
(flow ships 24 such layers -- flow_perceiver.py:34-42)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceiverio_pytorch_tpu.core.attention import SelfAttention
from perceiverio_pytorch_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    pipeline_spmd,
    pipelined_self_attends,
    stack_layer_params,
    unstack_layer_params,
)

B, N, D = 8, 16, 32
N_LAYERS = 8


def _layer():
    return SelfAttention(in_channels=D, num_heads=4, widening_factor=1)


def _make_stack(n_layers=N_LAYERS, seed=0):
    layer = _layer()
    x = jnp.zeros((1, N, D), jnp.float32)
    params = {
        str(i): jax.jit(layer.init)(jax.random.PRNGKey(seed + i), x)["params"]
        for i in range(n_layers)
    }
    return layer, params


def _sequential(layer, params, x, num_blocks=1):
    for _ in range(num_blocks):
        for i in range(len(params)):
            x = layer.apply({"params": params[str(i)]}, x, deterministic=True)
    return x


@pytest.fixture(scope="module")
def stack():
    return _make_stack()


@pytest.fixture(scope="module")
def latents():
    return jnp.asarray(np.random.RandomState(0).randn(B, N, D), jnp.float32)


@pytest.mark.parametrize("n_stages,num_microbatches", [(4, 4), (2, 8), (8, 2)])
def test_pipeline_matches_sequential(stack, latents, n_stages,
                                     num_microbatches):
    layer, params = stack
    mesh = make_pipeline_mesh(n_stages)
    got = pipelined_self_attends(
        layer, params, latents, mesh, num_microbatches=num_microbatches
    )
    want = _sequential(layer, params, latents)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_pipeline_composes_with_data_parallel(stack, latents):
    layer, params = stack
    mesh = make_pipeline_mesh(4, data=2)
    got = pipelined_self_attends(
        layer, params, latents, mesh, num_microbatches=2
    )
    np.testing.assert_allclose(
        got, _sequential(layer, params, latents), rtol=2e-4, atol=2e-5
    )


def test_pipeline_weight_shared_blocks(stack, latents):
    """num_blocks > 1 re-enters the pipeline with shared weights, matching
    the encoder's block loop (reference perceiver.py:104-106)."""
    layer, params = stack
    mesh = make_pipeline_mesh(4)
    got = pipelined_self_attends(
        layer, params, latents, mesh, num_microbatches=4, num_blocks=2
    )
    np.testing.assert_allclose(
        got, _sequential(layer, params, latents, num_blocks=2),
        rtol=2e-4, atol=2e-5,
    )


def test_pipeline_under_jit_from_stacked(stack, latents):
    """The train-step form: params pre-stacked, whole pipeline jitted."""
    layer, params = stack
    mesh = make_pipeline_mesh(4)
    stacked = stack_layer_params(params, 4)

    @jax.jit
    def fwd(stacked, x):
        return pipelined_self_attends(
            layer, stacked, x, mesh, num_microbatches=4, stacked=True
        )

    np.testing.assert_allclose(
        fwd(stacked, latents), _sequential(layer, params, latents),
        rtol=2e-4, atol=2e-5,
    )


def test_pipeline_gradients_match_sequential(stack, latents):
    """The GPipe schedule is plain scan+ppermute+masked updates -- AD-exact.
    Gradients wrt every layer's params must equal the sequential stack's."""
    layer, params = stack
    mesh = make_pipeline_mesh(4)
    stacked = stack_layer_params(params, 4)

    def loss_pipe(stacked):
        out = pipelined_self_attends(
            layer, stacked, latents, mesh, num_microbatches=4, stacked=True
        )
        return jnp.sum(out**2)

    def loss_seq(params):
        return jnp.sum(_sequential(layer, params, latents) ** 2)

    g_pipe = jax.jit(jax.grad(loss_pipe))(stacked)
    g_seq = jax.jit(jax.grad(loss_seq))(params)
    g_seq_stacked = stack_layer_params(g_seq, 4)
    jax.tree.map(
        # grads are O(100) here (sum-of-squares loss): scale atol accordingly
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-3),
        g_pipe, g_seq_stacked,
    )


def test_stack_unstack_roundtrip(stack):
    _, params = stack
    stacked = stack_layer_params(params, 4)
    back = unstack_layer_params(stacked)
    assert set(back) == set(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b), back, params
    )


def test_pipeline_from_encoder_params(latents):
    """Name compatibility with the real encoder tree: the children of
    encoder ``self_attends`` (core/perceiver.py:100-113) apply verbatim
    through a standalone SelfAttention."""
    from perceiverio_pytorch_tpu.core.perceiver import PerceiverEncoder

    enc = PerceiverEncoder(
        num_input_channels=D,
        num_self_attends_per_block=4,
        num_blocks=1,
        num_latents=N,
        num_latent_channels=D,
        num_self_attend_heads=4,
        num_cross_attend_heads=1,
    )
    tokens = jnp.asarray(np.random.RandomState(1).randn(B, 10, D), jnp.float32)
    variables = jax.jit(enc.init)(
        jax.random.PRNGKey(0), tokens, jnp.zeros((B, N, D), jnp.float32)
    )
    layer_params = variables["params"]["self_attends"]

    layer = SelfAttention(in_channels=D, num_heads=4, widening_factor=1)
    mesh = make_pipeline_mesh(4)
    got = pipelined_self_attends(
        layer, layer_params, latents, mesh, num_microbatches=4
    )
    want = latents
    for i in range(4):
        want = layer.apply(
            {"params": layer_params[str(i)]}, want, deterministic=True
        )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize(
    "n_stages,circ,num_mb", [(4, 2, 4), (2, 2, 4), (2, 4, 2), (4, 2, 8)]
)
def test_circular_pipeline_matches_sequential(stack, latents, n_stages,
                                              circ, num_mb):
    """Interleaved schedule: round-robin layer groups, v ring cycles per
    microbatch, recirculation buffer on stage 0 -- outputs exactly equal
    the sequential stack."""
    layer, params = stack
    mesh = make_pipeline_mesh(n_stages)
    got = pipelined_self_attends(
        layer, params, latents, mesh, num_microbatches=num_mb,
        circ_repeats=circ,
    )
    want = _sequential(layer, params, latents)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_circular_stack_unstack_roundtrip(stack):
    from perceiverio_pytorch_tpu.parallel.pipeline import (
        unstack_layer_params_circular)

    _, params = stack
    stacked = stack_layer_params(params, 2, circ_repeats=2)
    leaves = jax.tree.leaves(stacked)
    assert leaves[0].shape[:3] == (2, 2, 2)  # [stages, repeats, per]
    back = unstack_layer_params_circular(stacked)
    assert sorted(back) == sorted(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        back, params,
    )


def test_circular_pipeline_gradients_match_sequential(stack, latents):
    layer, params = stack
    mesh = make_pipeline_mesh(4)

    def loss_pipe(params):
        out = pipelined_self_attends(
            layer, params, latents, mesh, num_microbatches=4,
            circ_repeats=2,
        )
        return jnp.sum(out**2)

    def loss_seq(params):
        return jnp.sum(_sequential(layer, params, latents) ** 2)

    g_pipe = jax.jit(jax.grad(loss_pipe))(params)
    g_seq = jax.jit(jax.grad(loss_seq))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-3
        ),
        g_pipe, g_seq,
    )


def test_circular_pipeline_dropout_reproducible(stack, latents):
    layer, params = stack
    layer_d = SelfAttention(
        in_channels=D, num_heads=4, widening_factor=1, dropout_prob=0.3
    )
    mesh = make_pipeline_mesh(4)

    def run(seed):
        return np.asarray(pipelined_self_attends(
            layer_d, params, latents, mesh, num_microbatches=4,
            circ_repeats=2, dropout_rng=jax.random.PRNGKey(seed),
        ))

    a1, a2, b = run(1), run(1), run(2)
    det = np.asarray(pipelined_self_attends(
        layer, params, latents, mesh, num_microbatches=4, circ_repeats=2,
    ))
    np.testing.assert_array_equal(a1, a2)
    assert not np.allclose(a1, b)
    assert not np.allclose(a1, det)
    assert np.all(np.isfinite(a1))


def test_circular_pipeline_rejects_short_ring(stack, latents):
    """The recirculation slot frees exactly M ticks after fill; M < S would
    need the item before it arrives."""
    layer, params = stack
    mesh = make_pipeline_mesh(4)
    with pytest.raises(ValueError, match="circular"):
        pipelined_self_attends(
            layer, params, latents, mesh, num_microbatches=2,
            circ_repeats=2,
        )


def test_policy_pp_circ_repeats_encoder_matches_sequential(latents):
    """Model route: Policy(pp_circ_repeats=2) runs the interleaved schedule
    inside _SelfAttendStack; outputs match the sequential encoder."""
    from perceiverio_pytorch_tpu.config import Policy

    tokens = jnp.asarray(np.random.RandomState(13).randn(B, 10, D),
                         jnp.float32)
    base = _encoder(Policy(), n_layers=8)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), tokens, latents)

    mesh = make_pipeline_mesh(2)
    piped = _encoder(
        Policy(pp_mesh=mesh, pp_microbatches=4, pp_circ_repeats=2),
        n_layers=8,
    )
    want = jax.jit(base.apply)(variables, tokens, latents)
    got = jax.jit(piped.apply)(variables, tokens, latents)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_pipeline_rejects_bad_partitions(stack, latents):
    layer, params = stack
    with pytest.raises(ValueError, match="stages"):
        stack_layer_params(params, 3)
    mesh = make_pipeline_mesh(4)
    with pytest.raises(ValueError, match="microbatches"):
        pipelined_self_attends(
            layer, params, latents, mesh, num_microbatches=3
        )


def _encoder(policy, n_layers=4, num_blocks=1, dropout_prob=0.0):
    from perceiverio_pytorch_tpu.core.perceiver import PerceiverEncoder

    return PerceiverEncoder(
        num_input_channels=D,
        num_self_attends_per_block=n_layers,
        num_blocks=num_blocks,
        num_latents=N,
        num_latent_channels=D,
        num_self_attend_heads=4,
        num_cross_attend_heads=1,
        dropout_prob=dropout_prob,
        policy=policy,
    )


@pytest.mark.parametrize("num_blocks", [1, 2])
def test_policy_pp_mesh_encoder_matches_sequential(latents, num_blocks):
    """The model-level route: Policy(pp_mesh=...) pipelines the encoder's
    latent stack transparently; outputs match the sequential stack."""
    from perceiverio_pytorch_tpu.config import Policy

    tokens = jnp.asarray(np.random.RandomState(4).randn(B, 10, D), jnp.float32)
    base = _encoder(Policy(), num_blocks=num_blocks)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), tokens, latents)

    mesh = make_pipeline_mesh(4)
    piped = _encoder(
        Policy(pp_mesh=mesh, pp_microbatches=2), num_blocks=num_blocks
    )
    want = jax.jit(base.apply)(variables, tokens, latents)
    got = jax.jit(piped.apply)(variables, tokens, latents)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_policy_pp_mesh_encoder_gradients(latents):
    """Differentiability of the model-level route: grads wrt ALL encoder
    params (incl. the pipelined stack's) match the sequential encoder's."""
    from perceiverio_pytorch_tpu.config import Policy

    tokens = jnp.asarray(np.random.RandomState(5).randn(B, 10, D), jnp.float32)
    base = _encoder(Policy())
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), tokens, latents)

    mesh = make_pipeline_mesh(4)
    piped = _encoder(Policy(pp_mesh=mesh, pp_microbatches=2))

    def loss(model):
        def f(params):
            out = model.apply({"params": params}, tokens, latents)
            return jnp.sum(out**2)

        return f

    g_pipe = jax.jit(jax.grad(loss(piped)))(variables["params"])
    g_seq = jax.jit(jax.grad(loss(base)))(variables["params"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-3),
        g_pipe, g_seq,
    )


def test_policy_pp_mesh_guards(latents):
    from perceiverio_pytorch_tpu.config import Policy

    tokens = jnp.asarray(np.random.RandomState(6).randn(B, 10, D), jnp.float32)
    mesh = make_pipeline_mesh(4)

    # layer count must divide the stage count
    bad = _encoder(Policy(pp_mesh=mesh), n_layers=3)
    variables = jax.jit(bad.init)(jax.random.PRNGKey(0), tokens, latents)
    with pytest.raises(ValueError, match="stages"):
        bad.apply(variables, tokens, latents)


def test_policy_pp_mesh_dropout_training(latents):
    """Dropout trains THROUGH the pipeline: per-(tick, stage, layer) keys are
    folded from the "dropout" rng inside the GPipe scan.  Reproducible for a
    fixed rng, different across rngs, and actually dropping (differs from the
    deterministic pass)."""
    from perceiverio_pytorch_tpu.config import Policy

    tokens = jnp.asarray(np.random.RandomState(7).randn(B, 10, D), jnp.float32)
    mesh = make_pipeline_mesh(4)
    drop = _encoder(Policy(pp_mesh=mesh, pp_microbatches=2), dropout_prob=0.3)
    dvars = jax.jit(drop.init)(jax.random.PRNGKey(0), tokens, latents)

    def run(seed):
        return drop.apply(
            dvars, tokens, latents, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(seed)},
        )

    a1, a2, b = run(1), run(1), run(2)
    det = drop.apply(dvars, tokens, latents)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert not np.allclose(np.asarray(a1), np.asarray(b))
    assert not np.allclose(np.asarray(a1), np.asarray(det))
    assert np.all(np.isfinite(np.asarray(a1)))


def test_policy_pp_mesh_dropout_gradients(latents):
    """A dropout training step through the pipelined route yields finite
    grads for every param (the dropout masks are data; AD flows through)."""
    from perceiverio_pytorch_tpu.config import Policy

    tokens = jnp.asarray(np.random.RandomState(8).randn(B, 10, D), jnp.float32)
    mesh = make_pipeline_mesh(4)
    drop = _encoder(Policy(pp_mesh=mesh, pp_microbatches=2), dropout_prob=0.2)
    dvars = jax.jit(drop.init)(jax.random.PRNGKey(0), tokens, latents)

    def loss(params):
        out = drop.apply(
            {"params": params}, tokens, latents, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        return jnp.sum(out**2)

    g = jax.jit(jax.grad(loss))(dvars["params"])
    leaves = jax.tree.leaves(g)
    assert leaves and all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # the pipelined stack's params all receive gradient signal
    stack_g = jax.tree.leaves(g["self_attends"])
    assert all(np.any(np.asarray(l) != 0) for l in stack_g)


def test_pipeline_dropout_masks_independent_per_microbatch(stack):
    """Two identical rows placed in DIFFERENT microbatches must draw
    different dropout masks (per-tick key folding), so their outputs differ;
    the deterministic pass maps them identically."""
    layer, params = stack
    mesh = make_pipeline_mesh(4)
    row = np.random.RandomState(9).randn(1, N, D)
    x = jnp.asarray(np.tile(row, (B, 1, 1)), jnp.float32)

    det = pipelined_self_attends(layer, params, x, mesh, num_microbatches=4)
    det = np.asarray(det)
    np.testing.assert_allclose(det[0], det[-1], rtol=1e-6, atol=1e-6)

    # same param tree, dropout enabled (nn.Dropout holds no params)
    layer_d = SelfAttention(
        in_channels=D, num_heads=4, widening_factor=1, dropout_prob=0.4
    )
    got = pipelined_self_attends(
        layer_d, params, x, mesh, num_microbatches=4,
        dropout_rng=jax.random.PRNGKey(0),
    )
    got = np.asarray(got)
    # rows 0 and 7 sit in microbatches 0 and 3 -> independent masks
    assert not np.allclose(got[0], got[-1])
    assert np.all(np.isfinite(got))


def test_generic_pipeline_spmd_stage_fn():
    """pipeline_spmd is model-agnostic: any shape-preserving stage body."""
    mesh = make_pipeline_mesh(4)
    w = jnp.asarray(np.random.RandomState(2).randn(4, 1, D, D), jnp.float32)
    x = jnp.asarray(np.random.RandomState(3).randn(B, D), jnp.float32)

    def stage_fn(local_w, h):
        def body(h, wi):
            return jnp.tanh(h @ wi), None

        y, _ = jax.lax.scan(body, h, local_w)
        return y

    got = pipeline_spmd(stage_fn, w, x, mesh, num_microbatches=4)
    want = x
    for i in range(4):
        want = jnp.tanh(want @ w[i, 0])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_pp_sharded_training_parity(stack, latents):
    """The memory-scaling training path: stacked params + adam state sharded
    over the pipe axis (each device holds ONLY its stage's layers), trained
    through the GPipe schedule -- final params match per-layer sequential
    training step for step (adam is elementwise, the pipeline is AD-exact)."""
    import optax
    from perceiverio_pytorch_tpu.parallel.pipeline import pp_param_shardings

    layer, params = stack
    mesh = make_pipeline_mesh(4)
    stacked = stack_layer_params(params, 4)
    sh = pp_param_shardings(stacked, mesh)
    stacked = jax.tree.map(jax.device_put, stacked, sh)

    # each device holds exactly its stage slice: 1/4 of the stack
    leaf = jax.tree.leaves(stacked)[0]
    shard0 = leaf.addressable_shards[0]
    assert shard0.data.shape[0] == 1 and leaf.shape[0] == 4

    from jax.sharding import NamedSharding, PartitionSpec as P

    def opt_shardings(tx):
        # state leaves shaped like params get the pipe sharding; scalars
        # (adam's count) replicate
        return jax.tree.map(
            lambda l: NamedSharding(
                mesh, P("pipe") if l.ndim >= 1 and l.shape[0] == 4 else P()
            ),
            jax.eval_shape(tx.init, stacked),
        )

    # adam moments are stage-local: each device holds 1/4 of mu
    adam = optax.adam(1e-2)
    adam_state = jax.jit(
        adam.init, in_shardings=(sh,), out_shardings=opt_shardings(adam)
    )(stacked)
    mu_leaf = jax.tree.leaves(adam_state[0].mu)[0]
    assert mu_leaf.addressable_shards[0].data.shape[0] == 1

    # Parity loop uses an optimizer LINEAR in the grads (sgd+momentum, its
    # trace pipe-sharded like adam's moments): adam's first step is
    # lr*sign(g), which amplifies fp-level noise between the pipeline's
    # per-microbatch GEMMs and the full-batch sequential ones.
    tx = optax.sgd(1e-2, momentum=0.9)
    opt = jax.jit(
        tx.init, in_shardings=(sh,), out_shardings=opt_shardings(tx)
    )(stacked)
    assert (
        jax.tree.leaves(opt[0].trace)[0].addressable_shards[0].data.shape[0]
        == 1
    )

    def pipe_loss(stacked):
        out = pipelined_self_attends(
            layer, stacked, latents, mesh, num_microbatches=4, stacked=True
        )
        return jnp.mean(out**2)

    def _pipe_step(stacked, opt):
        loss, grads = jax.value_and_grad(pipe_loss)(stacked)
        updates, opt = tx.update(grads, opt, stacked)
        return optax.apply_updates(stacked, updates), opt, loss

    pipe_step = jax.jit(_pipe_step)

    def seq_loss(params):
        return jnp.mean(_sequential(layer, params, latents) ** 2)

    def _seq_step(params, opt):
        loss, grads = jax.value_and_grad(seq_loss)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    seq_step = jax.jit(_seq_step)
    seq_params, seq_opt = params, jax.jit(tx.init)(params)

    for _ in range(3):
        stacked, opt, pipe_l = pipe_step(stacked, opt)
        seq_params, seq_opt, seq_l = seq_step(seq_params, seq_opt)
        np.testing.assert_allclose(
            float(pipe_l), float(seq_l), rtol=2e-4, atol=1e-6
        )

    # trained params unstack back to the portable per-layer layout and match
    back = unstack_layer_params(stacked)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5),
        back, seq_params,
    )


def test_pp_sharded_training_circular(stack, latents):
    """Stage-local training state with the circular layout [S, v, per]:
    pp_param_shardings shards dim 0 (the stage dim) unchanged, sgd+momentum
    steps through the interleaved schedule track sequential training, and
    unstack_layer_params_circular recovers the trained per-layer tree."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from perceiverio_pytorch_tpu.parallel.pipeline import (
        pp_param_shardings, unstack_layer_params_circular)

    layer, params = stack
    mesh = make_pipeline_mesh(2)
    stacked = stack_layer_params(params, 2, circ_repeats=2)
    sh = pp_param_shardings(stacked, mesh)
    stacked = jax.tree.map(jax.device_put, stacked, sh)
    leaf = jax.tree.leaves(stacked)[0]
    assert leaf.addressable_shards[0].data.shape[0] == 1  # stage-local

    tx = optax.sgd(1e-2, momentum=0.9)
    opt_sh = jax.tree.map(
        lambda l: NamedSharding(
            mesh, P("pipe") if l.ndim >= 1 and l.shape[0] == 2 else P()
        ),
        jax.eval_shape(tx.init, stacked),
    )
    opt = jax.jit(tx.init, in_shardings=(sh,), out_shardings=opt_sh)(stacked)

    def pipe_loss(stacked):
        out = pipelined_self_attends(
            layer, stacked, latents, mesh, num_microbatches=4,
            stacked=True, circ_repeats=2,
        )
        return jnp.mean(out**2)

    @jax.jit
    def pipe_step(stacked, opt):
        loss, grads = jax.value_and_grad(pipe_loss)(stacked)
        updates, opt = tx.update(grads, opt, stacked)
        return optax.apply_updates(stacked, updates), opt, loss

    def seq_loss(params):
        return jnp.mean(_sequential(layer, params, latents) ** 2)

    @jax.jit
    def seq_step(params, opt):
        loss, grads = jax.value_and_grad(seq_loss)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    seq_params, seq_opt = params, jax.jit(tx.init)(params)
    for _ in range(2):
        stacked, opt, pipe_l = pipe_step(stacked, opt)
        seq_params, seq_opt, seq_l = seq_step(seq_params, seq_opt)
        np.testing.assert_allclose(
            float(pipe_l), float(seq_l), rtol=2e-4, atol=1e-6
        )
    back = unstack_layer_params_circular(stacked)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5),
        back, seq_params,
    )


def test_policy_pp_mesh_flow_model():
    """The flagship pp use case end-to-end: FlowPerceiver is THE deep
    distinct-layer stack (24 layers, num_blocks=1 at full scale --
    flow_perceiver.py:34-42). Tiny config, pipelined vs sequential."""
    from perceiverio_pytorch_tpu.config import Policy
    from perceiverio_pytorch_tpu.models import FlowPerceiver

    rng = np.random.RandomState(8)
    im1 = jnp.asarray(rng.uniform(-1, 1, (2, 3, 16, 16)), jnp.float32)
    im2 = jnp.asarray(rng.uniform(-1, 1, (2, 3, 16, 16)), jnp.float32)

    kw = dict(
        img_size=(16, 16),
        num_latents=8,
        num_latent_channels=32,
        num_self_attends_per_block=4,
        num_blocks=1,
    )
    base = FlowPerceiver(policy=Policy(), **kw)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), im1, im2)
    want = jax.jit(base.apply)(variables, im1, im2)

    mesh = make_pipeline_mesh(4)
    piped = FlowPerceiver(
        policy=Policy(pp_mesh=mesh, pp_microbatches=2), **kw
    )
    got = jax.jit(piped.apply)(variables, im1, im2)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("circ", [1, 2])
def test_policy_pp_mesh_composes_with_remat(latents, circ):
    """pp_mesh under the encoder's nn.remat wrapper (full-scale flow
    training uses remat=True): forward matches and grads exist.  circ=2
    additionally runs the circular (interleaved) schedule inside remat."""
    from perceiverio_pytorch_tpu.config import Policy

    tokens = jnp.asarray(np.random.RandomState(9).randn(B, 10, D), jnp.float32)

    def enc(policy):
        from perceiverio_pytorch_tpu.core.perceiver import PerceiverEncoder

        return PerceiverEncoder(
            num_input_channels=D, num_self_attends_per_block=4, num_blocks=2,
            num_latents=N, num_latent_channels=D, num_self_attend_heads=4,
            num_cross_attend_heads=1, policy=policy, remat=True,
        )

    base = enc(Policy())
    v = jax.jit(base.init)(jax.random.PRNGKey(0), tokens, latents)
    want = jax.jit(base.apply)(v, tokens, latents)

    piped = enc(Policy(pp_mesh=make_pipeline_mesh(2 if circ > 1 else 4),
                       pp_microbatches=2, pp_circ_repeats=circ))
    got = jax.jit(piped.apply)(v, tokens, latents)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    g = jax.jit(
        jax.grad(
            lambda p: jnp.sum(piped.apply(p, tokens, latents) ** 2)
        )
    )(v)
    assert all(
        bool(np.isfinite(np.asarray(l)).all()) for l in jax.tree.leaves(g)
    )


@pytest.mark.parametrize("num_blocks,circ", [(1, 1), (2, 1), (1, 2)])
def test_policy_pp_mesh_with_int8_static(latents, num_blocks, circ):
    """Calibrated static-int8 + pipeline: the calibration pass (mutable
    quant_stats) stays sequential by design, and ordinary applies stream
    the per-layer quant_stats through the GPipe stages alongside params --
    output matches the sequential int8_static apply exactly.  num_blocks=2
    also covers the call-time fn-lifted block scan (static-quant models
    cannot class-scan -- core/perceiver.py)."""
    from perceiverio_pytorch_tpu.config import Policy

    tokens = jnp.asarray(
        np.random.RandomState(10).randn(B, 10, D), jnp.float32
    )
    mesh = make_pipeline_mesh(2 if circ > 1 else 4)
    seq_pol = Policy(quant="int8_static")
    pp_pol = Policy(quant="int8_static", pp_mesh=mesh, pp_microbatches=2,
                    pp_circ_repeats=circ)

    base = _encoder(seq_pol, num_blocks=num_blocks)
    piped = _encoder(pp_pol, num_blocks=num_blocks)
    v = jax.jit(base.init)(jax.random.PRNGKey(0), tokens, latents)
    # calibration fills quant_stats (sequential even under pp -- guarded)
    _, stats = jax.jit(
        lambda v, t, l: piped.apply(v, t, l, mutable=["quant_stats"])
    )(v, tokens, latents)
    v = {**v, **stats}

    want = jax.jit(base.apply)(v, tokens, latents)
    got = jax.jit(piped.apply)(v, tokens, latents)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_policy_pp_mesh_full_train_step():
    """Realistic usage: a task model built with Policy(pp_mesh=...) drops
    into the standard donated make_train_step unchanged (grads through the
    GPipe shard_map inside the jitted update); loss descends."""
    import optax

    from perceiverio_pytorch_tpu.config import Policy
    from perceiverio_pytorch_tpu.models import LanguagePerceiver
    from perceiverio_pytorch_tpu.training import (
        create_train_state, make_train_step, masked_token_cross_entropy)

    mesh = make_pipeline_mesh(4, data=2)
    model = LanguagePerceiver(
        vocab_size=262, max_seq_len=32, embed_dim=16,
        num_latents=8, num_latent_channels=32,
        num_self_attends_per_block=4, num_blocks=1,
        policy=Policy(pp_mesh=mesh, pp_microbatches=2),
    )
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(6, 262, (4, 32)), jnp.int32)
    mask = jnp.ones((4, 32), bool)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens, mask)

    def loss_fn(params, tokens, mask):
        logits = model.apply(params, tokens, mask)
        return masked_token_cross_entropy(logits, tokens, mask)

    tx = optax.adam(1e-3)
    step = make_train_step(loss_fn, tx)
    state = create_train_state(params, tx)
    losses = []
    for _ in range(3):
        state, loss = step(state, tokens, mask)
        losses.append(float(loss))
    assert losses[2] < losses[0], losses


def test_policy_pp_mesh_dropout_train_step(latents):
    """Dropout training through the PP route in the standard donated train
    step: the per-step rng rides along as a batch arg and the model draws
    its pipelined per-site keys from it."""
    import optax

    from perceiverio_pytorch_tpu.config import Policy
    from perceiverio_pytorch_tpu.training import (
        create_train_state, make_train_step)

    tokens = jnp.asarray(np.random.RandomState(12).randn(B, 10, D),
                         jnp.float32)
    mesh = make_pipeline_mesh(4)
    enc = _encoder(Policy(pp_mesh=mesh, pp_microbatches=2), dropout_prob=0.1)
    variables = jax.jit(enc.init)(jax.random.PRNGKey(0), tokens, latents)

    def loss_fn(params, tokens, latents, rng):
        out = enc.apply(
            {"params": params}, tokens, latents, deterministic=False,
            rngs={"dropout": rng},
        )
        return jnp.mean(out**2)

    tx = optax.sgd(1e-2)
    step = make_train_step(loss_fn, tx)
    state = create_train_state(variables["params"], tx)
    p0 = jax.tree.map(np.asarray, state.params)
    key = jax.random.PRNGKey(7)
    for i in range(2):
        state, loss = step(state, tokens, latents, jax.random.fold_in(key, i))
        assert np.isfinite(float(loss))
    moved = jax.tree.map(
        lambda a, b: np.any(np.asarray(a) != b), state.params, p0
    )
    assert all(jax.tree.leaves(moved))


def test_policy_pp_mesh_composes_with_sequence_parallel(latents):
    """SP + PP in one model: the encoder cross-attend runs KV-sharded over
    a ("data","model") mesh while the latent stack pipelines over a
    separate ("data","pipe") mesh -- the long-input training plan sharded
    on two axes. Forward exact vs the unsharded encoder; grads finite."""
    from perceiverio_pytorch_tpu.config import Policy
    from perceiverio_pytorch_tpu.parallel import make_mesh

    TK = 131  # non-divisible KV -> internal pad path in SP
    sp_mesh = make_mesh((2, 4))
    pp_mesh = make_pipeline_mesh(4, data=2)
    rng = np.random.RandomState(11)
    tokens = jnp.asarray(rng.randn(B, TK, D), jnp.float32)

    base = _encoder(Policy())
    v = jax.jit(base.init)(jax.random.PRNGKey(0), tokens, latents)
    want = jax.jit(base.apply)(v, tokens, latents)

    both = _encoder(Policy(
        sp_mesh=sp_mesh, sp_axis="model", sp_min_kv=32,
        pp_mesh=pp_mesh, pp_microbatches=2,
    ))
    got = jax.jit(both.apply)(v, tokens, latents)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    g = jax.jit(
        jax.grad(lambda p: jnp.sum(both.apply(p, tokens, latents) ** 2))
    )(v)
    assert all(
        bool(np.isfinite(np.asarray(l)).all()) for l in jax.tree.leaves(g)
    )


def test_policy_pp_mesh_single_stage_falls_back_sequential():
    """pipe axis of size 1 = no pipelining: the sequential path must run,
    including dropout training (regression: the dropout guard used to fire
    before the n_stages==1 early-return)."""
    from perceiverio_pytorch_tpu.config import Policy

    mesh = make_pipeline_mesh(1)
    enc = _encoder(
        Policy(pp_mesh=mesh, pp_microbatches=2), dropout_prob=0.1
    )
    tokens = jnp.asarray(np.random.RandomState(12).randn(2, 10, D), jnp.float32)
    lat = jnp.asarray(np.random.RandomState(13).randn(2, N, D), jnp.float32)
    v = jax.jit(enc.init)(jax.random.PRNGKey(0), tokens, lat)
    out = enc.apply(
        v, tokens, lat, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("fsdp", [False, True])
def test_policy_pp_mesh_composes_with_tp_sharded_train_step(fsdp):
    """TP + PP (and FSDP + TP + PP): the GSPMD-sharded train step (params
    per the Megatron TP rules over a (data,model) mesh, ZeRO-3 over its
    data axis when fsdp) wrapping a model whose latent stack pipelines
    over a separate (data,pipe) mesh. GSPMD reshards at the shard_map
    boundary; loss descends and stays finite."""
    import optax

    from perceiverio_pytorch_tpu.config import Policy
    from perceiverio_pytorch_tpu.models import LanguagePerceiver
    from perceiverio_pytorch_tpu.parallel import make_mesh
    from perceiverio_pytorch_tpu.parallel.sharding import batch_sharding
    from perceiverio_pytorch_tpu.training import (
        create_sharded_train_state, make_sharded_train_step,
        masked_token_cross_entropy)

    tp_mesh = make_mesh((2, 4))
    pp_mesh = make_pipeline_mesh(4, data=2)
    model = LanguagePerceiver(
        vocab_size=262, max_seq_len=32, embed_dim=16,
        num_latents=8, num_latent_channels=32,
        num_self_attends_per_block=4, num_blocks=1,
        policy=Policy(pp_mesh=pp_mesh, pp_microbatches=2),
    )
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(6, 262, (4, 32)), jnp.int32)
    mask = jnp.ones((4, 32), bool)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens, mask)

    def loss_fn(params, tokens, mask):
        logits = model.apply(params, tokens, mask)
        return masked_token_cross_entropy(logits, tokens, mask)

    tx = optax.adam(1e-3)
    state = create_sharded_train_state(params, tx, tp_mesh, fsdp=fsdp)
    step = make_sharded_train_step(
        loss_fn, tx, tp_mesh, state, num_batch_args=2
    )
    tokens = jax.device_put(tokens, batch_sharding(tp_mesh))
    mask = jax.device_put(mask, batch_sharding(tp_mesh))
    losses = []
    for _ in range(2):
        state, loss = step(state, tokens, mask)
        losses.append(float(loss))
    assert losses[1] < losses[0] and all(np.isfinite(losses)), losses
