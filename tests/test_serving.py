"""AOT export (serving.py): serialize -> deserialize -> same outputs."""

import jax
import jax.numpy as jnp
import numpy as np

from perceiverio_pytorch_tpu.models import ClassificationPerceiver, PrepType
from perceiverio_pytorch_tpu.serving import export_apply, load_exported


def _tiny_model_and_inputs():
    model = ClassificationPerceiver(
        num_classes=5, img_size=(32, 32), num_self_attends_per_block=1,
        num_blocks=1, num_latents=8, num_latent_channels=32,
        prep_type=PrepType.FOURIER_POS_PIXEL,
    )
    img = jnp.asarray(np.random.RandomState(0).randn(2, 3, 32, 32), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    return model, variables, img


def test_export_roundtrip_matches_direct_apply():
    model, variables, img = _tiny_model_and_inputs()
    blob = export_apply(model.apply, variables, img)
    assert isinstance(blob, bytes) and len(blob) > 0
    serve = load_exported(blob)
    got = serve(variables, img)
    want = jax.jit(model.apply)(variables, img)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-7)


def test_export_batch_polymorphic_serves_any_batch():
    model, variables, img = _tiny_model_and_inputs()
    blob = export_apply(model.apply, variables, img, batch_polymorphic=True)
    serve = load_exported(blob)
    for b in (1, 3):
        x = jnp.asarray(
            np.random.RandomState(b).randn(b, 3, 32, 32), jnp.float32
        )
        got = serve(variables, x)
        want = jax.jit(model.apply)(variables, x)
        assert got.shape == (b, 5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


def test_export_static_kwargs_are_baked():
    """Closed-over kwargs (e.g. deterministic) behave as at trace time."""
    model, variables, img = _tiny_model_and_inputs()
    blob = export_apply(model.apply, variables, img, deterministic=True)
    serve = load_exported(blob)
    want = jax.jit(lambda v, x: model.apply(v, x, deterministic=True))(
        variables, img
    )
    np.testing.assert_allclose(np.asarray(serve(variables, img)),
                               np.asarray(want), rtol=1e-6, atol=1e-7)


def test_template_free_restore_reconstructs_zero_size_leaves(tmp_path):
    """A serving process restores weights WITHOUT model code (no template);
    zero-size leaves (e.g. the [1, 0] decoder pad embedding) must come back
    with their true shapes, not the orbax mask placeholder."""
    import numpy as np

    from perceiverio_pytorch_tpu.training.checkpoint import (
        restore_variables,
        save_variables,
    )

    variables = {
        "params": {
            "w": jnp.ones((3, 2), jnp.float32),
            "pad": {"pos_embs": jnp.zeros((1, 0), jnp.bfloat16)},
        }
    }
    path = str(tmp_path / "weights")
    save_variables(path, variables)
    restored = restore_variables(path)  # no template
    assert restored["params"]["pad"]["pos_embs"].shape == (1, 0)
    assert restored["params"]["pad"]["pos_embs"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.ones((3, 2))
    )


def test_full_serving_stack_end_to_end():
    """The whole production path in one test: AOT export -> reload from
    bytes -> pipelined BatchingServer -> HttpFrontend with binary npz
    requests from concurrent clients -> per-example outputs equal direct
    apply."""
    import threading
    import urllib.request

    from perceiverio_pytorch_tpu.serving_http import (
        HttpFrontend,
        decode_npz,
        encode_npz,
    )
    from perceiverio_pytorch_tpu.serving_server import BatchingServer

    model, variables, img = _tiny_model_and_inputs()
    blob = export_apply(model.apply, variables, img, batch_polymorphic=True)
    serve = load_exported(blob)
    call = jax.jit(lambda x: serve(variables, x))

    server = BatchingServer(call, max_batch=4, max_wait_ms=50.0, pipeline=True)
    front = HttpFrontend(server, port=0).start()
    try:
        rng = np.random.RandomState(7)
        examples = [rng.randn(3, 32, 32).astype(np.float32) for _ in range(6)]
        want = np.asarray(jax.jit(model.apply)(variables, jnp.stack(examples)))
        got = [None] * len(examples)

        def client(i):
            req = urllib.request.Request(
                f"http://127.0.0.1:{front.port}/v1/infer",
                data=encode_npz(examples[i]),
                headers={"Content-Type": "application/octet-stream"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=60) as resp:
                got[i] = decode_npz(resp.read())

        threads = [
            threading.Thread(target=client, args=(i,))
            for i in range(len(examples))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(len(examples)):
            np.testing.assert_allclose(got[i], want[i], rtol=1e-5, atol=1e-6)
    finally:
        front.stop()
        server.stop()


def test_export_static_quant_with_calibrated_stats(tmp_path):
    """The serving deployment path for int8_static (examples/serve.py
    --quant static): calibrate -> export -> save -> template-free restore
    -> the artifact reproduces the quantized (not exact) forward, with the
    quant_stats collection riding the same weights directory."""
    import dataclasses

    from perceiverio_pytorch_tpu import PARITY
    from perceiverio_pytorch_tpu.ops.quant import calibrate
    from perceiverio_pytorch_tpu.training.checkpoint import (
        restore_variables,
        save_variables,
    )

    spolicy = dataclasses.replace(PARITY, quant="int8_static")
    kwargs = dict(
        num_classes=5, img_size=(32, 32), num_self_attends_per_block=1,
        num_blocks=2, num_latents=8, num_latent_channels=32,
        prep_type=PrepType.FOURIER_POS_PIXEL,
    )
    model = ClassificationPerceiver(policy=spolicy, **kwargs)
    exact = ClassificationPerceiver(policy=PARITY, **kwargs)
    img = jnp.asarray(np.random.RandomState(0).randn(2, 3, 32, 32), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    variables = calibrate(model, variables, [(img,)])

    blob = export_apply(model.apply, variables, img, deterministic=True)
    path = str(tmp_path / "weights")
    save_variables(path, variables)
    restored = restore_variables(path)
    assert "quant_stats" in restored

    got = np.asarray(load_exported(blob)(restored, img))
    want = np.asarray(jax.jit(model.apply)(variables, img))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    want_exact = np.asarray(
        jax.jit(exact.apply)(
            {k: v for k, v in variables.items() if k != "quant_stats"}, img
        )
    )
    assert np.abs(got - want_exact).max() > 0  # the int8 path is baked in
