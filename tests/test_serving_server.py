"""BatchingServer: transparent micro-batching for serving.

The batching must be invisible to the caller — each future resolves to
exactly the row the jitted fn would produce for that example alone — while
the device sees bucketed static shapes (one compile per bucket, ever).
"""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceiverio_pytorch_tpu.serving_server import BatchingServer


def test_responses_match_direct_calls():
    fn = jax.jit(lambda x: x * 2.0 + 1.0)
    server = BatchingServer(fn, max_batch=4, max_wait_ms=1.0)
    try:
        examples = [np.full((3,), float(i), np.float32) for i in range(10)]
        futs = [server.submit(e) for e in examples]
        for e, f in zip(examples, futs):
            np.testing.assert_allclose(np.asarray(f.result(timeout=10)), e * 2 + 1)
    finally:
        server.stop()


def test_batches_form_and_shapes_are_bucketed():
    seen = []

    def fn(x):
        seen.append(x.shape[0])
        return x + 1

    server = BatchingServer(fn, max_batch=8, max_wait_ms=50.0)
    try:
        futs = [server.submit(np.zeros((2,), np.float32)) for _ in range(5)]
        for f in futs:
            f.result(timeout=10)
    finally:
        server.stop()
    # every device call used a bucket size (1, 2, 4, 8)
    assert seen and all(s in (1, 2, 4, 8) for s in seen)
    # the 50 ms window under a burst of 5 must have coalesced work:
    # strictly fewer device calls than requests
    assert len(seen) < 5


def test_concurrent_submitters():
    fn = jax.jit(lambda x: jnp.sum(x, axis=-1))
    server = BatchingServer(fn, max_batch=8, max_wait_ms=2.0)
    results = {}
    errors = []

    def client(i):
        try:
            out = server(np.full((4,), float(i), np.float32))
            results[i] = float(np.asarray(out))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    try:
        threads = [threading.Thread(target=client, args=(i,)) for i in range(20)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
    finally:
        server.stop()
    assert not errors
    assert results == {i: 4.0 * i for i in range(20)}


def test_error_propagates_to_futures():
    def fn(x):
        raise RuntimeError("device exploded")

    server = BatchingServer(fn, max_batch=2, max_wait_ms=1.0)
    try:
        fut = server.submit(np.zeros((1,), np.float32))
        with pytest.raises(RuntimeError, match="device exploded"):
            fut.result(timeout=10)
    finally:
        server.stop()


def test_stop_rejects_new_and_drains_queued():
    release = threading.Event()

    def slow_fn(x):
        release.wait(5)
        return x

    server = BatchingServer(slow_fn, max_batch=1, max_wait_ms=0.0)
    f1 = server.submit(np.ones((1,), np.float32))  # occupies the worker
    time.sleep(0.1)
    f2 = server.submit(np.full((1,), 2.0, np.float32))  # queued

    def stopper():
        server.stop(drain=True)

    t = threading.Thread(target=stopper)
    release.set()
    t.start()
    t.join(timeout=10)
    assert not t.is_alive()
    np.testing.assert_array_equal(np.asarray(f1.result(timeout=5)), [1.0])
    np.testing.assert_array_equal(np.asarray(f2.result(timeout=5)), [2.0])
    with pytest.raises(RuntimeError, match="stopped"):
        server.submit(np.zeros((1,), np.float32))


def test_pytree_examples():
    fn = jax.jit(lambda d: {"sum": d["a"] + d["b"]})
    server = BatchingServer(fn, max_batch=4, max_wait_ms=1.0)
    try:
        out = server({"a": np.ones((2,), np.float32),
                      "b": np.full((2,), 3.0, np.float32)})
        np.testing.assert_allclose(np.asarray(out["sum"]), [4.0, 4.0])
    finally:
        server.stop()


def test_pipeline_mode_matches_direct_calls():
    """pipeline=True (one batch in flight, fetch deferred) returns the
    same per-example outputs; the last batch is settled even when no
    further request ever arrives (no starved futures)."""
    w = np.arange(12, dtype=np.float32).reshape(3, 4)

    @jax.jit
    def fn(batch):
        return {"y": batch["x"] @ w}

    server = BatchingServer(fn, max_batch=4, max_wait_ms=5.0, pipeline=True)
    rng = np.random.RandomState(0)
    examples = [{"x": rng.randn(3).astype(np.float32)} for _ in range(11)]
    try:
        futs = [server.submit(ex) for ex in examples]
        # the tail group resolves without any subsequent submission
        for ex, fut in zip(examples, futs):
            got = fut.result(timeout=30)
            np.testing.assert_allclose(got["y"], ex["x"] @ w, rtol=1e-6)
            assert isinstance(got["y"], np.ndarray)  # fetched by the server
    finally:
        server.stop()


def test_pipeline_mode_error_propagation_and_stop_drain():
    calls = []

    def fn(batch):
        calls.append(batch["x"].shape)
        if batch["x"].shape[-1] != 3:
            raise ValueError("bad width")
        return {"y": batch["x"] * 2.0}

    server = BatchingServer(fn, max_batch=2, max_wait_ms=0.0, pipeline=True)
    try:
        ok = server.submit({"x": np.ones(3, np.float32)})
        np.testing.assert_allclose(ok.result(timeout=30)["y"], 2.0)
        bad = server.submit({"x": np.ones(5, np.float32)})
        with pytest.raises(ValueError, match="bad width"):
            bad.result(timeout=30)
        # the server recovers: a good request after the failure still works
        ok2 = server.submit({"x": np.full(3, 2.0, np.float32)})
        np.testing.assert_allclose(ok2.result(timeout=30)["y"], 4.0)
    finally:
        server.stop()


@pytest.mark.parametrize("pipeline", [False, True])
def test_stats_counters_and_latency(pipeline):
    fn = jax.jit(lambda x: x + 1.0)
    server = BatchingServer(
        fn, max_batch=4, max_wait_ms=5.0, pipeline=pipeline
    )
    try:
        futs = [
            server.submit(np.full((2,), float(i), np.float32))
            for i in range(10)
        ]
        for f in futs:
            f.result(timeout=10)
        stats = server.stats()
        assert stats["requests_served"] == 10
        assert stats["examples_dispatched"] == 10
        assert stats["batches_dispatched"] >= 3  # max_batch 4
        assert stats["errors"] == 0
        # padded rows are consistent with the bucket dispatch counts
        rows = sum(int(b) * n for b, n in stats["bucket_dispatches"].items())
        assert rows == stats["examples_dispatched"] + stats["rows_padded"]
        assert 0 < stats["mean_batch_occupancy"] <= 1.0
        lat = stats["request_latency_ms"]
        assert lat["window"] == 10 and lat["p50"] > 0 and lat["p99"] >= lat["p50"]
    finally:
        server.stop()
    # stop(drain=True) itself leaves counters consistent
    assert server.stats()["requests_served"] == 10


def test_stats_counts_errors():
    def fn(x):
        raise ValueError("boom")

    server = BatchingServer(fn, max_batch=2, max_wait_ms=0.0)
    try:
        fut = server.submit(np.zeros((1,), np.float32))
        with pytest.raises(ValueError):
            fut.result(timeout=10)
        # the dispatch raised before any request resolved
        deadline = time.perf_counter() + 5
        while server.stats()["errors"] == 0 and time.perf_counter() < deadline:
            time.sleep(0.01)
        stats = server.stats()
        assert stats["errors"] >= 1 and stats["requests_served"] == 0
    finally:
        server.stop(drain=False)


def test_warmup_compiles_every_bucket():
    seen = []

    @jax.jit
    def fn(x):
        return x * 2.0

    def spy(x):
        seen.append(x.shape[0])
        return fn(x)

    server = BatchingServer(spy, max_batch=8, max_wait_ms=1.0)
    try:
        server.warmup(np.zeros((3,), np.float32))
        assert seen == [1, 2, 4, 8]
        assert server.stats()["batches_dispatched"] == 0  # warmup is free
        out = server(np.full((3,), 2.0, np.float32))
        np.testing.assert_allclose(np.asarray(out), np.full((3,), 4.0))
    finally:
        server.stop()


def test_example_spec_rejects_malformed_requests():
    """A bad request must fail at submit time -- never inside the device
    batch it would share with good requests."""
    fn = jax.jit(lambda x: x * 2.0)
    server = BatchingServer(
        fn, max_batch=4, max_wait_ms=1.0,
        example_spec=np.zeros((3,), np.float32),
    )
    try:
        with pytest.raises(ValueError, match="spec"):
            server.submit(np.zeros((5,), np.float32))  # wrong shape
        with pytest.raises(ValueError, match="spec"):
            server.submit(np.zeros((3,), np.int32))  # wrong dtype
        with pytest.raises(ValueError, match="structure"):
            server.submit({"x": np.zeros((3,), np.float32)})
        out = server(np.full((3,), 2.0, np.float32))  # conforming: fine
        np.testing.assert_allclose(np.asarray(out), np.full((3,), 4.0))
        assert server.stats()["errors"] == 0
    finally:
        server.stop()


def test_warmup_spec_is_opt_in():
    fn = jax.jit(lambda x: x + 1.0)
    server = BatchingServer(fn, max_batch=2, max_wait_ms=1.0)
    try:
        # default warmup leaves the server dtype/shape-polymorphic (a
        # server may serve uint8 AND fp32 clients; jit handles each)
        server.warmup(np.zeros((2, 2), np.float32))
        np.testing.assert_allclose(
            np.asarray(server(np.zeros((3, 3), np.float32))),
            np.ones((3, 3)),
        )
        server.warmup(np.zeros((2, 2), np.float32), set_spec=True)
        with pytest.raises(ValueError):
            server.submit(np.zeros((3, 3), np.float32))
        np.testing.assert_allclose(
            np.asarray(server(np.zeros((2, 2), np.float32))), np.ones((2, 2))
        )
    finally:
        server.stop()


def test_batching_server_over_device_mesh():
    """Production multi-chip serving: BatchingServer coalesces requests
    into batches that a DP-sharded jitted call spreads over the mesh.
    Buckets are mesh-divisible; outputs equal the single-device apply."""
    from perceiverio_pytorch_tpu.models import ClassificationPerceiver, PrepType
    from perceiverio_pytorch_tpu.parallel import (
        batch_sharding,
        make_data_parallel_apply,
        make_mesh,
    )

    model = ClassificationPerceiver(
        num_classes=5, img_size=(16, 16), num_self_attends_per_block=1,
        num_blocks=1, num_latents=8, num_latent_channels=32,
        prep_type=PrepType.FOURIER_POS_PIXEL,
    )
    rng = np.random.RandomState(0)
    example8 = jnp.asarray(rng.randn(8, 3, 16, 16), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), example8)
    ref_fn = jax.jit(model.apply)

    mesh = make_mesh((8, 1))
    fn, place = make_data_parallel_apply(model, mesh)
    placed_vars = place(variables)[0]  # params once; batches per request
    b_sh = batch_sharding(mesh)

    def call(batch):
        # the server hands numpy [B, ...]; shard it over the data axis
        return fn(placed_vars, jax.device_put(batch, b_sh))

    server = BatchingServer(call, max_batch=16, batch_sizes=(8, 16),
                            max_wait_ms=5.0, pipeline=True)
    try:
        examples = [np.asarray(rng.randn(3, 16, 16), np.float32)
                    for _ in range(12)]
        futs = [server.submit(e) for e in examples]
        rows = [np.asarray(f.result(timeout=60)) for f in futs]
    finally:
        server.stop()
    want = np.asarray(ref_fn(variables, jnp.asarray(np.stack(examples))))
    np.testing.assert_allclose(np.stack(rows), want, rtol=1e-5, atol=1e-6)


def test_deadline_sheds_expired_requests():
    """A request whose deadline passes while queued fails with TimeoutError
    and is never dispatched -- under overload, abandoned requests must not
    burn device time (reference has no serving story; this is the TPU-side
    load-shedding contract)."""
    release = threading.Event()
    calls = []

    def fn(x):
        calls.append(x.shape[0])
        release.wait(10)
        return x + 1

    server = BatchingServer(fn, max_batch=4, max_wait_ms=0.0)
    try:
        blocker = server.submit(np.zeros((2,), np.float32))
        time.sleep(0.05)  # let the worker enter fn and hold it there
        doomed = server.submit(np.zeros((2,), np.float32), timeout=0.01)
        time.sleep(0.05)  # deadline passes while the worker is busy
        release.set()
        np.testing.assert_allclose(np.asarray(blocker.result(timeout=10)), 1.0)
        with pytest.raises(TimeoutError, match="expired"):
            doomed.result(timeout=10)
        # a fresh request after the stall still serves normally
        fresh = server.submit(np.zeros((2,), np.float32))
        np.testing.assert_allclose(np.asarray(fresh.result(timeout=10)), 1.0)
        assert server.stats()["requests_expired"] == 1
        # the doomed request never occupied a device batch
        assert len(calls) == 2
    finally:
        release.set()
        server.stop()


def test_deadline_unexpired_and_validation():
    fn = jax.jit(lambda x: x * 2.0)
    server = BatchingServer(fn, max_batch=4, max_wait_ms=1.0)
    try:
        fut = server.submit(np.ones((3,), np.float32), timeout=30.0)
        np.testing.assert_allclose(np.asarray(fut.result(timeout=10)), 2.0)
        assert server.stats()["requests_expired"] == 0
        with pytest.raises(ValueError, match="timeout must be positive"):
            server.submit(np.ones((3,), np.float32), timeout=0)
    finally:
        server.stop()
