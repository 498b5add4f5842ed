"""HTTP front-end over the micro-batching server (serving_http.py)."""

import json
import threading
import time
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceiverio_pytorch_tpu.serving_http import (
    HttpFrontend,
    decode_inputs,
    encode_outputs,
)
from perceiverio_pytorch_tpu.serving_server import BatchingServer


def _post(port, payload, path="/v1/infer"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.status, json.loads(resp.read())


def test_decode_encode_roundtrip_dtypes():
    tree = decode_inputs({"x": [[1.5, 2.0]], "y": [1, 2], "m": [True]})
    assert tree["x"].dtype == np.float32
    assert tree["y"].dtype == np.int32
    assert tree["m"].dtype == np.bool_
    out = encode_outputs({"z": jnp.asarray([[1.0, 2.0]])})
    assert out == {"z": [[1.0, 2.0]]}
    with pytest.raises(ValueError, match="unsupported input dtype"):
        decode_inputs({"s": ["a", "b"]})


def test_http_frontend_serves_and_batches():
    """Concurrent HTTP requests return per-example results identical to the
    direct computation, and coalesce into shared device batches."""
    w = np.arange(6, dtype=np.float32).reshape(3, 2)
    batch_sizes = []

    @jax.jit
    def _matmul(batch):
        return {"y": batch["x"] @ w}

    def fn(batch):
        batch_sizes.append(batch["x"].shape[0])
        return _matmul(batch)

    server = BatchingServer(fn, max_batch=8, max_wait_ms=150.0)
    front = HttpFrontend(server, port=0).start()
    try:
        port = front.port

        # health + routing
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=10
        ) as resp:
            assert json.loads(resp.read()) == {"status": "ok"}

        rng = np.random.RandomState(0)
        examples = [rng.randn(4, 3).astype(np.float32) for _ in range(6)]

        def run_burst():
            results = [None] * len(examples)
            barrier = threading.Barrier(len(examples))

            def call(i):
                barrier.wait()  # release all clients at once
                status, body = _post(
                    port, {"inputs": {"x": examples[i].tolist()}}
                )
                assert status == 200
                results[i] = np.asarray(body["outputs"]["y"], np.float32)

            threads = [
                threading.Thread(target=call, args=(i,))
                for i in range(len(examples))
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            return results

        # coalescing is timing-dependent on a loaded machine: retry the
        # burst a few times before declaring the batching broken
        for _ in range(3):
            results = run_burst()
            for ex, got in zip(examples, results):
                np.testing.assert_allclose(got, ex @ w, rtol=1e-6)
            if max(batch_sizes) > 1:
                break
        assert max(batch_sizes) > 1
    finally:
        front.stop()
        server.stop()


def test_http_frontend_error_codes():
    server = BatchingServer(
        lambda b: {"y": b["x"] @ np.eye(3, dtype=np.float32)},
        max_batch=4,
        max_wait_ms=0.0,
    )
    front = HttpFrontend(server, port=0).start()
    try:
        port = front.port
        # 404
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(port, {"inputs": {"x": [[1.0]]}}, path="/v1/nope")
        assert e.value.code == 404
        # 400: missing "inputs"
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(port, {"not_inputs": 1})
        assert e.value.code == 400
        # 400: valid JSON that is not an object
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(port, [1, 2, 3])
        assert e.value.code == 400
        assert "bad request" in json.loads(e.value.read())["error"]
        # 500: model-side shape error propagates as JSON
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(port, {"inputs": {"x": [[1.0, 2.0]]}})  # wants width 3
        assert e.value.code == 500
    finally:
        front.stop()
        server.stop()


def test_npz_codec_roundtrip():
    from perceiverio_pytorch_tpu.serving_http import decode_npz, encode_npz

    tree = {
        "image": np.arange(6, dtype=np.uint8).reshape(2, 3),
        "meta": {"scale": np.float32(2.0)},
    }
    back = decode_npz(encode_npz(tree))
    np.testing.assert_array_equal(back["image"], tree["image"])
    assert back["image"].dtype == np.uint8  # dtypes pass through exactly
    np.testing.assert_allclose(back["meta"]["scale"], 2.0)

    # bare-array form
    arr = np.random.RandomState(0).randn(4).astype(np.float32)
    np.testing.assert_array_equal(decode_npz(encode_npz(arr)), arr)

    # keys that collide with np.savez's own kwargs round-trip fine
    tricky = {"file": np.ones(2, np.float32), "arr_0": np.zeros(3, np.int32)}
    back2 = decode_npz(encode_npz(tricky))
    assert set(back2) == {"file", "arr_0"}
    np.testing.assert_array_equal(back2["arr_0"], tricky["arr_0"])

    # bfloat16 outputs are cast to a client-readable float32
    bf = decode_npz(encode_npz({"y": jnp.ones((2,), jnp.bfloat16) * 1.5}))
    assert bf["y"].dtype == np.float32
    np.testing.assert_allclose(bf["y"], 1.5)


def test_http_frontend_npz_binary_protocol():
    """octet-stream requests carry npz pytrees both ways; uint8 dtypes
    survive (the transport-efficient production path); garbage is 400."""
    import io
    import urllib.error

    w = np.arange(6, dtype=np.float32).reshape(3, 2)
    server = BatchingServer(
        lambda b: {"y": b["x"].astype(np.float32) @ w},
        max_batch=4,
        max_wait_ms=0.0,
    )
    front = HttpFrontend(server, port=0).start()
    try:
        from perceiverio_pytorch_tpu.serving_http import decode_npz, encode_npz

        x = np.arange(12, dtype=np.uint8).reshape(4, 3)
        req = urllib.request.Request(
            f"http://127.0.0.1:{front.port}/v1/infer",
            data=encode_npz({"x": x}),
            headers={"Content-Type": "application/octet-stream"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert resp.headers["Content-Type"] == "application/octet-stream"
            out = decode_npz(resp.read())
        np.testing.assert_allclose(out["y"], x.astype(np.float32) @ w)

        bad = urllib.request.Request(
            f"http://127.0.0.1:{front.port}/v1/infer",
            data=b"not an npz",
            headers={"Content-Type": "application/octet-stream"},
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad, timeout=30)
        assert e.value.code == 400
    finally:
        front.stop()
        server.stop()


def test_http_frontend_double_start_rejected():
    server = BatchingServer(lambda b: b, max_batch=2, max_wait_ms=0.0)
    front = HttpFrontend(server, port=0).start()
    try:
        with pytest.raises(RuntimeError, match="already started"):
            front.start()
    finally:
        front.stop()
        server.stop()


def test_http_stats_route():
    import urllib.request

    fn = jax.jit(lambda x: x * 3.0)
    server = BatchingServer(fn, max_batch=4, max_wait_ms=1.0)
    front = HttpFrontend(server, port=0).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{front.port}/v1/infer",
            data=json.dumps({"inputs": [1.0, 2.0]}).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert json.loads(resp.read())["outputs"] == [3.0, 6.0]
        with urllib.request.urlopen(
            f"http://127.0.0.1:{front.port}/stats", timeout=30
        ) as resp:
            stats = json.loads(resp.read())
        assert stats["requests_served"] == 1
        assert stats["batches_dispatched"] == 1
        assert "request_latency_ms" in stats
    finally:
        front.stop()
        server.stop()


def test_http_spec_rejection_is_400_and_body_cap_is_413():
    import urllib.error
    import urllib.request

    fn = jax.jit(lambda x: x * 2.0)
    server = BatchingServer(
        fn, max_batch=2, max_wait_ms=1.0,
        example_spec=np.zeros((2,), np.float32),
    )
    front = HttpFrontend(server, port=0, max_body_mb=0.001).start()
    try:
        # oversized body -> 413
        big = json.dumps({"inputs": [0.0] * 4096}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{front.port}/v1/infer", data=big, method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 413
        # wrong shape -> 400 (not a 500, and not a poisoned batch)
        req = urllib.request.Request(
            f"http://127.0.0.1:{front.port}/v1/infer",
            data=json.dumps({"inputs": [1.0, 2.0, 3.0]}).encode(),
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400
        # conforming request still served
        req = urllib.request.Request(
            f"http://127.0.0.1:{front.port}/v1/infer",
            data=json.dumps({"inputs": [1.0, 2.0]}).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert json.loads(resp.read())["outputs"] == [2.0, 4.0]
    finally:
        front.stop()
        server.stop()


def test_http_stopped_server_returns_503():
    import urllib.error
    import urllib.request

    fn = jax.jit(lambda x: x)
    server = BatchingServer(fn, max_batch=2, max_wait_ms=1.0)
    front = HttpFrontend(server, port=0).start()
    try:
        server.stop()  # lifecycles are separate; the frontend stays up
        req = urllib.request.Request(
            f"http://127.0.0.1:{front.port}/v1/infer",
            data=json.dumps({"inputs": [1.0]}).encode(),
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 503
    finally:
        front.stop()


def test_http_multi_model_routing():
    """One frontend, several models: per-model routes, default routing,
    per-model and aggregate stats, 404 with the model list on a miss."""
    add = BatchingServer(jax.jit(lambda x: x + 1.0), max_batch=2, max_wait_ms=1.0)
    mul = BatchingServer(jax.jit(lambda x: x * 10.0), max_batch=2, max_wait_ms=1.0)
    front = HttpFrontend({"add": add, "mul": mul}, port=0,
                         default_model="add").start()
    try:
        port = front.port
        st, out = _post(port, {"inputs": [1.0, 2.0]}, path="/v1/models/mul/infer")
        assert st == 200 and out["outputs"] == [10.0, 20.0]
        st, out = _post(port, {"inputs": [1.0, 2.0]})  # default -> add
        assert st == 200 and out["outputs"] == [2.0, 3.0]
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(port, {"inputs": [1.0]}, path="/v1/models/nope/infer")
        assert e.value.code == 404
        assert json.loads(e.value.read())["models"] == ["add", "mul"]
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/models", timeout=30
        ) as resp:
            listing = json.loads(resp.read())
        assert listing == {"models": ["add", "mul"], "default": "add"}
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30
        ) as resp:
            stats = json.loads(resp.read())
        assert stats["add"]["requests_served"] == 1
        assert stats["mul"]["requests_served"] == 1
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/models/mul/stats", timeout=30
        ) as resp:
            assert json.loads(resp.read())["requests_served"] == 1
    finally:
        front.stop()
        add.stop()
        mul.stop()


def test_http_multi_model_no_default_404s_plain_infer():
    add = BatchingServer(jax.jit(lambda x: x + 1.0), max_batch=2, max_wait_ms=1.0)
    mul = BatchingServer(jax.jit(lambda x: x * 10.0), max_batch=2, max_wait_ms=1.0)
    front = HttpFrontend({"add": add, "mul": mul}, port=0).start()
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(front.port, {"inputs": [1.0]})
        assert e.value.code == 404
        assert "no default model" in json.loads(e.value.read())["error"]
    finally:
        front.stop()
        add.stop()
        mul.stop()
    # a single-entry mapping routes /v1/infer without naming a default
    solo = BatchingServer(jax.jit(lambda x: x - 1.0), max_batch=2, max_wait_ms=1.0)
    front = HttpFrontend({"solo": solo}, port=0).start()
    try:
        st, out = _post(front.port, {"inputs": [1.0, 2.0]})
        assert st == 200 and out["outputs"] == [0.0, 1.0]
    finally:
        front.stop()
        solo.stop()
    with pytest.raises(ValueError, match="default_model"):
        HttpFrontend({"a": solo}, default_model="b")
    with pytest.raises(ValueError, match="empty"):
        HttpFrontend({})


def test_http_request_deadline_returns_504():
    """timeout_ms in the body (or X-Timeout-Ms header) sets a server-side
    deadline; a request shed in the queue comes back as 504."""
    import threading

    release = threading.Event()

    def fn(x):
        release.wait(10)
        return x + 1

    server = BatchingServer(fn, max_batch=1, max_wait_ms=0.0)
    front = HttpFrontend(server, port=0).start()
    try:
        port = front.port
        # occupy the device worker, then let a short-deadline request expire
        blocker = server.submit(np.zeros((1,), np.float32))
        time.sleep(0.05)
        results = {}

        def doomed_client():
            try:
                results["st"] = _post(
                    port, {"inputs": [0.0], "timeout_ms": 20})[0]
            except urllib.error.HTTPError as e:
                results["st"] = e.code
                results["body"] = json.loads(e.read())

        t = threading.Thread(target=doomed_client)
        t.start()
        time.sleep(0.2)  # deadline passes while the worker is held
        release.set()
        t.join(timeout=30)
        blocker.result(timeout=10)
        assert results["st"] == 504
        assert "expired" in results["body"]["error"]
        # sanity: a fresh request with an ample deadline succeeds
        st, out = _post(port, {"inputs": [1.0], "timeout_ms": 30000})
        assert st == 200 and out["outputs"] == [2.0]
        # malformed timeout -> 400
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(port, {"inputs": [1.0], "timeout_ms": -5})
        assert e.value.code == 400
    finally:
        release.set()
        front.stop()
        server.stop()


def test_prometheus_metrics_endpoint():
    """GET /metrics: Prometheus exposition text for every model's counters,
    labelled by model; single-server mode labels as model="default"."""

    @jax.jit
    def double(x):
        return x * 2

    a = BatchingServer(double, max_batch=2)
    b = BatchingServer(double, max_batch=2)
    front = HttpFrontend({"alpha": a, "beta": b}, default_model="alpha",
                         port=0).start()
    try:
        st, _ = _post(front.port, {"inputs": [1.0, 2.0]},
                      "/v1/models/alpha/infer")
        assert st == 200
        with urllib.request.urlopen(
            f"http://127.0.0.1:{front.port}/metrics", timeout=30
        ) as resp:
            assert resp.headers["Content-Type"].startswith("text/plain")
            text = resp.read().decode()
        assert "# TYPE perceiver_requests_served counter" in text
        assert 'perceiver_requests_served{model="alpha"} 1' in text
        assert 'perceiver_requests_served{model="beta"} 0' in text
        assert 'perceiver_queue_depth{model="alpha"}' in text
        # the TYPE line appears once per metric, not once per model
        assert text.count("# TYPE perceiver_requests_served ") == 1
        # latency gauges appear once a request has been served
        assert 'perceiver_request_latency_ms{model="alpha",quantile="p50"}' in text
    finally:
        front.stop()
        a.stop()
        b.stop()

    # single-server mode: model label is "default"
    c = BatchingServer(double, max_batch=2)
    front2 = HttpFrontend(c, port=0).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{front2.port}/metrics", timeout=30
        ) as resp:
            text = resp.read().decode()
        assert 'perceiver_requests_served{model="default"} 0' in text
    finally:
        front2.stop()
        c.stop()


def test_prometheus_metrics_escapes_label_values():
    """Model names are arbitrary dict keys; quotes/backslashes/newlines in
    them must be escaped or the scraper rejects the whole response."""

    @jax.jit
    def ident(x):
        return x

    s = BatchingServer(ident, max_batch=1)
    front = HttpFrontend({'evil"name\\x': s}, port=0).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{front.port}/metrics", timeout=30
        ) as resp:
            text = resp.read().decode()
        assert 'model="evil\\"name\\\\x"' in text
    finally:
        front.stop()
        s.stop()
