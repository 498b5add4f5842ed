"""End-to-end deployment demo: AOT-export a model, then serve the artifact.

The reference deploys by re-running eager PyTorch from a pickled
state_dict (/root/reference/README.md:38-44); here the deployment unit is
a compiled StableHLO artifact (serving.export_apply) plus an orbax weights
directory.  This script plays both roles:

  1. "build": construct ClassificationPerceiver, init (or load) weights,
     export a batch-polymorphic artifact + the weights to --out.
  2. "serve": reload BOTH from disk (no model code needed in a real server
     -- only jax + the two files) and answer timed requests at several
     batch sizes, printing per-request latency.

Run:  python examples/serve.py            (tiny config, quick)
      python examples/serve.py --full-scale   (shipped ImageNet config)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from perceiverio_pytorch_tpu import PERFORMANCE, export_apply, load_exported
from perceiverio_pytorch_tpu.models import ClassificationPerceiver, PrepType
from perceiverio_pytorch_tpu.training.checkpoint import (
    restore_variables,
    save_variables,
)
from perceiverio_pytorch_tpu.utils.params import cast_variables_for_inference


def build(out_dir: str, full_scale: bool, quant=None) -> None:
    from perceiverio_pytorch_tpu import PERFORMANCE_INT8, PERFORMANCE_INT8_STATIC

    policy = {
        None: PERFORMANCE,
        "dynamic": PERFORMANCE_INT8,
        "static": PERFORMANCE_INT8_STATIC,
    }[quant]
    if full_scale:
        model = ClassificationPerceiver(
            num_classes=1000, img_size=(224, 224),
            prep_type=PrepType.FOURIER_POS_CONVNET, policy=policy,
        )
        img_shape = (1, 3, 224, 224)
    else:
        model = ClassificationPerceiver(
            num_classes=10, img_size=(32, 32),
            prep_type=PrepType.FOURIER_POS_PIXEL,
            num_self_attends_per_block=2, num_blocks=1,
            num_latents=16, num_latent_channels=64, policy=policy,
        )
        img_shape = (1, 3, 32, 32)

    example = jnp.zeros(img_shape, jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), example)
    if quant == "static":
        # PTQ calibration before export: record each GEMM site's max|x|
        # on representative inputs (random here; real data in production).
        # The resulting "quant_stats" collection rides the same weights
        # directory -- the serving process needs no extra files.
        from perceiverio_pytorch_tpu.ops.quant import calibrate

        rng = np.random.RandomState(0)
        batches = [
            (jnp.asarray(rng.uniform(-1, 1, img_shape), jnp.float32),)
            for _ in range(2)
        ]
        variables = calibrate(model, variables, batches)
    variables = cast_variables_for_inference(variables)

    blob = export_apply(
        model.apply, variables, example,
        batch_polymorphic=True, deterministic=True,
    )
    os.makedirs(out_dir, exist_ok=True)
    artifact = os.path.join(out_dir, "model.stablehlo")
    with open(artifact, "wb") as f:
        f.write(blob)
    save_variables(os.path.join(out_dir, "weights"), variables, overwrite=True)
    print(f"exported {len(blob)/1e6:.1f} MB artifact + weights to {out_dir}")


def serve_demo(out_dir: str, hw: int, batch_sizes=(1, 4, 16), requests: int = 20):
    # A real serving process imports only jax: the artifact embeds the
    # computation, the weights directory embeds the pytree structure.
    with open(os.path.join(out_dir, "model.stablehlo"), "rb") as f:
        fn = load_exported(f.read())
    variables = restore_variables(os.path.join(out_dir, "weights"))
    call = jax.jit(fn)

    rng = np.random.RandomState(0)
    for b in batch_sizes:
        img = jnp.asarray(rng.uniform(-1, 1, (b, 3, hw, hw)), jnp.float32)
        logits = call(variables, img)  # compile for this batch size
        logits.block_until_ready()
        times = []
        for _ in range(requests):
            t0 = time.perf_counter()
            out = call(variables, img)
            # fetch the (small) logits wholesale: an eager slice would
            # dispatch an extra XLA computation per request on the remote
            # transport (CLAUDE.md) and inflate the measured latency
            np.asarray(out)
            times.append(time.perf_counter() - t0)
        times.sort()
        p50 = times[len(times) // 2] * 1e3
        p99 = times[min(len(times) - 1, int(len(times) * 0.99))] * 1e3
        print(
            f"batch {b:3d}: p50 {p50:7.2f} ms  p99 {p99:7.2f} ms  "
            f"{b / (sum(times) / len(times)):8.1f} img/s"
        )


def server_demo(out_dir: str, hw: int, clients: int = 24, max_batch: int = 8):
    """Concurrent clients against the micro-batching server: requests
    coalesce into bucketed device batches transparently."""
    import threading

    from perceiverio_pytorch_tpu import BatchingServer

    with open(os.path.join(out_dir, "model.stablehlo"), "rb") as f:
        fn = load_exported(f.read())
    variables = restore_variables(os.path.join(out_dir, "weights"))
    call = jax.jit(lambda x: fn(variables, x))

    server = BatchingServer(
        call, max_batch=max_batch, max_wait_ms=3.0,
        pipeline=True,  # overlap next batch's transfer with current compute
    )
    # compile every bucket before timed traffic (one compile per padded
    # shape -- expensive through the remote compile service); these demo
    # clients all send one shape/dtype, so also pin the request spec
    server.warmup(jnp.zeros((3, hw, hw), jnp.float32), set_spec=True)
    rng = np.random.RandomState(0)
    lat = []
    lock = threading.Lock()

    def client(i):
        img = rng.uniform(-1, 1, (3, hw, hw)).astype(np.float32)
        t0 = time.perf_counter()
        out = server(img)
        with lock:
            lat.append(time.perf_counter() - t0)
        assert out.shape[-1] >= 10

    try:
        threads = [threading.Thread(target=client, args=(i,)) for i in range(clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
    finally:
        stats = server.stats()
        server.stop()
    lat.sort()
    print(
        f"server: {clients} concurrent clients, max_batch {max_batch}: "
        f"p50 {lat[len(lat)//2]*1e3:.1f} ms  "
        f"p99 {lat[-1]*1e3:.1f} ms  {clients/wall:.1f} req/s"
    )
    print(
        f"server stats: {stats['batches_dispatched']} batches, "
        f"occupancy {stats.get('mean_batch_occupancy', 0):.2f}, "
        f"buckets {stats['bucket_dispatches']}"
    )


def http_demo(out_dir: str, hw: int, clients: int = 12, max_batch: int = 8):
    """The same coalescing over a real network protocol: concurrent HTTP
    clients against HttpFrontend + BatchingServer."""
    import json
    import threading
    import urllib.request

    from perceiverio_pytorch_tpu import BatchingServer, HttpFrontend

    with open(os.path.join(out_dir, "model.stablehlo"), "rb") as f:
        fn = load_exported(f.read())
    variables = restore_variables(os.path.join(out_dir, "weights"))
    call = jax.jit(lambda x: fn(variables, x))
    server = BatchingServer(
        lambda x: call(x["image"]), max_batch=max_batch, max_wait_ms=3.0,
        pipeline=True,
    )
    server.warmup({"image": jnp.zeros((3, hw, hw), jnp.float32)}, set_spec=True)
    front = HttpFrontend(server, port=0).start()
    rng = np.random.RandomState(0)
    ok = []

    from perceiverio_pytorch_tpu.serving_http import decode_npz, encode_npz

    def client(i):
        img = rng.uniform(-1, 1, (3, hw, hw)).astype(np.float32)
        if i % 2:  # half the clients use the binary npz protocol
            req = urllib.request.Request(
                f"http://127.0.0.1:{front.port}/v1/infer",
                data=encode_npz({"image": img}),
                headers={"Content-Type": "application/octet-stream"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=120) as resp:
                out = decode_npz(resp.read())
        else:  # and half plain JSON
            req = urllib.request.Request(
                f"http://127.0.0.1:{front.port}/v1/infer",
                data=json.dumps({"inputs": {"image": img.tolist()}}).encode(),
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=120) as resp:
                out = np.asarray(json.loads(resp.read())["outputs"])
        ok.append(out.shape[-1] >= 10)

    try:
        t0 = time.perf_counter()
        threads = [threading.Thread(target=client, args=(i,)) for i in range(clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        import urllib.request as _rq

        with _rq.urlopen(
            f"http://127.0.0.1:{front.port}/stats", timeout=30
        ) as resp:
            stats = json.loads(resp.read())
        with _rq.urlopen(
            f"http://127.0.0.1:{front.port}/metrics", timeout=30
        ) as resp:
            metrics = resp.read().decode()
    finally:
        front.stop()
        server.stop()
    assert all(ok) and len(ok) == clients
    assert "perceiver_requests_served" in metrics
    print(f"http: {clients} concurrent clients over HTTP: {clients/wall:.1f} req/s")
    print(f"http GET /stats: {stats}")
    print("http GET /metrics (first lines):")
    print("\n".join(metrics.splitlines()[:4]))


def multi_demo(out_dir: str, hw: int):
    """Several models from one port: the exported classifier plus a tiny
    byte-MLM, each behind its own BatchingServer (own buckets, own
    compiles), routed by name — and a live request-deadline shed (504)."""
    import json
    import threading
    import urllib.error
    import urllib.request

    from perceiverio_pytorch_tpu import BatchingServer, HttpFrontend
    from perceiverio_pytorch_tpu.models import LanguagePerceiver

    with open(os.path.join(out_dir, "model.stablehlo"), "rb") as f:
        fn = load_exported(f.read())
    variables = restore_variables(os.path.join(out_dir, "weights"))
    cls_call = jax.jit(lambda x: fn(variables, x))

    mlm = LanguagePerceiver(
        vocab_size=262, max_seq_len=64, embed_dim=16,
        num_latents=8, num_latent_channels=32,
        num_self_attends_per_block=1, num_blocks=1,
    )
    tok = jnp.zeros((1, 64), jnp.int32)
    msk = jnp.ones((1, 64), bool)
    mlm_vars = jax.jit(mlm.init)(jax.random.PRNGKey(1), tok, msk)
    mlm_call = jax.jit(lambda b: mlm.apply(mlm_vars, b["tokens"], b["mask"]))

    cls_server = BatchingServer(cls_call, max_batch=2, batch_sizes=(1, 2))
    mlm_server = BatchingServer(mlm_call, max_batch=2, batch_sizes=(1, 2))
    cls_server.warmup(np.zeros((3, hw, hw), np.float32))
    mlm_server.warmup({"tokens": np.zeros((64,), np.int32),
                       "mask": np.ones((64,), bool)})
    front = HttpFrontend(
        {"imagenet": cls_server, "mlm": mlm_server},
        default_model="imagenet", port=0,
    ).start()

    def post(payload, path="/v1/infer", port=None):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port or front.port}{path}",
            data=json.dumps(payload).encode(), method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            return np.asarray(json.loads(r.read())["outputs"])

    try:
        img = np.zeros((3, hw, hw), np.float32).tolist()
        assert post({"inputs": img}, "/v1/models/imagenet/infer").ndim == 1
        assert post({"inputs": img}).ndim == 1  # default route
        out = post(
            {"inputs": {"tokens": np.zeros((64,), np.int32).tolist(),
                        "mask": np.ones((64,), bool).tolist()}},
            "/v1/models/mlm/infer",
        )
        assert out.shape == (64, 262)
        with urllib.request.urlopen(
            f"http://127.0.0.1:{front.port}/v1/models", timeout=30
        ) as r:
            print(f"multi: GET /v1/models -> {json.loads(r.read())}")
        with urllib.request.urlopen(
            f"http://127.0.0.1:{front.port}/stats", timeout=30
        ) as r:
            stats = json.loads(r.read())
        served = {n: s["requests_served"] for n, s in stats.items()}
        print(f"multi: per-model requests_served = {served}")
    finally:
        front.stop()
        cls_server.stop()
        mlm_server.stop()

    # request deadline: hold a 1-deep server busy, let a 30 ms-deadline
    # request expire in the queue -> server sheds it, client sees 504
    release = threading.Event()
    slow = BatchingServer(lambda x: (release.wait(10), x + 1)[1],
                          max_batch=1, max_wait_ms=0.0)
    front2 = HttpFrontend(slow, port=0).start()
    blocker = slow.submit(np.zeros((1,), np.float32))
    time.sleep(0.1)
    status = {}

    def doomed():
        try:
            post({"inputs": [0.0], "timeout_ms": 30}, port=front2.port)
            status["code"] = 200
        except urllib.error.HTTPError as e:
            status["code"] = e.code

    t = threading.Thread(target=doomed)
    t.start()
    time.sleep(0.3)
    release.set()
    t.join(30)
    blocker.result(10)
    front2.stop()
    expired = slow.stats()["requests_expired"]
    slow.stop()
    assert status["code"] == 504 and expired == 1, (status, expired)
    print("multi: 30 ms-deadline request shed server-side -> HTTP 504"
          f" (requests_expired={expired})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/perceiver_serve")
    ap.add_argument("--full-scale", action="store_true",
                    help="shipped ImageNet conv-prep config")
    ap.add_argument("--requests", type=int, default=20)
    ap.add_argument("--server", action="store_true",
                    help="also demo the micro-batching BatchingServer")
    ap.add_argument("--http", action="store_true",
                    help="also demo the HTTP front-end (JSON protocol)")
    ap.add_argument("--multi", action="store_true",
                    help="also demo multi-model routing + request deadlines")
    ap.add_argument("--quant", nargs="?", const="dynamic", default=None,
                    choices=["dynamic", "static"],
                    help="export with int8 projections (bare --quant = "
                         "dynamic per-token scales; 'static' calibrates "
                         "per-site scales before export; approximate "
                         "inference)")
    from perceiverio_pytorch_tpu.utils.compilation_cache import (
        add_cache_arg,
        enable_cache_if_requested,
    )

    add_cache_arg(ap)
    args = ap.parse_args()
    enable_cache_if_requested(args)

    build(args.out, args.full_scale, quant=args.quant)
    serve_demo(
        args.out,
        hw=224 if args.full_scale else 32,
        batch_sizes=(1, 4, 16) if args.full_scale else (1, 4),
        requests=args.requests,
    )
    if args.server:
        server_demo(args.out, hw=224 if args.full_scale else 32)
    if args.http:
        http_demo(args.out, hw=224 if args.full_scale else 32)
    if args.multi:
        multi_demo(args.out, hw=224 if args.full_scale else 32)


if __name__ == "__main__":
    main()
