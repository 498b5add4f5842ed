"""Micro-batching server: coalesce concurrent requests into device batches.

The reference serves by calling the eager model per request; on TPU the
economics are different — the MXU wants batches, XLA wants static shapes,
and every dispatch pays fixed launch latency.  ``BatchingServer`` is the
standard production answer: requests enqueue one example each; a single
device worker drains the queue, pads the group to the next bucket size
(static shapes → one compile per bucket, ever), runs the jitted function
once, and resolves each request's future with its row.

Works with any callable taking/returning pytrees whose array leaves have a
leading batch axis — e.g. a closed-over ``model.apply`` or a
``serving.load_exported`` artifact (``functools.partial(fn, variables)``).

    server = BatchingServer(lambda x: serve_fn(variables, x),
                            max_batch=16, max_wait_ms=2.0)
    fut = server.submit(example)        # one example, NO batch dim
    logits = fut.result()               # that example's output row
    server.stop()

Batching is transparent: outputs are identical to calling the function on
a batch of one (tested), only latency/throughput change.
"""

from __future__ import annotations

import collections
import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np

__all__ = ["BatchingServer"]


def _spec_of(example):
    """(treedef, [(shape, dtype), ...]) of an example pytree; no fetches."""
    leaves, treedef = jax.tree_util.tree_flatten(example)
    return treedef, [
        (np.shape(l), getattr(l, "dtype", np.asarray(l).dtype))
        for l in leaves
    ]


def _check_spec(spec, example) -> None:
    treedef, leaf_specs = spec
    leaves, got_def = jax.tree_util.tree_flatten(example)
    if got_def != treedef:
        raise ValueError(
            f"request structure {got_def} does not match the served"
            f" spec {treedef}"
        )
    for i, (leaf, (shape, dtype)) in enumerate(zip(leaves, leaf_specs)):
        got_shape = np.shape(leaf)
        got_dtype = getattr(leaf, "dtype", np.asarray(leaf).dtype)
        if got_shape != shape or got_dtype != dtype:
            raise ValueError(
                f"request leaf {i} is {got_dtype}{list(got_shape)};"
                f" the served spec is {dtype}{list(shape)}"
            )


def _default_buckets(max_batch: int) -> Sequence[int]:
    out, b = [], 1
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return out


class BatchingServer:
    """Coalesces ``submit`` calls into bucketed batches for a jitted fn.

    Args:
      fn: ``fn(batch_pytree) -> batch_pytree`` with aligned leading batch
        axes (already closed over weights).  Called only from the worker
        thread.
      max_batch: largest batch per device call (also the largest bucket).
      max_wait_ms: after the first request of a group arrives, wait at most
        this long for more before dispatching.  0 dispatches immediately
        (batches still form under sustained load via queue backlog).
      batch_sizes: bucket sizes to pad to (sorted); defaults to powers of
        two up to ``max_batch``.  Every padded shape is compiled once.
      pipeline: keep ONE batch in flight while collecting and dispatching
        the next, overlapping the host->device transfer and queueing of
        batch i+1 with batch i's device compute (measured 1.4x on
        transfer-bound full-scale classification serving).  Requires
        ``fn`` to be async-friendly: it must return jax device arrays
        WITHOUT fetching (no ``np.asarray`` inside — pass the jitted call
        directly); the server fetches when resolving futures.  Output
        equivalence is tested; only latency shape changes.
      example_spec: optional example pytree fixing the accepted request
        structure/shapes/dtypes.  With a spec, a malformed example is
        rejected at ``submit`` time with ValueError instead of poisoning
        the whole device batch it would share (one bad request would
        fail every coalesced neighbour's future) -- note a batch mixing
        dtypes is silently upcast by the stacking, so with heterogeneous
        clients a spec (or per-dtype servers) is strongly advised.
        ``warmup(example, set_spec=True)`` can set it from an example.
    """

    def __init__(
        self,
        fn: Callable[..., Any],
        max_batch: int = 16,
        max_wait_ms: float = 2.0,
        batch_sizes: Optional[Sequence[int]] = None,
        pipeline: bool = False,
        example_spec: Any = None,
    ):
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1; got {max_batch}")
        self._fn = fn
        self._max_batch = max_batch
        self._max_wait = max_wait_ms / 1e3
        self._pipeline = pipeline
        self._buckets = sorted(batch_sizes or _default_buckets(max_batch))
        if self._buckets[-1] < max_batch:
            raise ValueError(
                f"largest bucket {self._buckets[-1]} < max_batch {max_batch}"
            )
        self._spec = _spec_of(example_spec) if example_spec is not None else None
        self._queue: "queue.Queue" = queue.Queue()
        self._stopped = threading.Event()
        # observability (see stats()); guarded by _stats_lock -- counters
        # are touched by the worker thread and read by any caller
        self._stats_lock = threading.Lock()
        self._counters = {
            "requests_served": 0, "batches_dispatched": 0,
            "examples_dispatched": 0, "rows_padded": 0, "errors": 0,
            "requests_expired": 0,
        }
        self._bucket_counts = {b: 0 for b in self._buckets}
        self._latencies: "collections.deque" = collections.deque(maxlen=512)
        self._worker = threading.Thread(
            target=self._run, daemon=True, name="batching_server"
        )
        self._worker.start()

    # -- client side -------------------------------------------------------

    def submit(self, example: Any, timeout: Optional[float] = None) -> Future:
        """Enqueue one example (a pytree WITHOUT batch dim); returns a
        Future resolving to that example's output row (batch dim removed).

        ``timeout`` (seconds) sets a request deadline: if the worker has
        not DISPATCHED the example to the device by then, the future fails
        with TimeoutError and the example is shed — it never occupies a
        device batch.  This is server-side load shedding: under overload
        the queue backlog grows, and without deadlines every late request
        still burns device time computing an answer its client already
        abandoned.  (A client-side ``fut.result(timeout=...)`` only stops
        the *wait*, not the work.)  Once dispatch has started the request
        completes normally — device work is never cancelled mid-batch.
        """
        if self._stopped.is_set():
            raise RuntimeError("BatchingServer is stopped")
        if timeout is not None and timeout <= 0:
            raise ValueError(f"timeout must be positive; got {timeout}")
        if self._spec is not None:
            _check_spec(self._spec, example)
        fut: Future = Future()
        now = time.perf_counter()
        deadline = None if timeout is None else now + timeout
        self._queue.put((example, fut, now, deadline))
        return fut

    def __call__(self, example: Any) -> Any:
        """Blocking convenience wrapper around submit()."""
        return self.submit(example).result()

    def warmup(self, example: Any, set_spec: bool = False) -> None:
        """Compile every bucket shape before taking traffic.

        Each padded batch shape is one XLA compile (expensive through a
        remote compile service); production servers warm them all at
        startup so no client request ever pays a compile.  Calls ``fn``
        directly from this thread (jitted callables are thread-safe) and
        fetches, so when this returns every bucket is compiled and the
        device is idle.  Does not touch the stats counters.

        ``set_spec=True`` additionally fixes the accepted request spec to
        this example's structure/shapes/dtypes (if no ``example_spec``
        was given).  Off by default: a server may legitimately accept
        several request dtypes (e.g. uint8 pixel payloads next to fp32 --
        jit compiles each variant), and pinning the warmup example's
        dtype would 400 the others.  Only opt in when all clients send
        exactly one shape/dtype.
        """
        if set_spec and self._spec is None:
            self._spec = _spec_of(example)
        for b in self._buckets:
            stacked = jax.tree_util.tree_map(
                lambda leaf: np.stack([leaf] * b), example
            )
            jax.device_get(self._fn(stacked))

    def stop(self, drain: bool = True) -> None:
        """Stop the worker.  ``drain=True`` serves queued requests first;
        otherwise they fail with RuntimeError."""
        self._stopped.set()
        self._queue.put(None)  # wake the worker
        self._worker.join()
        # anything still queued after the worker exits
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is None:
                continue
            if self._shed_if_expired(item):
                continue
            example, fut, t0, deadline = item
            if drain:
                try:
                    row = self._call_batch([example])[0]
                except BaseException as e:
                    self._count_error()
                    fut.set_exception(e)
                else:
                    self._resolve([item], [row])
            else:
                fut.set_exception(RuntimeError("BatchingServer stopped"))

    def stats(self) -> dict:
        """Snapshot of serving counters (thread-safe, cheap).

        Keys: requests_served, batches_dispatched, examples_dispatched,
        rows_padded, errors, requests_expired (deadline shedding),
        queue_depth, per-bucket dispatch counts,
        mean_batch_occupancy (examples / padded rows actually computed),
        and request latency percentiles over the last 512 requests
        (submit -> result, i.e. including queueing and batching waits).
        """
        with self._stats_lock:
            c = dict(self._counters)
            buckets = {str(k): v for k, v in self._bucket_counts.items()}
            lat = sorted(self._latencies)
        out: dict = {**c, "queue_depth": self._queue.qsize(),
                     "bucket_dispatches": buckets}
        rows = c["examples_dispatched"] + c["rows_padded"]
        if rows:
            out["mean_batch_occupancy"] = round(
                c["examples_dispatched"] / rows, 4
            )
        if lat:
            out["request_latency_ms"] = {
                "p50": round(lat[len(lat) // 2] * 1e3, 3),
                "p99": round(lat[min(len(lat) - 1, int(len(lat) * 0.99))]
                             * 1e3, 3),
                "mean": round(sum(lat) / len(lat) * 1e3, 3),
                "window": len(lat),
            }
        return out

    def _count_error(self) -> None:
        with self._stats_lock:
            self._counters["errors"] += 1

    def _shed_if_expired(self, item) -> bool:
        """If the item's deadline has passed, fail its future with
        TimeoutError (shedding the device work) and return True."""
        _, fut, t0, deadline = item
        if deadline is None or time.perf_counter() <= deadline:
            return False
        with self._stats_lock:
            self._counters["requests_expired"] += 1
        fut.set_exception(
            TimeoutError(
                f"request expired in queue after"
                f" {time.perf_counter() - t0:.3f}s (server overloaded?)"
            )
        )
        return True

    def _resolve(self, group, rows) -> None:
        """Record latencies and hand each request its output row."""
        now = time.perf_counter()
        with self._stats_lock:
            self._counters["requests_served"] += len(group)
            for _, _, t0, _ in group:
                self._latencies.append(now - t0)
        for (_, fut, _, _), row in zip(group, rows):
            fut.set_result(row)

    # -- worker side -------------------------------------------------------

    def _bucket(self, n: int) -> int:
        for b in self._buckets:
            if b >= n:
                return b
        return self._buckets[-1]

    def _dispatch(self, examples):
        """Stack, pad to the bucket, and call fn (no fetch of its own --
        with a jitted async fn the device work is merely enqueued here)."""
        n = len(examples)
        pad_to = self._bucket(n)
        with self._stats_lock:
            self._counters["batches_dispatched"] += 1
            self._counters["examples_dispatched"] += n
            self._counters["rows_padded"] += pad_to - n
            self._bucket_counts[pad_to] += 1
        stacked = jax.tree_util.tree_map(
            lambda *leaves: np.stack(
                list(leaves) + [leaves[-1]] * (pad_to - n)
            ),
            *examples,
        )
        return self._fn(stacked)

    def _finish(self, out, n: int) -> list:
        # one wholesale fetch (device_get is the identity on numpy outputs)
        # then host-side row slicing -- never per-row device ops
        out = jax.device_get(out)
        return [
            jax.tree_util.tree_map(lambda leaf: leaf[i], out)
            for i in range(n)
        ]

    def _call_batch(self, examples) -> list:
        return self._finish(self._dispatch(examples), len(examples))

    def _run(self) -> None:
        pending = None  # pipeline mode: (group, in-flight device output)

        def settle(p) -> None:
            if p is None:
                return
            group, out = p
            try:
                rows = self._finish(out, len(group))
            except BaseException as e:
                self._count_error()
                for _, fut, _, _ in group:
                    fut.set_exception(e)
                return
            self._resolve(group, rows)

        def handle(group) -> None:
            nonlocal pending
            if not group:
                return
            if not self._pipeline:
                self._serve_group(group)
                return
            try:
                out = self._dispatch([ex for ex, _, _, _ in group])
            except BaseException as e:
                self._count_error()
                for _, fut, _, _ in group:
                    fut.set_exception(e)
                out = None
            # resolve the PREVIOUS batch while this one computes: its
            # transfer+dispatch above overlapped the prior device work
            settle(pending)
            pending = (group, out) if out is not None else None

        while True:
            if pending is not None:
                # results are owed: only keep them in flight while more
                # work is immediately available -- never block on an empty
                # queue holding clients' futures
                try:
                    item = self._queue.get_nowait()
                except queue.Empty:
                    settle(pending)
                    pending = None
                    item = self._queue.get()
            else:
                item = self._queue.get()
            if item is None:
                if self._stopped.is_set():
                    settle(pending)
                    return
                continue
            if self._shed_if_expired(item):
                continue
            group = [item]
            t_end = time.perf_counter() + max(self._max_wait, 0.0)
            while len(group) < self._max_batch:
                remaining = t_end - time.perf_counter()
                try:
                    nxt = (
                        self._queue.get_nowait()
                        if remaining <= 0
                        else self._queue.get(timeout=remaining)
                    )
                except queue.Empty:
                    break
                if nxt is None:
                    if self._stopped.is_set():
                        handle(group)
                        settle(pending)
                        return
                    continue
                if self._shed_if_expired(nxt):
                    continue
                group.append(nxt)
            handle(group)
            if self._stopped.is_set() and self._queue.empty():
                settle(pending)
                return

    def _serve_group(self, group) -> None:
        examples = [ex for ex, _, _, _ in group]
        try:
            rows = self._call_batch(examples)
        except BaseException as e:
            self._count_error()
            for _, fut, _, _ in group:
                fut.set_exception(e)
            return
        self._resolve(group, rows)
