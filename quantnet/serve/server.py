"""Continuous-batching inference engine.

The reference served inference one DataLoader batch at a time from a blocking
loop (utils/inference_benchmark.py:107-157, utils/model_evaluator.py:28-46);
its production story ended there. The TPU-native serving equivalent (SURVEY.md
section 5, long-context note: the scale axis of this workload is *batch*) is
request-level continuous batching: callers submit single images at any time,
a dispatcher thread coalesces whatever is queued into the largest fitting
batch bucket, and one jitted forward per bucket size serves everything —
static shapes for XLA, high MXU occupancy under load, bounded latency when
idle.

Design notes:
  - bucketed static batch shapes (XLA recompiles per shape; buckets bound the
    number of programs and are precompiled at startup);
  - the dispatcher never waits longer than max_wait_ms once a request is
    pending, and drains eagerly when a full bucket is queued;
  - padding rides the same program (pad rows are computed and discarded) —
    at bucket occupancy >= 50% this still beats waiting for a full batch;
  - dispatch and completion are decoupled (double buffering): JAX dispatch
    is asynchronous, so the dispatcher enqueues batch N's device computation
    and immediately assembles batch N+1 while a completion thread blocks on
    batch N's result fetch — the device never idles waiting for host-side
    batch assembly, and host assembly never waits for the device round trip
    (which dominates on a tunnel-attached chip). In-flight depth is bounded
    at 2 for backpressure.
  - uint8 wire format (wire_dtype="uint8" + normalize): request payloads are
    raw u8 HWC images, normalized ON DEVICE inside the precompiled forward —
    4x less host->device transfer per request than f32. At 224 px the f32
    payload is 602 KB/request and the measured serve bench was
    transport-bound (58 req/s while the same chip chained 43,858 img/s —
    docs/PERF.md round 4); u8 is the deployment wire format. Same
    normalization math as the training input pipeline
    (quantnet/data/datasets.py::device_arrays).
"""
from __future__ import annotations

import collections
import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class InferenceEngine:
    """Continuous-batching server over a jitted forward.

    apply_fn(params, state, x, train=False) -> (logits, state); params/state
    may be any quantized or FP32 artifact tree.
    """

    def __init__(
        self,
        apply_fn: Callable,
        params: dict,
        state: dict,
        *,
        image_shape: Tuple[int, int, int] = (32, 32, 3),
        buckets: Sequence[int] = (1, 8, 32, 128),
        max_wait_ms: float = 2.0,
        precompile: bool = True,
        mesh=None,
        wire_dtype: str = "float32",
        normalize: Optional[Tuple] = None,
    ):
        """With a mesh (jax.sharding.Mesh with a 'data' axis), batches are
        sharded data-parallel across it: params/state replicated once at
        startup, each bucket batch split over devices by the partitioner —
        BASELINE.json config 5's continuous batching over a pod slice. Buckets
        are rounded up to multiples of the mesh's data-axis size so shards
        stay static-shaped.

        wire_dtype="uint8" switches the request payload to raw u8 HWC;
        `normalize` = (mean, std) per-channel stats (the training pipeline's,
        e.g. Dataset.mean/std) applied on device as (x/255 - mean)/std inside
        the precompiled forward. Payloads shrink 4x; the engine's compute
        graph sees exactly the same f32 the host pipeline would produce."""
        self.mesh = mesh
        if mesh is not None:
            from quantnet.parallel.mesh import (
                DATA_AXIS,
                batch_sharding,
                shard_params,
            )

            ndata = mesh.shape[DATA_AXIS]
            buckets = sorted({max(b, ndata) + (-max(b, ndata)) % ndata for b in buckets})
            params = shard_params(mesh, params)
            state = shard_params(mesh, state)
            self._x_sharding = batch_sharding(mesh)
        else:
            self._x_sharding = None
        self.params = params
        self.state = state
        self.image_shape = tuple(image_shape)
        self.buckets = tuple(sorted(buckets))
        self.max_wait_s = max_wait_ms / 1e3
        if wire_dtype not in ("float32", "uint8"):
            raise ValueError(f"unsupported wire_dtype {wire_dtype!r}")
        if wire_dtype == "uint8" and normalize is None:
            raise ValueError(
                "wire_dtype='uint8' needs normalize=(mean, std) — the u8 "
                "payload is normalized on device"
            )
        self.wire_dtype = np.dtype(wire_dtype)
        if wire_dtype == "uint8":
            mean = jnp.asarray(normalize[0], jnp.float32)
            std = jnp.asarray(normalize[1], jnp.float32)
            self._fwd = jax.jit(
                lambda p, s, x: apply_fn(
                    p, s, (x.astype(jnp.float32) / 255.0 - mean) / std,
                    train=False,
                )[0]
            )
        else:
            self._fwd = jax.jit(
                lambda p, s, x: apply_fn(p, s, x, train=False)[0]
            )
        self._queue: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._stats_lock = threading.Lock()
        self.stats: Dict[str, float] = {
            "requests": 0,
            "batches": 0,
            "padded_rows": 0,
        }
        # Per-request end-to-end latencies (submit -> result ready), seconds;
        # bounded window so a long-lived engine doesn't grow unboundedly.
        self._latencies: "collections.deque[float]" = collections.deque(maxlen=16384)
        # Double buffer: dispatched-but-unfetched batches. maxsize=2 bounds
        # in-flight device work (backpressure on the dispatcher).
        self._inflight: "queue.Queue" = queue.Queue(maxsize=2)
        if precompile:
            self.warmup()
        self._thread = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._thread.start()
        self._completion = threading.Thread(target=self._completion_loop, daemon=True)
        self._completion.start()

    # -- public API -------------------------------------------------------

    def submit(self, image: np.ndarray) -> "Future[np.ndarray]":
        """Enqueue one image; resolves to its logits vector.

        The payload must match the engine's wire dtype: a float image on a
        uint8-wire engine (or vice versa) is rejected rather than silently
        cast — a cast would corrupt the data (floats truncated to 0-255
        codes, or u8 codes interpreted as already-normalized floats)."""
        image = np.asarray(image)
        if tuple(image.shape) != self.image_shape:
            raise ValueError(f"expected {self.image_shape}, got {image.shape}")
        if image.dtype != self.wire_dtype:
            raise TypeError(
                f"engine wire dtype is {self.wire_dtype}, got {image.dtype}"
            )
        fut: Future = Future()
        self._queue.put((image, fut, time.perf_counter()))
        return fut

    def predict(self, image: np.ndarray, timeout: Optional[float] = None) -> np.ndarray:
        """Blocking single-request convenience wrapper."""
        return self.submit(image).result(timeout=timeout)

    def warmup(self):
        """Precompile every bucket program (one compile per static shape)."""
        for b in self.buckets:
            x = np.zeros((b, *self.image_shape), self.wire_dtype)
            xd = (
                jax.device_put(x, self._x_sharding)
                if self._x_sharding is not None
                else jnp.asarray(x)
            )
            np.asarray(self._fwd(self.params, self.state, xd))

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5)
        # Unblock and drain the completion thread after the dispatcher quit
        # (anything still in flight resolves normally first).
        try:
            self._inflight.put(None, timeout=10)
        except queue.Full:
            pass
        self._completion.join(timeout=10)

    def latency_stats(self) -> Dict[str, float]:
        """End-to-end per-request latency percentiles (ms) over the most
        recent window (submit -> logits available on host)."""
        with self._stats_lock:
            lat = sorted(self._latencies)
        if not lat:
            return {}
        n = len(lat)

        def pct(p: float) -> float:
            return lat[min(int(p * n), n - 1)] * 1e3

        return {
            "n": n,
            "mean_ms": sum(lat) / n * 1e3,
            "p50_ms": pct(0.50),
            "p95_ms": pct(0.95),
            "p99_ms": pct(0.99),
        }

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- dispatcher --------------------------------------------------------

    def _pick_bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _dispatch_loop(self):
        pending = []
        while not self._stop.is_set():
            # Block for the first request, then coalesce.
            if not pending:
                try:
                    pending.append(self._queue.get(timeout=0.05))
                except queue.Empty:
                    continue
            # Eager drain: everything already queued joins this batch
            # regardless of the deadline — requests that piled up during the
            # previous device round trip must not be served one by one
            # (found by scripts/tpu_serve_bench.py: without this, a loaded
            # engine degraded to batch size 1 at 100% occupancy).
            while len(pending) < self.buckets[-1]:
                try:
                    pending.append(self._queue.get_nowait())
                except queue.Empty:
                    break
            # Still below the largest bucket: wait out the head request's
            # coalescing window for stragglers.
            deadline = pending[0][2] + self.max_wait_s
            while len(pending) < self.buckets[-1]:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    pending.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            take = min(len(pending), self.buckets[-1])
            batch, pending = pending[:take], pending[take:]
            self._run_batch(batch)

    def _run_batch(self, batch):
        """Assemble + dispatch one batch, then hand the in-flight device
        result to the completion thread. Returns as soon as the dispatch is
        enqueued (JAX async dispatch) — the dispatcher immediately starts
        coalescing the next batch while the device computes this one."""
        n = len(batch)
        b = self._pick_bucket(n)
        x = np.zeros((b, *self.image_shape), self.wire_dtype)
        for i, (img, _, _) in enumerate(batch):
            x[i] = img
        try:
            xd = (
                jax.device_put(x, self._x_sharding)
                if self._x_sharding is not None
                else jnp.asarray(x)
            )
            logits_dev = self._fwd(self.params, self.state, xd)
        except Exception as e:  # propagate to every waiter, keep serving
            for _, fut, _ in batch:
                fut.set_exception(e)
            return
        # Blocks only when 2 batches are already in flight (backpressure).
        self._inflight.put((logits_dev, batch, b))

    def _completion_loop(self):
        while True:
            item = self._inflight.get()
            if item is None:
                return
            logits_dev, batch, b = item
            try:
                logits = np.asarray(logits_dev)  # blocks on the device fetch
            except Exception as e:
                for _, fut, _ in batch:
                    fut.set_exception(e)
                continue
            done = time.perf_counter()
            for i, (_, fut, _) in enumerate(batch):
                fut.set_result(logits[i])
            with self._stats_lock:
                self.stats["requests"] += len(batch)
                self.stats["batches"] += 1
                self.stats["padded_rows"] += b - len(batch)
                for _, _, t_submit in batch:
                    self._latencies.append(done - t_submit)

    # -- introspection ------------------------------------------------------

    def occupancy(self) -> float:
        """Mean fraction of batch rows that carried real requests."""
        with self._stats_lock:
            served = self.stats["requests"]
            padded = self.stats["padded_rows"]
        total = served + padded
        return served / total if total else 1.0
