"""Continuous-batching serving load test on the real chip.

Drives quantnet/serve/server.py::InferenceEngine with concurrent
single-image submitters (static-INT8 artifact) and reports sustained
request throughput, latency percentiles, and batch occupancy.

Usage: python scripts/tpu_serve_bench.py
         [convnet|resnet50|r18_224|r18_224_f32|r50_224] [requests_per_client]

224px modes serve the committed track checkpoints; r18_224/r50_224 use the
uint8 wire format (4x smaller payloads, normalize on device — the
deployment config), r18_224_f32 preserves the round-4 f32-wire measurement
for the A/B.

Note on absolute numbers: each dispatched batch pays a host<->device round
trip; on a tunnel-attached device that round trip dominates single-request
latency, so these figures are a lower bound on what a locally-attached chip
serves (the chip-side cost per batch is the bench.py chain-differenced
number).
"""
from __future__ import annotations

import os
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

T0 = time.time()


def log(m):
    print(f"[+{time.time() - T0:.0f}s] {m}", flush=True)


def main():
    import sys

    from quantnet.models import convnet, resnet
    from quantnet.quantize import static
    from quantnet.serve.server import InferenceEngine

    model = sys.argv[1] if len(sys.argv) > 1 else "convnet"
    per_thread = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    rng = jax.random.PRNGKey(0)
    # u8 wire is the 224px deployment config (4x smaller request payloads,
    # normalize on device — VERDICT round-4 task 3); r18_224_f32 preserves
    # the round-4 transport-bound measurement for the A/B.
    wire_u8 = model in ("r18_224", "r50_224")
    if model in ("r18_224", "r18_224_f32", "r50_224"):
        # Serve the COMMITTED 224px-track fp32 checkpoint statically
        # quantized — request latency/throughput at the reference's ImageNet
        # serving shape (docs/results_tpu_v5e_r18_224/).
        from quantnet.train import checkpoint as ckpt

        apply_fn = resnet.apply
        # Max bucket is a throughput lever on the tunnel: each dispatched
        # batch pays a fixed ~300 ms round trip, so under saturating load
        # req/s scales with rows/batch until HBM or compute binds. Override
        # with SERVE_MAX_BUCKET (round-5 sweep below, docs/PERF.md).
        max_bucket = int(os.environ.get("SERVE_MAX_BUCKET", "64"))
        size, buckets = 224, (1, 8, 32, max_bucket)
        src = (
            "runs/r5_r50_224/saved/fp32"
            if model == "r50_224" else "runs/r3_r18_224/saved/fp32"
        )
        tree, _ = ckpt.load_artifact(src)
        params, state = tree["params"], tree["state"]
    elif model == "resnet50":
        apply_fn = resnet.apply
        size, buckets = 64, (1, 8, 32, 128)
        params, state = resnet.init(rng, num_classes=100, depth=50)
    else:
        apply_fn = convnet.apply
        size, buckets = 32, (1, 8, 32, 128, 512)
        params, state = convnet.init(rng)
    calib = jax.random.normal(
        jax.random.PRNGKey(1), (128, size, size, 3), jnp.float32
    )
    qp, qs = static.quantize(
        params, state, apply_fn, [(calib, None)], skip_first_layer=True
    )
    jax.block_until_ready(qp)
    log(f"quantized {model}; starting engine (precompiling buckets)")

    # Normalization stats for the u8 wire: the synthetic 224px track trains
    # on (x/255 - mean)/std with ImageNet stats (quantnet/data/datasets.py).
    from quantnet.data.datasets import IMAGENET_MEAN, IMAGENET_STD

    wire_kwargs = (
        {"wire_dtype": "uint8", "normalize": (IMAGENET_MEAN, IMAGENET_STD)}
        if wire_u8 else {}
    )
    with InferenceEngine(
        apply_fn, qp, qs, image_shape=(size, size, 3), buckets=buckets,
        max_wait_ms=2.0, **wire_kwargs,
    ) as eng:
        log(f"warm; load test (wire={'u8' if wire_u8 else 'f32'})")
        # Open-loop-ish load: each client keeps a window of in-flight async
        # submissions (closed-loop predict() would cap throughput at
        # n_clients / round-trip regardless of engine batching).
        n_threads, window = 8, 64
        lat = []
        lock = threading.Lock()
        if wire_u8:
            img = np.random.default_rng(0).integers(
                0, 256, size=(size, size, 3), dtype=np.uint8
            )
        else:
            img = np.random.default_rng(0).normal(
                size=(size, size, 3)
            ).astype(np.float32)

        def client():
            mine = []
            inflight = []
            for _ in range(per_thread):
                inflight.append((time.perf_counter(), eng.submit(img)))
                if len(inflight) >= window:
                    t0, fut = inflight.pop(0)
                    fut.result(timeout=60)
                    mine.append((time.perf_counter() - t0) * 1e3)
            for t0, fut in inflight:
                fut.result(timeout=60)
                mine.append((time.perf_counter() - t0) * 1e3)
            with lock:
                lat.extend(mine)

        ts = [threading.Thread(target=client) for _ in range(n_threads)]
        t_start = time.perf_counter()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        wall = time.perf_counter() - t_start
        lat.sort()
        n = len(lat)
        log(
            f"served {n} requests in {wall:.2f}s -> {n / wall:,.0f} req/s | "
            f"p50 {lat[n // 2]:.1f} ms  p95 {lat[int(n * 0.95)]:.1f} ms  "
            f"p99 {lat[int(n * 0.99)]:.1f} ms | "
            f"occupancy {eng.occupancy():.2f} over {eng.stats['batches']:.0f} batches"
        )
        log(f"engine-side latency stats: {eng.latency_stats()}")


if __name__ == "__main__":
    main()
