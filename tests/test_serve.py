"""Continuous-batching inference engine tests (CPU, small model)."""
import concurrent.futures

import jax
import numpy as np
import pytest

from quantnet.models import convnet
from quantnet.quantize import weight_only
from quantnet.serve import InferenceEngine


@pytest.fixture(scope="module")
def small_model():
    params, state = convnet.init(jax.random.PRNGKey(0))
    return convnet.apply, params, state


def test_single_request_matches_direct_forward(small_model):
    apply_fn, params, state = small_model
    img = np.random.default_rng(0).normal(size=(32, 32, 3)).astype(np.float32)
    direct, _ = apply_fn(params, state, img[None], train=False)
    with InferenceEngine(
        apply_fn, params, state, buckets=(1, 4), precompile=False
    ) as eng:
        got = eng.predict(img, timeout=60)
    np.testing.assert_allclose(got, np.asarray(direct)[0], rtol=2e-4, atol=2e-5)


def test_concurrent_requests_batched(small_model):
    apply_fn, params, state = small_model
    rng = np.random.default_rng(1)
    imgs = rng.normal(size=(12, 32, 32, 3)).astype(np.float32)
    direct, _ = apply_fn(params, state, imgs, train=False)
    with InferenceEngine(
        apply_fn, params, state, buckets=(1, 4, 16), max_wait_ms=50,
        precompile=False,
    ) as eng:
        futs = [eng.submit(img) for img in imgs]
        results = [f.result(timeout=120) for f in futs]
        stats = dict(eng.stats)
    got = np.stack(results)
    np.testing.assert_allclose(got, np.asarray(direct), rtol=2e-4, atol=2e-5)
    assert stats["requests"] == 12
    # coalescing must have happened: fewer batches than requests
    assert stats["batches"] < 12


def test_quantized_artifact_serves(small_model):
    apply_fn, params, state = small_model
    qp, qs = weight_only.quantize(params, state)
    img = np.zeros((32, 32, 3), np.float32)
    with InferenceEngine(apply_fn, qp, qs, buckets=(1,), precompile=False) as eng:
        out = eng.predict(img, timeout=120)
    assert out.shape == (10,)
    assert np.isfinite(out).all()


def test_rejects_wrong_shape(small_model):
    apply_fn, params, state = small_model
    with InferenceEngine(apply_fn, params, state, buckets=(1,), precompile=False) as eng:
        with pytest.raises(ValueError):
            eng.submit(np.zeros((8, 8, 3), np.float32))


def test_occupancy_accounting(small_model):
    apply_fn, params, state = small_model
    with InferenceEngine(
        apply_fn, params, state, buckets=(4,), max_wait_ms=1, precompile=False
    ) as eng:
        eng.predict(np.zeros((32, 32, 3), np.float32), timeout=120)
        # one request in a 4-bucket -> 3 padded rows
        assert eng.stats["padded_rows"] == 3
        assert 0.0 < eng.occupancy() <= 0.25 + 1e-6


def test_mesh_sharded_serving(small_model):
    """Data-parallel continuous batching over the virtual device mesh
    (BASELINE.json config 5)."""
    from quantnet.parallel.mesh import make_mesh

    apply_fn, params, state = small_model
    mesh = make_mesh(data_parallel=4)
    rng = np.random.default_rng(3)
    imgs = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    direct, _ = apply_fn(params, state, imgs, train=False)
    with InferenceEngine(
        apply_fn, params, state, buckets=(4, 8), max_wait_ms=50,
        precompile=False, mesh=mesh,
    ) as eng:
        # bucket sizes forced to multiples of the data axis (4)
        assert all(b % 4 == 0 for b in eng.buckets)
        futs = [eng.submit(img) for img in imgs]
        results = [f.result(timeout=120) for f in futs]
    np.testing.assert_allclose(np.stack(results), np.asarray(direct), rtol=2e-4, atol=2e-5)


def test_eager_drain_after_slow_batch(small_model):
    """Regression (scripts/tpu_serve_bench.py finding): requests that queue
    up while a batch is in flight must be coalesced into the NEXT batch even
    though their max_wait deadline already passed — without the eager drain
    the engine served them one at a time (batch size 1, 48x slower under
    load on the real chip)."""
    apply_fn, params, state = small_model
    rng = np.random.default_rng(2)
    imgs = rng.normal(size=(48, 32, 32, 3)).astype(np.float32)
    with InferenceEngine(
        apply_fn, params, state, buckets=(1, 4, 64), max_wait_ms=0.0,
        precompile=False,
    ) as eng:
        # max_wait_ms=0: every request's deadline expires instantly, so only
        # the eager drain can ever form multi-request batches.
        futs = [eng.submit(img) for img in imgs]
        for f in futs:
            f.result(timeout=120)
        stats = dict(eng.stats)
    assert stats["requests"] == 48
    # Without eager drain this is exactly 48; with it, the first (compile)
    # batch is tiny and everything queued behind it lands in a few batches.
    assert stats["batches"] <= 10, stats


def test_latency_stats_populated(small_model):
    """Per-request latency percentiles (round-2 serving observability):
    recorded for every completed request, sane ordering of percentiles."""
    apply_fn, params, state = small_model
    rng = np.random.default_rng(1)
    with InferenceEngine(
        apply_fn, params, state, buckets=(1, 8), precompile=False
    ) as eng:
        futs = [
            eng.submit(rng.normal(size=(32, 32, 3)).astype(np.float32))
            for _ in range(12)
        ]
        for f in futs:
            f.result(timeout=120)
        stats = eng.latency_stats()
    assert stats["n"] == 12
    assert 0 < stats["p50_ms"] <= stats["p95_ms"] <= stats["p99_ms"]
    assert stats["mean_ms"] > 0


def test_dispatch_overlaps_device_fetch(small_model):
    """Double buffering: the dispatcher must keep batching while a previous
    batch's result fetch is in flight — with many queued requests the engine
    coalesces them instead of serving strictly one-at-a-time."""
    apply_fn, params, state = small_model
    rng = np.random.default_rng(2)
    with InferenceEngine(
        apply_fn, params, state, buckets=(1, 16), max_wait_ms=0.0,
        precompile=True,
    ) as eng:
        futs = [
            eng.submit(rng.normal(size=(32, 32, 3)).astype(np.float32))
            for _ in range(64)
        ]
        for f in futs:
            f.result(timeout=120)
        batches = eng.stats["batches"]
    assert batches < 64, f"no coalescing: {batches} batches for 64 requests"


def test_burst_slo_occupancy_and_p95(small_model):
    """SLO regression pin (VERDICT round 2): under a bursty arrival pattern
    the engine must hold batch occupancy above a floor AND keep p95 latency
    within a small multiple of the per-batch device cost. The 48x-slow
    failure mode this guards against (dispatcher serving queued requests one
    at a time) pushes p95 to ~(n_requests x batch_time) — far outside the
    bound — and occupancy stays high there, which is why occupancy alone is
    not a sufficient guard."""
    import time

    apply_fn, params, state = small_model
    rng = np.random.default_rng(3)
    # Direct per-batch cost at the largest bucket (compile excluded).
    xb = rng.normal(size=(32, 32, 32, 3)).astype(np.float32)
    fwd = jax.jit(lambda p, s, x: apply_fn(p, s, x, train=False)[0])
    np.asarray(fwd(params, state, xb))  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(fwd(params, state, xb))
    t_batch = (time.perf_counter() - t0) / 3

    with InferenceEngine(
        apply_fn, params, state, buckets=(1, 8, 32), max_wait_ms=1.0,
        precompile=True,
    ) as eng:
        futs = []
        for _burst in range(3):  # 3 bursts of 32, back to back
            futs += [
                eng.submit(rng.normal(size=(32, 32, 3)).astype(np.float32))
                for _ in range(32)
            ]
            time.sleep(0.005)
        for f in futs:
            f.result(timeout=120)
        stats = eng.latency_stats()
        occ = eng.occupancy()
    assert stats["n"] == 96
    assert occ >= 0.5, f"burst occupancy collapsed: {occ:.2f}"
    # Worst queued request waits ~(#batches in flight) x t_batch; give 12x
    # plus scheduling slack. One-at-a-time dispatch would be ~90x t_batch.
    bound_ms = 12 * t_batch * 1e3 + 100.0
    assert stats["p95_ms"] <= bound_ms, (
        f"p95 {stats['p95_ms']:.1f}ms exceeds SLO bound {bound_ms:.1f}ms "
        f"(t_batch {t_batch*1e3:.1f}ms, occupancy {occ:.2f})"
    )


def test_uint8_wire_matches_host_normalized_f32(small_model):
    """uint8 wire format (round 5, VERDICT task 3): raw u8 HWC payloads are
    normalized on device inside the precompiled forward; logits must match
    serving the host-normalized f32 image on an f32-wire engine. 4x less
    transfer per request — the deployment wire format for the
    transport-bound serving path (docs/PERF.md round 4)."""
    apply_fn, params, state = small_model
    rng = np.random.default_rng(1)
    img_u8 = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    mean = np.asarray([0.49, 0.48, 0.45], np.float32)
    std = np.asarray([0.25, 0.24, 0.26], np.float32)
    img_f32 = (img_u8.astype(np.float32) / 255.0 - mean) / std
    direct, _ = apply_fn(params, state, img_f32[None], train=False)
    with InferenceEngine(
        apply_fn, params, state, buckets=(1, 4), precompile=False,
        wire_dtype="uint8", normalize=(mean, std),
    ) as eng:
        got = eng.predict(img_u8, timeout=60)
        # wrong-dtype payloads are rejected, not silently cast
        with pytest.raises(TypeError):
            eng.submit(img_f32)
    np.testing.assert_allclose(got, np.asarray(direct)[0], rtol=2e-4, atol=2e-5)


def test_uint8_wire_requires_normalize(small_model):
    apply_fn, params, state = small_model
    with pytest.raises(ValueError):
        InferenceEngine(
            apply_fn, params, state, buckets=(1,), precompile=False,
            wire_dtype="uint8",
        )
