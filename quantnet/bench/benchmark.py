"""Latency/throughput benchmark harness with honest device timing.

Behavioral contract from the reference's InferenceBenchmark
(utils/inference_benchmark.py:14-157: warm_up 10 iters, 100 timed iters at
batch 1 and 32, mean±std ms, images/s, compare_models loop) — but with TPU
methodology (SURVEY.md section 6 'hard parts'): compile time separated from
steady state (first call excluded by explicit warmup of the jitted fn),
``block_until_ready`` brackets every timed region, p50/p95 percentiles, images
per second per chip, and HBM footprint from array nbytes instead of
torch.cuda.max_memory_allocated (the reference crashed on no-CUDA hosts,
utils/result_analyzer.py:113-121 — device timing here is backend-neutral).
"""
from __future__ import annotations

import statistics
import time
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from quantnet.core.types import tree_nbytes


def time_fn(
    fn: Callable[[], jax.Array],
    *,
    warmup: int = 10,
    iters: int = 100,
) -> Dict[str, float]:
    """Time fn() (which must return a device array) with block_until_ready.

    Returns mean/std/p50/p95 in milliseconds.
    """
    for _ in range(warmup):
        fn().block_until_ready()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn().block_until_ready()
        times.append((time.perf_counter() - t0) * 1e3)
    times_sorted = sorted(times)
    return {
        "mean_ms": statistics.fmean(times),
        "std_ms": statistics.pstdev(times),
        "p50_ms": times_sorted[len(times) // 2],
        "p95_ms": times_sorted[min(int(len(times) * 0.95), len(times) - 1)],
        "min_ms": times_sorted[0],
    }


class InferenceBenchmark:
    """Benchmarks a dict of models over batch sizes.

    models: {name: (apply_fn, params, state)}; apply_fn(params, state, x,
    train=False) -> (logits, state).
    """

    def __init__(
        self,
        *,
        image_size: int = 32,
        channels: int = 3,
        warmup: int = 10,
        iters: int = 100,
        seed: int = 0,
    ):
        self.image_size = image_size
        self.channels = channels
        self.warmup = warmup
        self.iters = iters
        self.seed = seed

    def _input(self, batch_size: int) -> jax.Array:
        x = jax.random.normal(
            jax.random.PRNGKey(self.seed),
            (batch_size, self.image_size, self.image_size, self.channels),
            jnp.float32,
        )
        return jax.device_put(x)

    def measure(
        self,
        apply_fn: Callable,
        params: dict,
        state: dict,
        batch_size: int,
    ) -> Dict[str, float]:
        """Latency stats + throughput for one (model, batch size)."""
        x = self._input(batch_size)
        fwd = jax.jit(lambda p, s, x: apply_fn(p, s, x, train=False)[0])
        # Explicit compile phase (not counted): reference warm_up was 10 eager
        # iters (inference_benchmark.py:14-28); under jit one AOT compile + a
        # few steady-state warmups is the honest equivalent.
        compiled = fwd.lower(params, state, x).compile()
        stats = time_fn(
            lambda: compiled(params, state, x),
            warmup=self.warmup,
            iters=self.iters,
        )
        stats["batch_size"] = batch_size
        stats["ms_per_image"] = stats["mean_ms"] / batch_size
        stats["images_per_s"] = batch_size / (stats["mean_ms"] / 1e3)
        stats["images_per_s_p50"] = batch_size / (stats["p50_ms"] / 1e3)
        return stats

    def compare_models(
        self,
        models: Dict[str, tuple],
        batch_sizes: Sequence[int] = (1, 32),
    ) -> Dict[str, Dict[str, object]]:
        """Reference compare_models contract (inference_benchmark.py:107-157):
        per model: warmup -> per-batch-size latency + throughput + size."""
        results: Dict[str, Dict[str, object]] = {}
        for name, (apply_fn, params, state) in models.items():
            entry: Dict[str, object] = {
                "model_size_bytes": tree_nbytes(params),
                "model_size_mb": tree_nbytes(params) / (1024 * 1024),
            }
            for bs in batch_sizes:
                entry[f"bs{bs}"] = self.measure(apply_fn, params, state, bs)
            results[name] = entry
        return results


def scaling_efficiency(
    per_device_throughput: Dict[int, float],
) -> Dict[int, float]:
    """images/s efficiency vs linear scaling from the 1-device number.

    The BASELINE.json multi-host metric (>=90% 2-host target): eff(n) =
    throughput(n) / (n * throughput(1)).
    """
    base = per_device_throughput.get(1)
    if not base:
        return {}
    return {
        n: tp / (n * base) for n, tp in sorted(per_device_throughput.items())
    }
