"""Latency/throughput benchmark harness with honest device timing.

Behavioral contract from the reference's InferenceBenchmark
(utils/inference_benchmark.py:14-157: warm_up 10 iters, 100 timed iters at
batch 1 and 32, mean±std ms, images/s, compare_models loop) — but with TPU
methodology (SURVEY.md section 6 'hard parts'): compile time separated from
steady state, p50/p95 percentiles, images per second per chip, and HBM
footprint from array nbytes instead of torch.cuda.max_memory_allocated (the
reference crashed on no-CUDA hosts, utils/result_analyzer.py:113-121).

Timing is **chain-differenced**: per-call wall-clock timing is meaningless on
an asynchronously-dispatched remote device (dispatch returns before the
compute runs, and every result fetch pays a host<->device round trip that can
exceed the compute itself). Instead, K forward iterations are chained inside
ONE device program via lax.scan — with a real (numerically negligible) data
dependency between iterations so XLA cannot hoist or CSE them — and the
per-iteration time is the slope between a long chain and a 1-iteration chain,
which cancels the dispatch + fetch overhead exactly.
"""
from __future__ import annotations

import statistics
import time
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from quantnet.core.types import tree_nbytes


def make_chained_forward(apply_fn: Callable) -> Callable:
    """jitted (params, state, x, n) -> scalar, running n forwards serially.

    Each iteration feeds a ~1e-24-scaled summary of its logits back into the
    next input: numerically a no-op, but a true data dependency, so the loop
    body executes n times on device. n is a *runtime* value (lax.fori_loop), so
    one compiled program serves every chain length — compiles are the dominant
    cost on a remote-tunnel device, sometimes minutes per program.
    """

    def run(params, state, x, n):
        def body(_, c):
            y, _s = apply_fn(params, state, c, train=False)
            return c + (jnp.sum(y) * 1e-24).astype(c.dtype)

        xf = jax.lax.fori_loop(0, n, body, x)
        return xf[(0,) * xf.ndim]

    return jax.jit(run)


# One jitted chained program per apply_fn: jax.jit's signature cache then
# handles different params structures / batch shapes without rebuilding the
# Python callable (a fresh jit wrapper per call would force a full retrace).
_CHAINED_CACHE: Dict[int, Callable] = {}


def chained_forward(apply_fn: Callable) -> Callable:
    key = id(apply_fn)
    if key not in _CHAINED_CACHE:
        _CHAINED_CACHE[key] = make_chained_forward(apply_fn)
    return _CHAINED_CACHE[key]


def _fetch_time_ms(fn, *args) -> float:
    """Wall time of one dispatch + scalar fetch (forces full completion)."""
    t0 = time.perf_counter()
    float(fn(*args))
    return (time.perf_counter() - t0) * 1e3


def time_chained(
    fn: Callable,
    args: tuple,
    *,
    long_iters: int,
    short_iters: int = 1,
    windows: int = 5,
) -> Dict[str, float]:
    """Per-iteration stats from (long-chain - short-chain) / (K - k) slopes.

    The short-chain time measures dispatch + fetch + per-call constant
    overhead; differencing cancels it exactly (same program, same transfers).
    Returns mean/std/p50/p95/min in milliseconds per iteration.
    """
    n_short = jnp.int32(short_iters)
    n_long = jnp.int32(long_iters)
    # Compile + warm (excluded from timing).
    float(fn(*args, n_short))
    float(fn(*args, n_long))
    shorts = [_fetch_time_ms(fn, *args, n_short) for _ in range(windows)]
    base = min(shorts)  # best-case overhead estimate
    per_iter = []
    for _ in range(windows):
        t = _fetch_time_ms(fn, *args, n_long)
        per_iter.append(max(t - base, 0.0) / (long_iters - short_iters))
    s = sorted(per_iter)
    return {
        "mean_ms": statistics.fmean(per_iter),
        "std_ms": statistics.pstdev(per_iter),
        "p50_ms": s[len(s) // 2],
        "p95_ms": s[min(int(len(s) * 0.95), len(s) - 1)],
        "min_ms": s[0],
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
        long_iters = max(self.iters, 2)
        fn = chained_forward(apply_fn)
        stats = time_chained(
            fn,
            (params, state, x),
            long_iters=long_iters,
            windows=max(min(self.warmup, 10), 3),
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
            mem = device_memory_stats()
            if mem:
                entry["device_memory"] = mem
            results[name] = entry
        return results


def device_memory_stats() -> Dict[str, float]:
    """Live HBM usage of device 0, when the backend reports it (the
    reference's memory metric was torch.cuda.max_memory_allocated,
    utils/result_analyzer.py:146 — crashed on non-CUDA hosts; this one
    degrades to {} instead)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        return {}
    out = {}
    for key in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
        if key in stats:
            out[key.replace("bytes", "mb")] = stats[key] / (1024 * 1024)
    return out


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
