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
import weakref
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
# Weak-keyed on the function object itself — an id()-keyed dict would alias
# two different apply_fns if the id is reused after GC.
_CHAINED_CACHE: "weakref.WeakKeyDictionary[Callable, Callable]" = (
    weakref.WeakKeyDictionary()
)


def chained_forward(apply_fn: Callable) -> Callable:
    try:
        cached = _CHAINED_CACHE.get(apply_fn)
    except TypeError:  # unhashable/unweakref-able callable: no caching
        return make_chained_forward(apply_fn)
    if cached is None:
        cached = make_chained_forward(apply_fn)
        _CHAINED_CACHE[apply_fn] = cached
    return cached


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
        # Floor at 1us/iter: under extreme host contention a long-chain
        # fetch can wall-time below the short-chain minimum, and a 0.0 here
        # poisons every derived throughput with a ZeroDivisionError.
        per_iter.append(max(t - base, 1e-3) / (long_iters - short_iters))
    s = sorted(per_iter)
    return {
        "mean_ms": statistics.fmean(per_iter),
        "std_ms": statistics.pstdev(per_iter),
        "p50_ms": s[len(s) // 2],
        "p95_ms": s[min(int(len(s) * 0.95), len(s) - 1)],
        "min_ms": s[0],
    }


# Per-chip peak compute by device kind (TOP/s). v5e: 394 int8 / 197 bf16
# (fp32 models are reported against the bf16 MXU peak — the MXU computes in
# bf16-family precision either way, so that ratio is the honest utilization
# ceiling). Unknown device kinds get no MFU fields.
_PEAK_TOPS = {
    "TPU v5 lite": {"int8": 394.0, "other": 197.0},
    "TPU v5e": {"int8": 394.0, "other": 197.0},
    "TPU v4": {"int8": 275.0, "other": 275.0},
    "TPU v6 lite": {"int8": 1836.0, "other": 918.0},
}


def _has_int8_compute(params) -> bool:
    """True when any layer carries an activation-quant marker (its matmul/conv
    runs int8 on the MXU); weight-only trees compute in the activation dtype."""
    from quantnet.core.types import ActQuant, DynamicActQuant

    found = False

    def walk(node):
        nonlocal found
        if isinstance(node, dict):
            if isinstance(node.get("aq"), (ActQuant, DynamicActQuant)):
                found = True
            for v in node.values():
                if not found:
                    walk(v)

    walk(params)
    return found


def _conv_dim_taps(out_size, k, stride, pad_lo, in_size, dilation) -> float:
    """Sum over output positions of in-bounds kernel taps along one spatial
    dim (padding taps are zero-MACs; XLA's cost analysis discounts them and
    so do we)."""
    total = 0
    for j in range(k):
        off = j * dilation - pad_lo
        # valid o: 0 <= o*stride + off < in_size and 0 <= o < out_size
        lo = max(0, (-off + stride - 1) // stride) if off < 0 else 0
        hi = min(out_size, (in_size - off + stride - 1) // stride)
        total += max(hi - lo, 0)
    return float(total)


def _flops_of_eqn(eqn) -> float:
    """MXU-relevant FLOPs of one jaxpr equation (2*MACs for conv/dot)."""
    name = eqn.primitive.name
    if name == "conv_general_dilated":
        out = eqn.outvars[0].aval
        lhs = eqn.invars[0].aval
        rhs = eqn.invars[1].aval  # kernel
        dn = eqn.params["dimension_numbers"]
        cin = rhs.shape[dn.rhs_spec[1]]
        cout = out.shape[dn.out_spec[1]]
        n = out.shape[dn.out_spec[0]]
        strides = eqn.params["window_strides"]
        pads = eqn.params["padding"]
        rhs_dil = eqn.params.get("rhs_dilation") or (1,) * len(strides)
        lhs_dil = eqn.params.get("lhs_dilation") or (1,) * len(strides)
        taps = 1.0
        for i, (od, kd, ld) in enumerate(
            zip(dn.out_spec[2:], dn.rhs_spec[2:], dn.lhs_spec[2:])
        ):
            in_size = lhs.shape[ld]
            if lhs_dil[i] != 1:  # transposed conv: effective input size
                in_size = (in_size - 1) * lhs_dil[i] + 1
            taps *= _conv_dim_taps(
                out.shape[od], rhs.shape[kd], strides[i], pads[i][0],
                in_size, rhs_dil[i],
            )
        return 2.0 * n * cout * cin * taps / eqn.params.get(
            "feature_group_count", 1
        )
    if name == "dot_general":
        lhs, rhs = (v.aval for v in eqn.invars[:2])
        (lc, _rc), (lb, _rb) = eqn.params["dimension_numbers"]
        k = 1.0
        for d in lc:
            k *= lhs.shape[d]
        batch = 1.0
        for d in lb:
            batch *= lhs.shape[d]
        m = float(np.prod(lhs.shape)) / (k * batch)  # lhs non-contract/batch
        n = float(np.prod(rhs.shape)) / (k * batch)  # rhs non-contract/batch
        return 2.0 * batch * m * n * k
    return 0.0


def _flops_of_jaxpr(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        total += _flops_of_eqn(eqn)
        for p in ("jaxpr", "call_jaxpr"):
            sub = eqn.params.get(p) if hasattr(eqn.params, "get") else None
            if sub is not None:
                total += _flops_of_jaxpr(getattr(sub, "jaxpr", sub))
    return total


def estimate_flops(apply_fn: Callable, params, state, x) -> Optional[float]:
    """MXU FLOPs of one forward at x's batch size.

    First tries XLA's HLO cost analysis on the lowered (uncompiled)
    computation; some backends (e.g. the tunnel-attached axon TPU platform)
    return None there, so the fallback traces the jaxpr and counts
    conv_general_dilated / dot_general MACs analytically — backend-free and
    cheap (no compile). Elementwise/reduction FLOPs are excluded either way
    (negligible vs the conv/matmul terms for these models, and not what MFU
    is about)."""
    fn = lambda p, s, xx: apply_fn(p, s, xx, train=False)[0]  # noqa: E731
    try:
        ca = jax.jit(fn).lower(params, state, x).cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0)) if ca else 0.0
        if flops > 0:
            return flops
    except Exception:
        pass
    try:
        jaxpr = jax.make_jaxpr(fn)(params, state, x).jaxpr
        flops = _flops_of_jaxpr(jaxpr)
        return flops if flops > 0 else None
    except Exception:
        return None


def roofline_fields(
    apply_fn: Callable, params, state, x, mean_ms: float
) -> Dict[str, float]:
    """MFU/roofline summary for one measured config: model GOPs, achieved
    TOP/s, and fraction of the chip's peak (docs/PERF.md computed these by
    hand in round 1; now every bench run emits them so perf regressions are
    visible per run)."""
    flops = estimate_flops(apply_fn, params, state, x)
    if not flops or mean_ms <= 0:
        return {}
    achieved_tops = flops / (mean_ms / 1e3) / 1e12
    out = {
        "model_gops": flops / 1e9,
        "achieved_tops": achieved_tops,
    }
    try:
        kind = jax.local_devices()[0].device_kind
    except Exception:
        return out
    for prefix, peaks in _PEAK_TOPS.items():
        if kind.startswith(prefix):
            peak = peaks["int8"] if _has_int8_compute(params) else peaks["other"]
            out["peak_tops"] = peak
            out["mfu"] = achieved_tops / peak
            break
    return out


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
        stats.update(
            roofline_fields(apply_fn, params, state, x, stats["mean_ms"])
        )
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
