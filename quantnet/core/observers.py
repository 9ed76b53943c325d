"""Calibration observers for static PTQ.

The reference's StaticPTQModel accepted a calibration_data_loader and ignored it
(reference models/static_ptq_model.py:19-34) — calibration never actually ran.
This module implements the *intended* behavior: observers accumulate activation
statistics over a calibration stream and emit frozen affine (scale, zero_point)
parameters.

Design: an observer is a tiny immutable pytree of running statistics plus pure
``update(state, batch_stats)`` / ``qparams(state)`` functions. The per-batch
statistic extraction (min/max/histogram) runs inside the jitted calibration
step on device; the O(1) running-state update composes in the same jit. Nothing
here ever syncs to host per batch.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from quantnet.core.quantize import affine_qparams


@struct.dataclass
class MinMaxObserver:
    """Running global min/max (the reference schemes' implicit default)."""

    min: jax.Array  # fp32 scalar
    max: jax.Array

    @classmethod
    def init(cls) -> "MinMaxObserver":
        return cls(min=jnp.float32(jnp.inf), max=jnp.float32(-jnp.inf))

    def update(self, x: jax.Array) -> "MinMaxObserver":
        return MinMaxObserver(
            min=jnp.minimum(self.min, jnp.min(x).astype(jnp.float32)),
            max=jnp.maximum(self.max, jnp.max(x).astype(jnp.float32)),
        )

    def qparams(self) -> Tuple[jax.Array, jax.Array]:
        return affine_qparams(self.min, self.max)

    @classmethod
    def merge_all(cls, states):
        """Cross-process merge: global min of mins, max of maxes — exactly
        what a single process observing the union of the data would hold."""
        return cls(
            min=jnp.min(jnp.stack([s.min for s in states])),
            max=jnp.max(jnp.stack([s.max for s in states])),
        )


@struct.dataclass
class MovingAvgMinMaxObserver:
    """EMA of per-batch min/max — robust to a single outlier batch."""

    min: jax.Array
    max: jax.Array
    initialized: jax.Array  # bool scalar
    momentum: float = struct.field(pytree_node=False, default=0.9)

    @classmethod
    def init(cls, momentum: float = 0.9) -> "MovingAvgMinMaxObserver":
        return cls(
            min=jnp.float32(0.0),
            max=jnp.float32(0.0),
            initialized=jnp.array(False),
            momentum=momentum,
        )

    def update(self, x: jax.Array) -> "MovingAvgMinMaxObserver":
        bmin = jnp.min(x).astype(jnp.float32)
        bmax = jnp.max(x).astype(jnp.float32)
        m = self.momentum
        new_min = jnp.where(self.initialized, m * self.min + (1 - m) * bmin, bmin)
        new_max = jnp.where(self.initialized, m * self.max + (1 - m) * bmax, bmax)
        return MovingAvgMinMaxObserver(
            min=new_min, max=new_max, initialized=jnp.array(True), momentum=m
        )

    def qparams(self) -> Tuple[jax.Array, jax.Array]:
        return affine_qparams(self.min, self.max)

    @classmethod
    def merge_all(cls, states):
        """Cross-process merge: mean of the per-process EMAs over the
        processes that saw data. The EMA itself is order-dependent, so no
        merge can reproduce the single-stream value exactly; the mean of
        per-process EMAs is the natural symmetric estimate, and every process
        folds the same gathered list so the result is bit-identical
        everywhere (the property static calibration actually requires)."""
        init = jnp.stack([s.initialized for s in states]).astype(jnp.float32)
        n = jnp.maximum(jnp.sum(init), 1.0)
        mean_min = jnp.sum(jnp.stack([s.min for s in states]) * init) / n
        mean_max = jnp.sum(jnp.stack([s.max for s in states]) * init) / n
        return cls(
            min=mean_min,
            max=mean_max,
            initialized=jnp.any(jnp.stack([s.initialized for s in states])),
            momentum=states[0].momentum,
        )


def _merge_histogram_counts(states, bins):
    """Re-bin per-process fixed-range histograms onto a common range.

    Each process froze its bucket edges on ITS first batch, so edges differ
    across processes; summing raw counts would be wrong. Build the common
    range [min lo_i, max hi_i] and scatter each process's bucket mass at its
    bucket centers into the common grid (error <= one common bucket width).
    Uninitialized states hold zero counts and are excluded from the range.
    """
    init = jnp.stack([s.initialized for s in states])
    los = jnp.stack([s.lo for s in states])
    his = jnp.stack([s.hi for s in states])
    lo = jnp.min(jnp.where(init, los, jnp.inf))
    hi = jnp.max(jnp.where(init, his, -jnp.inf))
    # all-uninitialized guard (never happens in calibrate, but stay total)
    lo = jnp.where(jnp.any(init), lo, 0.0)
    hi = jnp.where(jnp.any(init) & (hi > lo), hi, lo + 1.0)
    counts = jnp.zeros((bins,), jnp.float32)
    for s in states:
        centers = s.lo + (s.hi - s.lo) * (
            (jnp.arange(bins, dtype=jnp.float32) + 0.5) / bins
        )
        idx = jnp.clip(
            ((centers - lo) / (hi - lo) * bins).astype(jnp.int32), 0, bins - 1
        )
        counts = counts.at[idx].add(s.counts)
    return counts, lo, hi, jnp.any(init)


@struct.dataclass
class HistogramObserver:
    """Fixed-range histogram + percentile clipping.

    Accumulates counts over ``bins`` buckets spanning a running [lo, hi] absmax
    range (range frozen after the first batch to keep bucket edges static under
    jit), then picks the clip range covering ``percentile`` of the mass —
    discarding extreme outliers that would otherwise blow up the scale.
    """

    counts: jax.Array  # f32[bins]
    lo: jax.Array
    hi: jax.Array
    initialized: jax.Array
    bins: int = struct.field(pytree_node=False, default=2048)
    percentile: float = struct.field(pytree_node=False, default=0.9999)

    @classmethod
    def init(cls, bins: int = 2048, percentile: float = 0.9999):
        return cls(
            counts=jnp.zeros((bins,), jnp.float32),
            lo=jnp.float32(0.0),
            hi=jnp.float32(1.0),
            initialized=jnp.array(False),
            bins=bins,
            percentile=percentile,
        )

    def update(self, x: jax.Array) -> "HistogramObserver":
        x = x.astype(jnp.float32).reshape(-1)
        # Freeze the bucket range on first update (3x first-batch range headroom).
        bmin, bmax = jnp.min(x), jnp.max(x)
        lo = jnp.where(self.initialized, self.lo, jnp.minimum(bmin * 3.0, bmin))
        hi = jnp.where(self.initialized, self.hi, jnp.maximum(bmax * 3.0, bmax))
        hi = jnp.where(hi > lo, hi, lo + 1.0)
        idx = jnp.clip(
            ((x - lo) / (hi - lo) * self.bins).astype(jnp.int32), 0, self.bins - 1
        )
        counts = self.counts + jnp.zeros_like(self.counts).at[idx].add(1.0)
        return HistogramObserver(
            counts=counts,
            lo=lo,
            hi=hi,
            initialized=jnp.array(True),
            bins=self.bins,
            percentile=self.percentile,
        )

    def qparams(self) -> Tuple[jax.Array, jax.Array]:
        total = jnp.maximum(jnp.sum(self.counts), 1.0)
        cdf = jnp.cumsum(self.counts) / total
        edges = self.lo + (self.hi - self.lo) * (
            jnp.arange(self.bins + 1, dtype=jnp.float32) / self.bins
        )
        tail = (1.0 - self.percentile) / 2.0
        lo_idx = jnp.searchsorted(cdf, tail)
        hi_idx = jnp.searchsorted(cdf, 1.0 - tail)
        xmin = edges[jnp.clip(lo_idx, 0, self.bins)]
        xmax = edges[jnp.clip(hi_idx + 1, 0, self.bins)]
        return affine_qparams(xmin, xmax)

    @classmethod
    def merge_all(cls, states):
        counts, lo, hi, init = _merge_histogram_counts(states, states[0].bins)
        return cls(
            counts=counts, lo=lo, hi=hi, initialized=init,
            bins=states[0].bins, percentile=states[0].percentile,
        )


@struct.dataclass
class MSEObserver:
    """MSE-optimal clip range: accumulates the same fixed-range histogram as
    HistogramObserver, then grid-searches candidate clip ranges and picks the
    one minimizing expected int8 quantization MSE over the observed
    distribution (the AIMET/TensorRT-style calibration the reference never
    had). Strictly better than raw min-max under outliers, and principled
    where the percentile knob is ad hoc.
    """

    counts: jax.Array  # f32[bins]
    lo: jax.Array
    hi: jax.Array
    initialized: jax.Array
    bins: int = struct.field(pytree_node=False, default=2048)
    num_candidates: int = struct.field(pytree_node=False, default=64)

    @classmethod
    def init(cls, bins: int = 2048, num_candidates: int = 64):
        return cls(
            counts=jnp.zeros((bins,), jnp.float32),
            lo=jnp.float32(0.0),
            hi=jnp.float32(1.0),
            initialized=jnp.array(False),
            bins=bins,
            num_candidates=num_candidates,
        )

    def update(self, x: jax.Array) -> "MSEObserver":
        x = x.astype(jnp.float32).reshape(-1)
        bmin, bmax = jnp.min(x), jnp.max(x)
        lo = jnp.where(self.initialized, self.lo, jnp.minimum(bmin * 3.0, bmin))
        hi = jnp.where(self.initialized, self.hi, jnp.maximum(bmax * 3.0, bmax))
        hi = jnp.where(hi > lo, hi, lo + 1.0)
        idx = jnp.clip(
            ((x - lo) / (hi - lo) * self.bins).astype(jnp.int32), 0, self.bins - 1
        )
        counts = self.counts + jnp.zeros_like(self.counts).at[idx].add(1.0)
        return MSEObserver(
            counts=counts, lo=lo, hi=hi, initialized=jnp.array(True),
            bins=self.bins, num_candidates=self.num_candidates,
        )

    def qparams(self) -> Tuple[jax.Array, jax.Array]:
        centers = self.lo + (self.hi - self.lo) * (
            (jnp.arange(self.bins, dtype=jnp.float32) + 0.5) / self.bins
        )
        # nonzero observed range
        total = jnp.maximum(jnp.sum(self.counts), 1.0)
        cdf = jnp.cumsum(self.counts) / total
        obs_lo = centers[jnp.searchsorted(cdf, 1e-9)]
        obs_hi = centers[jnp.clip(jnp.searchsorted(cdf, 1.0 - 1e-9), 0, self.bins - 1)]

        # candidate ranges: shrink [obs_lo, obs_hi] symmetrically-in-fraction
        fracs = jnp.linspace(1.0, 1.0 / self.num_candidates, self.num_candidates)

        def mse_of(frac):
            c_lo = jnp.minimum(obs_lo * frac, 0.0)
            c_hi = jnp.maximum(obs_hi * frac, 0.0)
            scale, zp = affine_qparams(c_lo, c_hi)
            q = jnp.clip(jnp.round(centers / scale) + zp, -128, 127)
            deq = (q - zp) * scale
            return jnp.sum(self.counts * (centers - deq) ** 2)

        mses = jax.vmap(mse_of)(fracs)
        best = fracs[jnp.argmin(mses)]
        return affine_qparams(
            jnp.minimum(obs_lo * best, 0.0), jnp.maximum(obs_hi * best, 0.0)
        )

    @classmethod
    def merge_all(cls, states):
        counts, lo, hi, init = _merge_histogram_counts(states, states[0].bins)
        return cls(
            counts=counts, lo=lo, hi=hi, initialized=init,
            bins=states[0].bins, num_candidates=states[0].num_candidates,
        )


OBSERVERS = {
    "minmax": MinMaxObserver,
    "moving_average": MovingAvgMinMaxObserver,
    "histogram": HistogramObserver,
    "mse": MSEObserver,
}


def make_observer(kind: str, **kwargs):
    try:
        return OBSERVERS[kind].init(**kwargs)
    except KeyError:
        raise ValueError(f"unknown observer {kind!r}; have {sorted(OBSERVERS)}")
