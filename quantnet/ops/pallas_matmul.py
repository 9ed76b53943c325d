"""Pallas TPU kernel: INT8 matmul with int32 accumulation.

The MXU-native core of the framework (SURVEY.md section 3.3): int8 activations x
int8 weights -> int32 accumulate, tiled over (M, N, K) with K innermost so each
output tile accumulates in VMEM scratch and is written once. The dequant
scale/bias epilogue stays in the caller (quantnet/ops/linear.py) where XLA fuses
it with neighboring elementwise ops; the kernel's job is the integer GEMM at
MXU speed with weights streamed from their packed INT8 HBM layout (4x less HBM
traffic than an f32 GEMM).

Grid iteration order is (M-tiles, N-tiles, K-tiles); Pallas double-buffers the
HBM->VMEM block DMAs automatically across grid steps.

Tile constraints (pallas_guide.md): int8 min tile (32, 128); we use
(128, 128, 256)-ish tiles clamped to the problem size and padded up to the
dtype-legal minimum.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _matmul_kernel(x_ref, w_ref, out_ref, acc_ref):
    """Grid (mi, ni, ki). Accumulate x[mi,ki] @ w[ki,ni] into VMEM scratch;
    flush to the output block on the last K step."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:],
        w_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k"))
def int8_matmul_pallas(
    x: jax.Array,
    w: jax.Array,
    *,
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 512,
) -> jax.Array:
    """int8[M, K] @ int8[K, N] -> int32[M, N].

    Shapes are padded up to legal int8 tiles (zero padding is exact in integer
    arithmetic); result is sliced back.
    """
    assert x.dtype == jnp.int8 and w.dtype == jnp.int8, (x.dtype, w.dtype)
    m, k = x.shape
    k2, n = w.shape
    assert k == k2, (x.shape, w.shape)

    # Clamp blocks to padded problem size; int8 min tile is (32, 128).
    pm = _round_up(m, 32)
    pn = _round_up(n, 128)
    pk = _round_up(k, 128)
    bm = min(block_m, pm)
    bn = min(block_n, pn)
    bk = min(block_k, pk)
    pm = _round_up(pm, bm)
    pn = _round_up(pn, bn)
    pk = _round_up(pk, bk)

    if (pm, pk) != (m, k):
        x = jnp.pad(x, ((0, pm - m), (0, pk - k)))
    if (pk, pn) != (k, n):
        w = jnp.pad(w, ((0, pk - k), (0, pn - n)))

    grid = (pm // bm, pn // bn, pk // bk)
    out = pl.pallas_call(
        _matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((pm, pn), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, ki: (i, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, ki: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * pm * pn * pk,
            bytes_accessed=pm * pk + pk * pn + 4 * pm * pn,
            transcendentals=0,
        ),
    )(x, w)
    if (pm, pn) != (m, n):
        out = out[:m, :n]
    return out


def _fused_dynamic_kernel(x_ref, w_ref, wscale_ref, bias_ref, out_ref, acc_ref):
    """Fully-fused dynamic-quant matmul tile: f32 x tile -> per-row absmax ->
    int8 -> int8 GEMM -> epilogue rescale (+bias) -> f32 out. One kernel, no
    intermediate HBM round-trips. Grid (mi, ni, ki)."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xb = x_ref[:]
    # Per-row absmax *within this K block* is wrong; dynamic fused kernel uses
    # per-tile quantization instead: each (row, K-block) gets its own scale and
    # the epilogue sums pre-scaled partial products in f32.
    amax = jnp.max(jnp.abs(xb), axis=1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xb / scale), -127, 127).astype(jnp.int8)
    part = jax.lax.dot_general(
        q, w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    acc_ref[:] += part.astype(jnp.float32) * scale

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:] * wscale_ref[:] + bias_ref[:]


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k"))
def dynamic_int8_matmul_fused(
    x: jax.Array,
    qw: jax.Array,
    w_scale: jax.Array,
    bias: jax.Array,
    *,
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 512,
) -> jax.Array:
    """f32[M,K] x int8[K,N] (+f32[N] scale, bias) -> f32[M,N].

    Dynamic activation quantization fused into the GEMM: activations are
    quantized per (row, K-block) group inside the kernel — finer-grained than
    the reference's per-tensor dynamic scales, so accuracy is strictly better,
    and the f32 activations are read from HBM exactly once.
    """
    m, k = x.shape
    k2, n = qw.shape
    assert k == k2
    w_scale = jnp.broadcast_to(jnp.asarray(w_scale, jnp.float32).reshape(1, -1), (1, n))
    bias = jnp.broadcast_to(jnp.asarray(bias, jnp.float32).reshape(1, -1), (1, n))

    pm = _round_up(m, 8)
    pn = _round_up(n, 128)
    pk = _round_up(k, 128)
    bm = min(block_m, pm)
    bn = min(block_n, pn)
    bk = min(block_k, pk)
    pm = _round_up(pm, bm)
    pn = _round_up(pn, bn)
    pk = _round_up(pk, bk)

    if (pm, pk) != (m, k):
        x = jnp.pad(x, ((0, pm - m), (0, pk - k)))
    if (pk, pn) != (k, n):
        qw = jnp.pad(qw, ((0, pk - k), (0, pn - n)))
    if pn != n:
        w_scale = jnp.pad(w_scale, ((0, 0), (0, pn - n)))
        bias = jnp.pad(bias, ((0, 0), (0, pn - n)))

    grid = (pm // bm, pn // bn, pk // bk)
    out = pl.pallas_call(
        _fused_dynamic_kernel,
        out_shape=jax.ShapeDtypeStruct((pm, pn), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, ki: (i, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, ki: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, ki: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, ki: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * pm * pn * pk,
            bytes_accessed=4 * pm * pk + pk * pn + 4 * pm * pn,
            transcendentals=0,
        ),
    )(x, qw, w_scale, bias)
    if (pm, pn) != (m, n):
        out = out[:m, :n]
    return out
