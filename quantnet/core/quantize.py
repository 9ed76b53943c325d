"""Quantize / dequantize primitives.

Pure jnp functions — every one is jit-safe and shape-static. These are the
building blocks every scheme (quantnet/quantize/*) composes; the Pallas kernels
in quantnet/ops implement fused versions of the same math and are validated
against these in tests.

Numerics contract (matches the int8 affine scheme the reference relied on via
FBGEMM, SURVEY.md section 3.3):
    q = clip(round(x / scale) + zero_point, -128, 127)    (int8)
    x' = (q - zero_point) * scale
Weights use symmetric quantization (zero_point = 0) with the int8 range
restricted to [-127, 127] so that -q is always representable. Activations use
asymmetric (zero_point != 0) quantization over the observed [min, max].
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from quantnet.core.types import QTensor

INT8_MIN = -128
INT8_MAX = 127
# Symmetric weight range: avoid -128 so negation stays in range.
SYM_MAX = 127.0
EPS = 1e-8


def _reduce_axes(ndim: int, axis: Optional[int]) -> Tuple[int, ...]:
    if axis is None:
        return tuple(range(ndim))
    axis = axis % ndim
    return tuple(i for i in range(ndim) if i != axis)


def sym_max(bits: int) -> float:
    """Symmetric range limit for a signed `bits`-wide type, -min excluded so
    negation stays representable: 127 for int8, 7 for int4."""
    return float(2 ** (bits - 1) - 1)


def symmetric_scale(
    x: jax.Array, axis: Optional[int] = None, bits: int = 8
) -> jax.Array:
    """absmax / sym_max(bits) scale; per-tensor (axis=None) or per-channel
    along `axis`.

    Shape: scalar () for per-tensor; broadcastable (1,..,C,..,1) for per-channel.
    """
    red = _reduce_axes(x.ndim, axis)
    amax = jnp.max(jnp.abs(x), axis=red, keepdims=axis is not None)
    return jnp.maximum(amax, EPS).astype(jnp.float32) / sym_max(bits)


def quantize_symmetric(
    x: jax.Array, axis: Optional[int] = None, bits: int = 8
) -> QTensor:
    """Symmetric quantization (weights). Per-channel when axis is given.

    bits < 8 payloads stay int8 at runtime (values in [-sym_max, sym_max]);
    the artifact serializer packs them sub-byte on disk (QTensor docstring).
    """
    m = sym_max(bits)
    scale = symmetric_scale(x, axis, bits)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -m, m)
    return QTensor(
        values=q.astype(jnp.int8), scale=scale, zero_point=None, axis=axis, bits=bits
    )


def quantize_symmetric_grouped(
    w: jax.Array, group_size: int, bits: int = 4
) -> QTensor:
    """Group-wise symmetric weight quantization along the reduction axis.

    Standard sub-byte weight-only recipe (per-channel alone loses too much at
    4 bits on wide reductions): the (K, ...) weight is split into K/group_size
    row groups, each with its own absmax scale of shape (K//g, 1, ...).
    Requires group_size | K.
    """
    k = w.shape[0]
    if k % group_size:
        raise ValueError(f"group_size {group_size} must divide K={k}")
    m = sym_max(bits)
    g = w.astype(jnp.float32).reshape(k // group_size, group_size, *w.shape[1:])
    amax = jnp.max(jnp.abs(g), axis=1, keepdims=True)
    scale = jnp.maximum(amax, EPS) / m
    q = jnp.clip(jnp.round(g / scale), -m, m).reshape(w.shape)
    return QTensor(
        values=q.astype(jnp.int8),
        scale=scale,
        zero_point=None,
        axis=None,
        bits=bits,
        group_size=group_size,
    )


def affine_qparams(
    xmin: jax.Array, xmax: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Asymmetric (scale, zero_point) covering [min(xmin,0), max(xmax,0)].

    The range is widened to include 0 so that zero is exactly representable
    (required for zero-padding in convs to be exact).
    """
    xmin = jnp.minimum(xmin, 0.0).astype(jnp.float32)
    xmax = jnp.maximum(xmax, 0.0).astype(jnp.float32)
    scale = jnp.maximum((xmax - xmin) / (INT8_MAX - INT8_MIN), EPS)
    zero_point = jnp.clip(
        jnp.round(INT8_MIN - xmin / scale), INT8_MIN, INT8_MAX
    ).astype(jnp.int32)
    return scale, zero_point


def quantize_affine(
    x: jax.Array, scale: jax.Array, zero_point: jax.Array
) -> jax.Array:
    """Quantize with given affine params -> int8 array (params kept separately)."""
    q = jnp.round(x.astype(jnp.float32) / scale) + zero_point
    return jnp.clip(q, INT8_MIN, INT8_MAX).astype(jnp.int8)


def dynamic_quantize(
    x: jax.Array, axis: Optional[int] = None
) -> Tuple[jax.Array, jax.Array]:
    """Per-batch symmetric activation quantization: (int8 values, scale).

    The TPU-native equivalent of FBGEMM's per-call dynamic activation
    quantization (reference models/dynamic_ptq_model.py:270-279 forward path):
    absmax -> scale -> round -> clip, all fused by XLA into the consuming
    matmul/conv — no host sync, no data-dependent shapes.
    """
    scale = symmetric_scale(x, axis)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -SYM_MAX, SYM_MAX)
    return q.astype(jnp.int8), scale


def dequantize(q: jax.Array, scale: jax.Array, zero_point=None, dtype=jnp.float32):
    v = q.astype(dtype)
    if zero_point is not None:
        v = v - jnp.asarray(zero_point, dtype)
    return v * jnp.asarray(scale, dtype)


def fake_quantize_symmetric(x: jax.Array, axis: Optional[int] = None) -> jax.Array:
    """INT8-emulated-in-fp32: quantize+dequantize round trip, staying fp32.

    The backend-independent correctness oracle (SURVEY.md section 7 build step 3):
    a real int8 kernel fed the same inputs must produce bitwise-comparable
    results to an fp32 matmul over fake-quantized operands (up to fp32
    accumulation order).
    """
    qt = quantize_symmetric(x, axis)
    return qt.dequantize()


def fake_quantize_affine(x, scale, zero_point):
    q = quantize_affine(x, scale, zero_point)
    return dequantize(q, scale, zero_point)


def fake_quant_act_ste(x: jax.Array, scale, zero_point) -> jax.Array:
    """Clipped-STE affine fake quantization (QAT activation path).

    Forward = quantize->dequantize with the frozen (scale, zero_point);
    backward = identity inside the representable range
    [(INT8_MIN - zp) * s, (INT8_MAX - zp) * s], zero outside (the standard
    clipped straight-through estimator: gradients don't flow through values
    the deployed int8 graph would clip away).
    """
    scale = jnp.float32(scale)
    zp = jnp.float32(zero_point)
    lo = (INT8_MIN - zp) * scale
    hi = (INT8_MAX - zp) * scale
    fq = fake_quantize_affine(x, scale, zero_point)
    xc = jnp.clip(x, lo, hi)
    return xc + jax.lax.stop_gradient(fq - xc)


def fake_quant_weight_ste(
    w: jax.Array,
    per_channel: bool = True,
    bits: int = 8,
    group_size: Optional[int] = None,
) -> jax.Array:
    """STE symmetric fake quantization (QAT weight path).

    The scale tracks the live weight's absmax each step (per-output-channel
    when per_channel), so no value ever falls outside the range and the plain
    STE (identity gradient) is exact.

    bits / group_size select the sub-byte grid for sub-byte QAT; the
    grouped-vs-per-channel fallback mirrors quantnet/quantize/common.py::
    quantize_weight exactly (grouped only for per-channel 2-D weights with a
    dividing K), so qat.bake() deploys the same grid training simulated.
    """
    if (
        per_channel
        and group_size is not None
        and w.ndim == 2
        and w.shape[0] % group_size == 0
    ):
        fq = quantize_symmetric_grouped(w, group_size, bits=bits).dequantize()
    else:
        axis = (w.ndim - 1) if per_channel else None
        fq = quantize_symmetric(w, axis, bits=bits).dequantize()
    return w + jax.lax.stop_gradient(fq - w)


def maybe_requantize(y: jax.Array, out_quant) -> jax.Array:
    """int8 tensor-handoff epilogue: requantize `y` into the consumer's
    frozen affine domain when `out_quant` (an ActQuant) is given, else pass
    through. Shared by every conv/linear epilogue branch."""
    if out_quant is None:
        return y
    return quantize_affine(y, out_quant.scale, out_quant.zero_point)
