"""Pallas TPU kernel: fused ResNet block-boundary residual epilogue.

Targets docs/PERF.md headroom #3: at every ResNet block boundary the chained
static-INT8 path computes

    y = relu(conv3_out_f32 + dequant(identity_int8))   # residual add
    q = clip(round(y / s_out) + zp_out, -128, 127)      # next conv1's domain

XLA fuses this chain into the producing conv's epilogue, but profiling showed
the boundary fusions running at ~300 GB/s (vs 819 peak) because the chained
int8 producers pick batch-minor layouts while the consuming convs want
C-minor, inserting transpose copies (132 us each at bs128). A Pallas kernel
at the boundary pins both of its operands and its output to the default
(C-minor) layout — the hypothesis is that forcing the layout at the boundary
removes the transpose copies on the int8 path.

This is an *experiment shipped as an opt-in backend* (`QUANTNET_BOUNDARY=
pallas`); the measured verdict lives in docs/PERF.md. The kernel itself is a
pure VPU elementwise pass tiled over the flattened (N*H*W, C) view; numerics
match the unfused path bit-exactly (same f32 ops in the same order; oracle
test in tests/test_pallas_kernels.py).

Reference semantics being fused: residual add in the dequantized domain
(/root/reference/models/custom_quantization_model.py:95-100) followed by the
next layer's input quantization.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _boundary_kernel_i8(sc_ref, out_ref, id_ref, o_ref):
    """sc = [id_scale, id_zp, out_scale, out_zp] (SMEM f32).

    Division (not reciprocal-multiply) so the result is bit-exact vs the
    unfused quantize_affine path."""
    ident = (id_ref[:].astype(jnp.float32) - sc_ref[1]) * sc_ref[0]
    y = jnp.maximum(out_ref[:] + ident, 0.0)
    q = jnp.round(y / sc_ref[2]) + sc_ref[3]
    o_ref[:] = jnp.clip(q, -128.0, 127.0).astype(jnp.int8)


def _boundary_kernel_f32(sc_ref, out_ref, id_ref, o_ref):
    """f32 identity variant: sc = [out_scale, out_zp]."""
    y = jnp.maximum(out_ref[:] + id_ref[:], 0.0)
    q = jnp.round(y / sc_ref[0]) + sc_ref[1]
    o_ref[:] = jnp.clip(q, -128.0, 127.0).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("block_m",))
def _boundary_call(scalars, out2, id2, *, block_m):
    m, c = out2.shape
    int8_id = id2.dtype == jnp.int8
    kernel = _boundary_kernel_i8 if int8_id else _boundary_kernel_f32
    grid = (pl.cdiv(m, block_m),)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, c), jnp.int8),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * c,
            bytes_accessed=4 * m * c + (1 if int8_id else 4) * m * c + m * c,
            transcendentals=0,
        ),
    )(scalars, out2, id2)


def residual_boundary(
    out: jax.Array,
    identity: jax.Array,
    id_scale,
    id_zero_point,
    out_quant,
) -> jax.Array:
    """Fused relu(out + dequant(identity)) -> int8 in `out_quant`'s domain.

    out: f32[N,H,W,C] — the block's last-conv output (bias applied, no relu).
    identity: int8[N,H,W,C] (with id_scale/id_zero_point) or f32[N,H,W,C]
        (id_scale/id_zero_point ignored).
    out_quant: ActQuant of the next block's conv1 (frozen scale/zero_point).
    """
    n, h, w, c = out.shape
    m = n * h * w
    out2 = out.reshape(m, c)
    id2 = identity.reshape(m, c)

    s = jnp.asarray(out_quant.scale, jnp.float32)
    zp = jnp.asarray(out_quant.zero_point, jnp.float32)
    if identity.dtype == jnp.int8:
        scalars = jnp.stack(
            [
                jnp.asarray(id_scale, jnp.float32).reshape(()),
                jnp.asarray(id_zero_point, jnp.float32).reshape(()),
                s.reshape(()),
                zp.reshape(()),
            ]
        )
    else:
        scalars = jnp.stack([s.reshape(()), zp.reshape(())])

    # Tile rows; cap the f32 operand tile at ~2 MB so double buffering fits
    # VMEM at every stage width (C up to 2048).
    block_m = max(8, min(_round_up(m, 8), (2 * 1024 * 1024 // 4) // max(c, 1)))
    block_m = max(8, (block_m // 8) * 8)
    res = _boundary_call(scalars, out2, id2, block_m=block_m)
    return res.reshape(n, h, w, c)
