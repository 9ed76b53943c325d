"""Linear (dense) op with quantization-aware dispatch.

One entry point, four compute paths, selected at *trace time* from the layer's
param-leaf types (so jit sees a single static graph per quantized variant):

  fp32/bf16     w: jax.Array            -> x @ w + b on the MXU
  weight-only   w: QTensor, no 'aq'     -> (x @ int8_w) * scale in epilogue
  dynamic PTQ   w: QTensor, aq dynamic  -> per-batch absmax quant, int8 MXU
  static PTQ    w: QTensor, aq frozen   -> frozen-scale quant, int8 MXU,
                                           zero-point corrected via precomputed
                                           weight column sums

This replaces the Python->FBGEMM boundary of the reference (SURVEY.md section 3.3:
models/dynamic_ptq_model.py:270-279 dispatching into FBGEMM's dynamic linear)
with jit-fused XLA, and optionally a Pallas kernel (quantnet/ops/pallas_matmul.py)
for the int8 GEMM + epilogue.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from quantnet.core import config as cfg
from quantnet.core.quantize import (
    dynamic_quantize,
    maybe_requantize,
    quantize_affine,
)
from quantnet.core.types import ActQuant, DynamicActQuant, QTensor


def _apply_act(y, activation: Optional[str]):
    if activation is None:
        return y
    if activation == "relu":
        return jax.nn.relu(y)
    raise ValueError(f"unknown activation {activation!r}")


def _int8_matmul(qx: jax.Array, qw: jax.Array) -> jax.Array:
    """int8[M,K] x int8[K,N] -> accumulator [M,N] (int32, or f32 when emulated).

    Backend per cfg.resolve_matmul_backend(): native int8 hits the MXU's int8
    path; 'emulate' runs the same integer-valued math in f32 (exact while the
    running accumulator stays < 2^24; beyond that the rounding error is
    negligible vs the quantization scale) — used on CPU where XLA's s8 GEMM is
    a scalar loop.
    """
    if qw.dtype != jnp.int8:
        # s4 runtime payload (quantize/common.py::s4_runtime_tree): the
        # weight lives 4-bit in HBM; widen in-graph — XLA fuses the convert
        # into the operand read, so HBM weight traffic stays halved.
        qw = qw.astype(jnp.int8)
    backend = cfg.resolve_matmul_backend()
    if backend == "pallas":
        from quantnet.ops.pallas_matmul import int8_matmul_pallas

        return int8_matmul_pallas(qx, qw)
    if backend == "emulate":
        return jnp.dot(
            qx.astype(jnp.float32),
            qw.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
    return jax.lax.dot_general(
        qx, qw, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _int8_matmul_batched(qx: jax.Array, qw: jax.Array) -> jax.Array:
    """G-batched int8 GEMM: int8[G,M,g] x int8[G,g,N] -> [G,M,N] accumulator.

    The reduction-split form used by the grouped (W4A8) static path. Backend
    rule as _int8_matmul, except 'pallas' falls back to the native XLA batched
    dot (the Pallas GEMM kernel is unbatched; G extra kernel launches would
    cost more than they save on these shapes).
    """
    if qw.dtype != jnp.int8:
        qw = qw.astype(jnp.int8)  # s4 runtime payload — see _int8_matmul
    dn = (((2,), (1,)), ((0,), (0,)))
    if cfg.resolve_matmul_backend() == "emulate":
        return jax.lax.dot_general(
            qx.astype(jnp.float32),
            qw.astype(jnp.float32),
            dn,
            preferred_element_type=jnp.float32,
        )
    return jax.lax.dot_general(qx, qw, dn, preferred_element_type=jnp.int32)


def linear(
    layer: dict,
    x: jax.Array,
    *,
    activation: Optional[str] = None,
    out_quant: Optional[ActQuant] = None,
) -> jax.Array:
    """Apply a dense layer given its param dict {'w', optional 'b', 'aq', 'wsum'}.

    `out_quant` enables the static path's int8 tensor handoff — see
    quantnet/ops/conv.py::conv2d.
    """
    w = layer["w"]
    b = layer.get("b")
    out_dtype = jnp.float32

    probe = layer.get("probe")
    if probe is not None and not isinstance(w, QTensor):
        # Sensitivity probe — see quantnet/ops/conv.py::conv2d. Both lanes go
        # through this same dispatch; the traced gate selects, so the whole
        # per-layer sensitivity sweep compiles once.
        from quantnet.quantize.common import quantize_weight

        base = {k: v for k, v in layer.items() if k != "probe"}
        qlayer = dict(base)
        qlayer["w"] = quantize_weight(
            w, probe.per_channel, bits=probe.bits, group_size=probe.group_size
        )
        if probe.act_quant:
            qlayer["aq"] = DynamicActQuant()
        y_fp = linear(base, x, activation=activation)
        y_q = linear(qlayer, x, activation=activation)
        return maybe_requantize(
            jnp.where(probe.gate > 0.5, y_q, y_fp), out_quant
        )

    fq = layer.get("fq")
    if fq is not None and not isinstance(w, QTensor):
        # QAT training island — see quantnet/ops/conv.py::conv2d.
        from quantnet.core.quantize import fake_quant_act_ste, fake_quant_weight_ste

        # act_quant / sub-byte weight grid — see the matching fq branch in
        # quantnet/ops/conv.py::conv2d.
        xq = (
            fake_quant_act_ste(x, fq.scale, fq.zero_point)
            if fq.act_quant
            else x
        )
        wq = fake_quant_weight_ste(
            w, per_channel=fq.per_channel, bits=fq.weight_bits,
            group_size=fq.weight_group_size,
        )
        # HIGHEST precision: see the matching QAT island note in
        # quantnet/ops/conv.py::conv2d (TPU default-bf16 matmul noise
        # destabilizes the BN-folded STE finetune).
        y = jnp.dot(xq, wq, preferred_element_type=out_dtype,
                    precision=jax.lax.Precision.HIGHEST)
        if b is not None:
            y = y + b
        return maybe_requantize(_apply_act(y, activation), out_quant)

    if not isinstance(w, QTensor):
        # Compute in the narrower dtype: bf16-cast params (quantnet/quantize/
        # bf16.py) pull f32 activations down to bf16 and hit the MXU's fast
        # path; f32 params keep f32 activations unchanged. (An int8 input
        # can't reach here: handoff plans only target consumers with a
        # frozen ActQuant, which always carry QTensor weights.)
        cdtype = w.dtype if w.dtype == jnp.bfloat16 else x.dtype
        y = jnp.dot(
            x.astype(cdtype), w.astype(cdtype), preferred_element_type=out_dtype
        )
        if b is not None:
            y = y + b
        return maybe_requantize(_apply_act(y, activation), out_quant)

    aq = layer.get("aq")
    # scale broadcast shape: () per-tensor or (1, N) per-channel (axis=1)
    w_scale = w.scale

    if aq is None:
        if w.group_size is not None:
            # Group-wise scales vary along the reduction axis, so the dequant
            # can't move past the dot: dequantize into the operand read (XLA
            # fuses the reshape+mul into the matmul's weight load).
            y = jnp.dot(x, w.dequantize(x.dtype), preferred_element_type=out_dtype)
            if b is not None:
                y = y + b
            return maybe_requantize(_apply_act(y, activation), out_quant)
        # Weight-only: keep the matmul in the activation dtype; fold the
        # per-channel dequant scale into the epilogue: x @ (q*s) = (x @ q) * s.
        y = jnp.dot(
            x, w.values.astype(x.dtype), preferred_element_type=out_dtype
        ) * w_scale
        if b is not None:
            y = y + b
        return maybe_requantize(_apply_act(y, activation), out_quant)

    if w.group_size is not None and not isinstance(aq, ActQuant):
        # Group-wise weights are supported on the weight-only path (handled
        # above) and the static path (grouped int8 GEMM below, the W4A8
        # tier). A grouped weight on the dynamic path has no kernel — fail
        # at trace time rather than silently broadcasting the (K//g, 1, N)
        # scale into a wrong-shaped output.
        raise NotImplementedError(
            "group-wise quantized weights require a frozen ActQuant (static "
            "W4A8 path) or no activation quant (weight-only path); got "
            f"{type(aq).__name__}"
        )

    if isinstance(aq, DynamicActQuant):
        if cfg.resolve_matmul_backend() == "pallas":
            # Fully-fused Pallas path: absmax + quantize + int8 GEMM +
            # dequant epilogue in one kernel, f32 x read from HBM once.
            from quantnet.ops.pallas_matmul import dynamic_int8_matmul_fused

            y = dynamic_int8_matmul_fused(
                x,
                w.values,
                w_scale,
                b if b is not None else jnp.zeros((), out_dtype),
            )
            return maybe_requantize(_apply_act(y, activation), out_quant)
        # Per-batch symmetric activation quant (per-row for accuracy: axis=0).
        qx, x_scale = dynamic_quantize(x, axis=0)
        acc = _int8_matmul(qx, w.values)
        y = acc.astype(out_dtype) * (x_scale * w_scale)
        if b is not None:
            y = y + b
        y = _apply_act(y, activation)
        if aq.handoff is not None and out_quant is None:
            # Narrow inter-layer handoff (DynamicActQuant.handoff) — see
            # quantnet/ops/conv.py dynamic branch.
            y = y.astype(aq.handoff)
        return maybe_requantize(y, out_quant)

    if isinstance(aq, ActQuant):
        # Static: frozen asymmetric input quant. (qx - zp) @ qw expands to
        # qx @ qw - zp * colsum(qw); colsum precomputed at quantize time.
        qx = x if x.dtype == jnp.int8 else quantize_affine(x, aq.scale, aq.zero_point)
        if w.group_size is not None:
            # W4A8: group-wise sub-byte weights inside the int8 MXU path.
            # The dequant scale varies along the reduction axis, so the K
            # reduction splits per group: a G-batched s8 x s8 -> s32
            # dot_general (still the MXU int8 path), per-group zero-point
            # correction via the (G, N) colsums, then the group scales fold
            # into the f32 combine-over-G — which XLA fuses with the batched
            # matmul's output, so the (G, M, N) accumulator never lives in
            # HBM at full f32 width.
            g = w.group_size
            m, k = qx.shape
            n = w.values.shape[1]
            qx_g = qx.reshape(m, k // g, g).transpose(1, 0, 2)  # (G, M, g)
            qw_g = w.values.reshape(k // g, g, n)  # (G, g, N)
            acc = _int8_matmul_batched(qx_g, qw_g)  # (G, M, N)
            wsum = layer["wsum"]  # int32[G, N] per-group colsums
            acc = acc - aq.zero_point * wsum[:, None, :]
            # w.scale is (G, 1, N): broadcasts over M in the combine.
            y = jnp.sum(acc.astype(out_dtype) * w_scale, axis=0) * aq.scale
            if b is not None:
                y = y + b
            return maybe_requantize(_apply_act(y, activation), out_quant)
        acc = _int8_matmul(qx, w.values)
        wsum = layer["wsum"]  # int32[N] = sum_k qw[k, n]
        acc = acc - aq.zero_point * wsum
        y = acc.astype(out_dtype) * (aq.scale * w_scale)
        if b is not None:
            y = y + b
        return maybe_requantize(_apply_act(y, activation), out_quant)

    raise TypeError(f"unsupported activation-quant leaf {type(aq)}")
