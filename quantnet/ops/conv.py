"""2-D convolution with quantization-aware dispatch (NHWC / HWIO — TPU layouts).

Same four paths as quantnet/ops/linear.py. The reference's dynamic scheme
requested INT8 conv but silently ran FP32 (PyTorch has no dynamic conv kernel —
SURVEY.md behavior note 1, models/dynamic_ptq_model.py:302-306); here the intent
is honored: convs really run int8 x int8 -> int32 on the MXU, either directly
through XLA's int8 conv or via im2col + int8 GEMM (which also feeds the Pallas
matmul kernel).

Zero-point handling for the static path: activations quantize affinely, so the
fp32 zero maps to zero_point, not 0. Padding must therefore inject zero_point in
the int8 domain — done with an explicit pad before a VALID conv — and the cross
term zp * sum_{kh,kw,ci} qw is folded in via per-output-channel weight sums
precomputed at quantize time.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from quantnet.core import config as cfg
from quantnet.core.quantize import (
    dynamic_quantize,
    maybe_requantize,
    quantize_affine,
)
from quantnet.core.types import ActQuant, DynamicActQuant, QTensor

DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _apply_act(y, activation: Optional[str]):
    if activation is None:
        return y
    if activation == "relu":
        return jax.nn.relu(y)
    if activation == "relu6":
        # MobileNet-family clipped ReLU. Monotone, so the int8 tensor-handoff
        # argument (out_quant commutes with monotone ops) holds unchanged.
        return jnp.clip(y, 0.0, 6.0)
    raise ValueError(f"unknown activation {activation!r}")


def _conv(x, w, stride, padding, out_dtype, precision=None, groups=1):
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=DIMNUMS,
        feature_group_count=groups,
        preferred_element_type=out_dtype,
        precision=precision,
    )


def _same_pads(
    h: int, w: int, kh: int, kw: int, stride: int
) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """XLA SAME padding, stride-aware (explicit so the int8 path can pre-pad
    with the zero point and still match lax.conv's SAME semantics exactly)."""

    def one(size, k):
        out = -(-size // stride)
        total = max((out - 1) * stride + k - size, 0)
        return total // 2, total - total // 2

    return one(h, kh), one(w, kw)


def _pad_nhwc(x, pads, value):
    (pt, pb), (pl, pr) = pads
    return jnp.pad(
        x,
        ((0, 0), (pt, pb), (pl, pr), (0, 0)),
        mode="constant",
        constant_values=value,
    )


def _im2col(x: jax.Array, kh: int, kw: int, stride: int) -> jax.Array:
    """Extract patches: int8[N,H,W,C] -> int8[N,Ho,Wo,kh*kw*C].

    Pure strided slicing — dtype-agnostic data movement, so the following GEMM
    carries all the FLOPs on the MXU in int8. Patch channel order is (kh, kw, C),
    matching an HWIO weight reshaped to (kh*kw*C, O).
    """
    n, h, w, c = x.shape
    ho = (h - kh) // stride + 1
    wo = (w - kw) // stride + 1
    cols = []
    for i in range(kh):
        for j in range(kw):
            sl = jax.lax.slice(
                x,
                (0, i, j, 0),
                (n, i + (ho - 1) * stride + 1, j + (wo - 1) * stride + 1, c),
                (1, stride, stride, 1),
            )
            cols.append(sl)
    return jnp.concatenate(cols, axis=-1)


def _int8_conv(qx, qw, stride, pads, pad_value, groups=1) -> jax.Array:
    """int8 NHWC conv -> accumulator (int32, or f32 when emulated), with
    explicit padding by `pad_value` (the zero point in the int8 domain)."""
    if qw.dtype != jnp.int8:
        # s4 runtime payload — widen in-graph, HBM read stays 4-bit (see
        # quantnet/ops/linear.py::_int8_matmul)
        qw = qw.astype(jnp.int8)
    qx = _pad_nhwc(qx, pads, pad_value)
    backend = cfg.resolve_conv_backend()
    if backend == "emulate":
        # Integer-valued f32 conv: exact while accumulators stay < 2^24,
        # negligible rounding vs the quant scale beyond that; ~100x faster
        # than s8 conv on XLA:CPU.
        return _conv(
            qx.astype(jnp.float32), qw.astype(jnp.float32), stride, "VALID",
            jnp.float32, groups=groups,
        )
    if backend == "xla" or groups > 1:
        # Grouped/depthwise convs always take XLA's native path: im2col
        # would need a block-diagonal GEMM (G separate matmuls) — pure
        # data-movement overhead with zero MXU benefit for a conv whose
        # reduction is kh*kw per group.
        return _conv(qx, qw, stride, "VALID", jnp.int32, groups=groups)
    # im2col: lower to the selected int8 matmul backend (incl. Pallas).
    kh, kw, ci, co = qw.shape
    patches = _im2col(qx, kh, kw, stride)
    n, ho, wo, pc = patches.shape
    from quantnet.ops.linear import _int8_matmul

    acc = _int8_matmul(patches.reshape(n * ho * wo, pc), qw.reshape(pc, co))
    return acc.reshape(n, ho, wo, co)


def conv2d(
    layer: dict,
    x: jax.Array,
    *,
    stride: int = 1,
    padding: str = "SAME",
    activation: Optional[str] = None,
    out_quant: Optional[ActQuant] = None,
    groups: int = 1,
) -> jax.Array:
    """Apply a conv layer given its param dict {'w', optional 'b', 'aq', 'wsum'}.

    w layout HWIO; per-channel quantization axis is 3 (output channels), scale
    broadcast shape (1, 1, 1, O). `groups` is lax feature_group_count
    (depthwise = groups == input channels, HWIO kernel (kh, kw, 1, C)); it is
    static call-site metadata passed by the model's apply(), never stored in
    the params tree (an int leaf would become a traced array under jit). All
    quantization math is group-agnostic: weight scales/wsum are per OUTPUT
    channel, and each output channel's reduction stays inside its own group.

    INT8 tensor handoff (static path): with `out_quant` (the *consumer's*
    frozen ActQuant), the epilogue requantizes the activated output and
    returns int8 — the inter-layer tensor is written to HBM at 1 byte/elem
    instead of 4, and the consumer (receiving int8 input) skips its input
    quantization. Exactly the same numbers as quantizing at the consumer:
    the f32 epilogue value is identical, and monotone ops in between
    (relu/maxpool) commute with the monotone quantizer.
    """
    w = layer["w"]
    b = layer.get("b")
    out_dtype = jnp.float32

    probe = layer.get("probe")
    if probe is not None and not isinstance(w, QTensor):
        # Sensitivity probe (quantnet/quantize/policy.py): run BOTH the plain
        # path and the dynamic-int8 path — each via this very dispatch, so
        # the quantized lane is bitwise the real scheme's math — and select
        # by the traced gate. Keeps the probed-layer choice out of the trace:
        # the whole per-layer sweep is one compiled program.
        from quantnet.quantize.common import quantize_weight

        base = {k: v for k, v in layer.items() if k != "probe"}
        qlayer = dict(base)
        qlayer["w"] = quantize_weight(
            w, probe.per_channel, bits=probe.bits, group_size=probe.group_size
        )
        if probe.act_quant:
            qlayer["aq"] = DynamicActQuant()
        kwargs = dict(
            stride=stride, padding=padding, activation=activation, groups=groups
        )
        y_fp = conv2d(base, x, **kwargs)
        y_q = conv2d(qlayer, x, **kwargs)
        return maybe_requantize(
            jnp.where(probe.gate > 0.5, y_q, y_fp), out_quant
        )

    fq = layer.get("fq")
    if fq is not None and not isinstance(w, QTensor):
        # QAT training island (quantnet/quantize/qat.py): fake-quantized
        # activations (frozen affine ranges, clipped STE) and weights (live
        # per-channel symmetric, STE) through an f32 conv — the differentiable
        # simulation of the deployed static-INT8 graph.
        from quantnet.core.quantize import fake_quant_act_ste, fake_quant_weight_ste

        # act_quant=False trains a weight-only island (fp32 activations —
        # the weight_only tier's deployed graph); sub-byte weight grids via
        # fq.weight_bits / weight_group_size (round-5 sub-byte QAT).
        xq = (
            fake_quant_act_ste(x, fq.scale, fq.zero_point)
            if fq.act_quant
            else x
        )
        wq = fake_quant_weight_ste(
            w, per_channel=fq.per_channel, bits=fq.weight_bits,
            group_size=fq.weight_group_size,
        )
        # HIGHEST precision: the deployed int8 graph this simulates is exact
        # integer math; TPU default-bf16 conv noise inside the STE graph
        # destabilizes the (normalization-free, BN-folded) finetune — the
        # identical finetune converges on CPU f32 and collapsed on-chip
        # (docs/PERF.md round 3, QAT stabilization).
        y = _conv(xq, wq, stride, padding, out_dtype,
                  precision=jax.lax.Precision.HIGHEST, groups=groups)
        if b is not None:
            y = y + b
        return maybe_requantize(_apply_act(y, activation), out_quant)

    if not isinstance(w, QTensor):
        # Narrow-dtype rule (see quantnet/ops/linear.py): bf16 params pull
        # activations down to bf16; f32 params leave them unchanged. (An
        # int8 input can't reach here: the handoff plans only requantize
        # into consumers with a frozen ActQuant, which always have QTensor
        # weights.)
        cdtype = w.dtype if w.dtype == jnp.bfloat16 else x.dtype
        y = _conv(
            x.astype(cdtype), w.astype(cdtype), stride, padding, out_dtype,
            groups=groups,
        )
        if b is not None:
            y = y + b
        return maybe_requantize(_apply_act(y, activation), out_quant)

    if w.group_size is not None:
        # Group-wise scales along the reduction have no conv kernel (the
        # conv can't split its reduction per group without G separate
        # convs); quantize_weight never groups 4-D kernels — convs take the
        # per-channel sub-byte fallback — so fail loudly on hand-built trees.
        raise NotImplementedError(
            "group-wise quantized conv weights are unsupported; use "
            "per-channel (quantize_weight groups 2-D weights only)"
        )

    kh, kw = w.values.shape[0], w.values.shape[1]
    if padding == "SAME":
        pads = _same_pads(x.shape[1], x.shape[2], kh, kw, stride)
    elif padding == "VALID":
        pads = ((0, 0), (0, 0))
    else:
        pads = tuple(padding)

    aq = layer.get("aq")
    w_scale = w.scale  # (1,1,1,O) per-channel or () per-tensor

    if aq is None:
        # Weight-only: conv in activation dtype, per-channel scale in epilogue.
        wf = w.values.astype(x.dtype)
        if groups > 1:
            # Measured miscompile (2026-08-21, v5e/axon stack): a GROUPED conv
            # whose weight operand is an in-graph s8->f32 convert of a program
            # input compiles to NaN output under jit (eager per-op is fine;
            # dense convs are fine; constant-folded weights are fine). The
            # barrier materializes the converted weights so the convert cannot
            # fuse into the conv's operand — bit-exact vs the eager result,
            # O(weight bytes) cost. Repro + adjudication: docs/PERF.md round 5.
            wf = jax.lax.optimization_barrier(wf)
        y = _conv(
            _pad_nhwc(x, pads, 0.0),
            wf,
            stride,
            "VALID",
            out_dtype,
            groups=groups,
        ) * w_scale
        if b is not None:
            y = y + b
        return maybe_requantize(_apply_act(y, activation), out_quant)

    if isinstance(aq, DynamicActQuant):
        # Symmetric per-batch quant -> fp32 zero == int8 zero, pad with 0.
        qx, x_scale = dynamic_quantize(x, axis=None)
        acc = _int8_conv(qx, w.values, stride, pads, jnp.int8(0), groups=groups)
        y = acc.astype(out_dtype) * (x_scale * w_scale)
        if b is not None:
            y = y + b
        y = _apply_act(y, activation)
        if aq.handoff is not None and out_quant is None:
            # Narrow inter-layer handoff (see DynamicActQuant.handoff): the
            # consumer re-quantizes per batch anyway, so writing bf16 costs
            # ~one ulp of the *quantization* scale and halves HBM traffic.
            y = y.astype(aq.handoff)
        return maybe_requantize(y, out_quant)

    if isinstance(aq, ActQuant):
        # int8 input = already in this layer's aq domain (producer chained)
        qx = x if x.dtype == jnp.int8 else quantize_affine(x, aq.scale, aq.zero_point)
        pad_value = aq.zero_point.astype(jnp.int8)
        acc = _int8_conv(qx, w.values, stride, pads, pad_value, groups=groups)
        wsum = layer["wsum"]  # int32[O] = sum_{kh,kw,ci} qw
        acc = acc - aq.zero_point * wsum
        y = acc.astype(out_dtype) * (aq.scale * w_scale)
        if b is not None:
            y = y + b
        return maybe_requantize(_apply_act(y, activation), out_quant)

    raise TypeError(f"unsupported activation-quant leaf {type(aq)}")
