"""ResNet-50 in functional JAX — the ImageNet track of the reference.

Capability parity with the reference's ResNet-50 quantization family
(/root/reference/models/dynamic_ptq_model.py:92-139 CustomDynamicQuantizedResNet50,
custom_quantization_model.py:104-143 CustomQuantizedResNet50): bottleneck blocks
with per-layer quant islands, residual adds in the fp32 accumulate domain
(reference keeps adds in FloatFunctional / dequantized fp32 —
dynamic_ptq_model.py:88, custom_quantization_model.py:95-100), and the
`conv1_scale` input-scale knob on the stem conv
(dynamic_ptq_model.py:13-32, 157-164).

Architecture: standard ResNet-50 (stem 7x7/2 + maxpool 3x3/2; stages of
[1x1, 3x3, 1x1] bottlenecks x [3,4,6,3]; global avgpool; fc). NHWC/HWIO.
Params are a nested dict pytree, so the same quantization transforms in
quantnet/quantize apply unchanged — layer paths look like
'layer3/2/conv2'. Downsample convs are wrapped like any other layer
(reference wraps them too, custom_quantization_model.py:73-77).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from quantnet.core.quantize import dequantize, quantize_affine
from quantnet.ops.conv import conv2d
from quantnet.ops.layers import avgpool_global, batchnorm_apply, batchnorm_init
from quantnet.ops.linear import linear

STAGES = (3, 4, 6, 3)
STAGE_WIDTHS = (64, 128, 256, 512)
EXPANSION = 4

# Family table (torchvision depths): block kind + per-stage block counts.
# The reference uses only resnet50; the other depths are the same two block
# kinds re-counted, and every quantization transform applies unchanged.
VARIANTS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


def _kaiming(rng, shape, fan_in):
    return jax.random.normal(rng, shape, jnp.float32) * jnp.sqrt(2.0 / fan_in)


def _conv_init(rng, kh, kw, cin, cout):
    return {"w": _kaiming(rng, (kh, kw, cin, cout), kh * kw * cin)}


def _with_bn(layer, cout, state_slot):
    bn_p, bn_s = batchnorm_init(cout)
    layer["bn"] = bn_p
    state_slot.update(bn_s)
    return layer


def init(
    rng: jax.Array,
    num_classes: int = 1000,
    depth: int = 50,
    *,
    zero_init_residual: bool = False,
) -> Tuple[dict, dict]:
    """Initialize any torchvision-family depth (18/34/50/101/152).

    Basic blocks (18/34): [3x3, 3x3], expansion 1; bottlenecks (50/101/152):
    [1x1, 3x3, 1x1], expansion 4. Downsample convs appear exactly where
    torchvision puts them (first block of a stage when the stride or the
    channel count changes). The reference uses only resnet50; the other
    depths are the same two block kinds re-counted, and every quantization
    transform applies to them unchanged.

    zero_init_residual zeroes the last BN gamma of every block (torchvision's
    option of the same name): each residual branch starts as identity, which
    substantially speeds up early training of the deep variants from
    scratch."""
    kind, stages = VARIANTS[depth]
    expansion = EXPANSION if kind == "bottleneck" else 1
    params: dict = {}
    state: dict = {}
    n_keys = 2 + sum(stages) * 4 + len(stages)
    keys = iter(jax.random.split(rng, n_keys + 4))

    state["conv1"] = {}
    params["conv1"] = _with_bn(_conv_init(next(keys), 7, 7, 3, 64), 64, state["conv1"])

    cin = 64
    for si, (blocks, width) in enumerate(zip(stages, STAGE_WIDTHS)):
        stage_name = f"layer{si + 1}"
        params[stage_name] = {}
        state[stage_name] = {}
        for bi in range(blocks):
            bp: dict = {}
            bs: dict = {}
            stride = 2 if (bi == 0 and si > 0) else 1
            cout = width * expansion
            if kind == "bottleneck":
                bs["conv1"], bs["conv2"], bs["conv3"] = {}, {}, {}
                bp["conv1"] = _with_bn(_conv_init(next(keys), 1, 1, cin, width), width, bs["conv1"])
                bp["conv2"] = _with_bn(_conv_init(next(keys), 3, 3, width, width), width, bs["conv2"])
                bp["conv3"] = _with_bn(_conv_init(next(keys), 1, 1, width, cout), cout, bs["conv3"])
            else:
                bs["conv1"], bs["conv2"] = {}, {}
                bp["conv1"] = _with_bn(_conv_init(next(keys), 3, 3, cin, width), width, bs["conv1"])
                bp["conv2"] = _with_bn(_conv_init(next(keys), 3, 3, width, cout), cout, bs["conv2"])
            if zero_init_residual:
                last = "conv3" if kind == "bottleneck" else "conv2"
                bp[last]["bn"]["gamma"] = jnp.zeros_like(bp[last]["bn"]["gamma"])
            if bi == 0 and (stride != 1 or cin != cout):
                bs["downsample"] = {}
                bp["downsample"] = _with_bn(
                    _conv_init(next(keys), 1, 1, cin, cout), cout, bs["downsample"]
                )
            params[stage_name][str(bi)] = bp
            state[stage_name][str(bi)] = bs
            cin = cout

    params["fc"] = {
        "w": _kaiming(next(keys), (cin, num_classes), cin),
        "b": jnp.zeros((num_classes,), jnp.float32),
    }
    return params, state


def _conv_bn(params, state, new_state, x, *, stride, padding, train, relu, capture, path,
             out_quant=None):
    layer = params
    if "bn" in layer:
        y = conv2d(layer, x, stride=stride, padding=padding)
        y, ns = batchnorm_apply(layer["bn"], state, y, train=train)
        if train:
            new_state.update(ns)
        return jax.nn.relu(y) if relu else y
    if capture is not None:
        capture[path] = x
        sp = capture.get("__specs__")
        if sp is not None:
            # Static op metadata (plain python, never traced): lets layer-
            # local consumers (quantnet/quantize/adaround.py) re-apply this
            # exact op outside the model. Only recorded when the caller
            # pre-seeds capture with "__specs__" — calibration's eval_shape
            # probe returns the capture dict and must stay array-only.
            sp[path] = ("conv", stride, padding, "relu" if relu else None)
    return conv2d(
        layer, x, stride=stride, padding=padding,
        activation="relu" if relu else None, out_quant=out_quant,
    )


def _chain_aq(producer: dict, consumer: dict):
    """Consumer's ActQuant when the static int8 tensor handoff applies.

    Requires a statically-quantized consumer (frozen ActQuant to requantize
    into) and a post-fold producer (no live BN after the epilogue); the
    producer's own compute precision doesn't matter — every quantnet/ops
    epilogue honors out_quant, so fp32-policy islands (e.g. a
    skip_first_layer stem) hand off int8 too."""
    from quantnet.core.types import ActQuant

    if "bn" not in producer and isinstance(consumer.get("aq"), ActQuant):
        return consumer["aq"]
    return None


def _stage_sizes(params: dict) -> Tuple[int, ...]:
    """Per-stage block counts, read off the params tree (so apply serves
    every VARIANTS depth from the same function)."""
    return tuple(len(params[f"layer{i + 1}"]) for i in range(4))


def _next_conv1(params: dict, si: int, bi: int):
    """The conv1 layer dict of the block that consumes this block's output,
    or None after the last block (avgpool/fc consume f32)."""
    stages = _stage_sizes(params)
    stage = f"layer{si + 1}"
    if bi + 1 < stages[si]:
        return params[stage][str(bi + 1)]["conv1"]
    if si + 1 < len(stages):
        return params[f"layer{si + 2}"]["0"]["conv1"]
    return None


def fold_stem_s2d(params: dict) -> dict:
    """Rewrite the 7x7/stride-2 stem as a 4x4/stride-1 conv over a
    space-to-depth input (the MLPerf ResNet trick; docs/PERF.md headroom #1).

    Exactly equivalent math: output pixel o of the stride-2 conv taps padded
    input rows 2o+j (after the kernel is front-aligned to an even pad); in
    2x2-block coordinates that's blocks o..o+3 with phase j%2, so the 7x7x3
    kernel (zero-padded to 8x8) regroups into 4x4x12. The C=3 stem underfills
    the MXU (k*cin=147); at 12 input channels the same FLOPs run with
    k*cin=192 and a stride-1 access pattern. apply() detects the folded stem
    by shape and space-to-depths the NHWC input on device (or accepts
    pre-transformed input from the host pipeline, see stem_s2d_input).

    Run BEFORE quantization transforms (operates on the fp32 weight; BN and
    every quantize transform apply unchanged afterwards)."""
    conv1 = dict(params["conv1"])
    w = conv1["w"]
    kh, kw, cin, cout = w.shape
    if (kh, kw) != (7, 7):
        raise ValueError(f"stem fold expects a 7x7 stem, got {w.shape}")
    # Front-pad by f so the kernel aligns with an even leading SAME pad
    # (pt=3 for odd input sizes handled by f=1; pt is folded into
    # stem_s2d_input's explicit padding).
    wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))  # 8x8
    wp = wp.reshape(4, 2, 4, 2, cin, cout)
    wp = wp.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * cin, cout)
    conv1["w"] = wp
    out = dict(params)
    out["conv1"] = conv1
    return out


def stem_s2d_input(x: jax.Array) -> jax.Array:
    """NHWC image batch -> space-to-depth form for a folded stem
    (fold_stem_s2d): explicit SAME-equivalent zero pad, then 2x2 blocks to
    channels. Callable on device (jit-fused) or on host (numpy in, numpy-like
    out) so the input pipeline can pre-transform and skip the device-side
    relayout."""
    n, h, w, c = x.shape
    out_h, out_w = -(-h // 2), -(-w // 2)

    def pads(size, out_size):
        # same leading pad as lax.conv SAME (k=7, s=2); trailing pad extends
        # to cover the zero 8th kernel tap and make the padded size even
        # (need = 2*out+6, always even).
        total = max((out_size - 1) * 2 + 7 - size, 0)
        pt = total // 2
        need = 2 * (out_size - 1) + 8
        pb = max(need - size - pt, 0)
        return pt, pb

    pt, pb = pads(h, out_h)
    pl, pr = pads(w, out_w)
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    hh, ww = xp.shape[1] // 2, xp.shape[2] // 2
    xp = xp.reshape(n, hh, 2, ww, 2, c)
    xp = xp.transpose(0, 1, 3, 2, 4, 5)
    return xp.reshape(n, hh, ww, 4 * c)


def _stem_is_s2d(conv1: dict) -> bool:
    # Folded stems are 4x4 (fold_stem_s2d); every stock stem here is 7x7.
    return conv1["w"].shape[0] == 4


def _maxpool_3x3_s2(x):
    # torch MaxPool2d(3, stride=2, padding=1) semantics; dtype-aware identity
    # element so the int8 handoff path pools in the int8 domain
    if jnp.issubdtype(x.dtype, jnp.floating):
        lo = -jnp.inf  # literal: keeps reduce_window differentiable
    else:
        lo = jnp.asarray(jnp.iinfo(x.dtype).min, x.dtype)  # int8 handoff path
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=lo)
    return jax.lax.reduce_window(
        x, lo, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def apply(
    params: dict,
    state: dict,
    x: jax.Array,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    capture: Optional[dict] = None,
    conv1_scale: float = 1.0,
    torch_pad: bool = False,
) -> Tuple[jax.Array, dict]:
    """Forward. conv1_scale multiplies the stem input — the reference's
    custom_scale knob (dynamic_ptq_model.py:25-27).

    torch_pad selects torch's SYMMETRIC conv padding at the stride-2 sites
    (stem (3,3); 3x3 block convs (1,1)). XLA's "SAME" at stride 2 pads
    asymmetrically ((2,3) / (0,1) on even inputs) and samples DIFFERENT
    input positions than torch's pad=1/pad=3 — the two forwards diverge
    completely, not by an edge effect. Trees imported from reference
    checkpoints (quantnet/models/torch_import.py, reference
    models/baseline_model.py / torchvision resnet50) must run with
    torch_pad=True for numeric parity; natively-trained trees keep the
    XLA-idiomatic default. Stride-1 3x3 SAME equals (1,1) so only stride-2
    sites switch."""
    pad3 = ((1, 1), (1, 1)) if torch_pad else "SAME"
    pad_stem = ((3, 3), (3, 3)) if torch_pad else "SAME"
    new_state = jax.tree_util.tree_map(lambda v: v, state) if train else state

    if conv1_scale != 1.0:
        x = x * conv1_scale
    ns1 = new_state.get("conv1", {}) if train else {}
    stem = params["conv1"]
    stem_s2d = _stem_is_s2d(stem)
    if stem_s2d and stem["w"].shape[2] == 4 * x.shape[-1]:
        # Folded stem fed raw NHWC: space-to-depth on device. A host
        # pipeline may instead feed pre-transformed input (channels already
        # match), skipping this relayout entirely.
        x = stem_s2d_input(x)
    # stem -> maxpool -> layer1/0/conv1 is a monotone chain: int8 handoff ok
    x = _conv_bn(
        stem, state.get("conv1", {}), ns1, x,
        stride=1 if stem_s2d else 2,
        padding="VALID" if stem_s2d else pad_stem,
        train=train, relu=True, capture=capture, path="conv1",
        out_quant=_chain_aq(stem, params["layer1"]["0"]["conv1"]),
    )
    if train:
        new_state["conv1"] = ns1
    x = _maxpool_3x3_s2(x)

    stages = _stage_sizes(params)
    for si in range(len(stages)):
        stage = f"layer{si + 1}"
        for bi in range(stages[si]):
            b = str(bi)
            bp = params[stage][b]
            bs = state.get(stage, {}).get(b, {})
            nbs = new_state.get(stage, {}).get(b, {}) if train else {}
            stride = 2 if (bi == 0 and si > 0) else 1
            prefix = f"{stage}/{b}"
            bottleneck = "conv3" in bp

            block_in = x  # raw block input (int8 when the boundary handoff fired)
            identity = x
            if x.dtype == jnp.int8:
                # Block-boundary int8 handoff: x arrived quantized in THIS
                # block's conv1.aq domain (the handoff is gated on conv1
                # having a frozen ActQuant). conv1 consumes the int8
                # directly; every other consumer (the residual identity, and
                # the downsample conv, which requantizes into its own domain)
                # takes the dequantized form — elementwise, fused into its
                # consumer, never a separate HBM tensor. When downsample.aq
                # equals conv1.aq (always true for trees calibrated here —
                # both observers see the same tensor) the dequant→requant
                # round-trip is value-exact, and when they differ it is
                # correct by construction.
                a = bp["conv1"]["aq"]
                identity = dequantize(x, a.scale, a.zero_point)
            # intra-block int8 handoff (the last conv's output feeds the f32
            # residual add, so it stays f32)
            if bottleneck:
                out = _conv_bn(
                    bp["conv1"], bs.get("conv1", {}), nbs.setdefault("conv1", {}) if train else {},
                    x, stride=1, padding="VALID", train=train, relu=True,
                    capture=capture, path=f"{prefix}/conv1",
                    out_quant=_chain_aq(bp["conv1"], bp["conv2"]),
                )
                out = _conv_bn(
                    bp["conv2"], bs.get("conv2", {}), nbs.setdefault("conv2", {}) if train else {},
                    out, stride=stride, padding=pad3, train=train, relu=True,
                    capture=capture, path=f"{prefix}/conv2",
                    out_quant=_chain_aq(bp["conv2"], bp["conv3"]),
                )
                out = _conv_bn(
                    bp["conv3"], bs.get("conv3", {}), nbs.setdefault("conv3", {}) if train else {},
                    out, stride=1, padding="VALID", train=train, relu=False,
                    capture=capture, path=f"{prefix}/conv3",
                    out_quant=bp["conv3"].get("oq"),
                )
            else:
                # Basic block (resnet18/34): [3x3 stride, 3x3], expansion 1
                # (torchvision puts the stride on conv1).
                out = _conv_bn(
                    bp["conv1"], bs.get("conv1", {}), nbs.setdefault("conv1", {}) if train else {},
                    x, stride=stride, padding=pad3, train=train, relu=True,
                    capture=capture, path=f"{prefix}/conv1",
                    out_quant=_chain_aq(bp["conv1"], bp["conv2"]),
                )
                out = _conv_bn(
                    bp["conv2"], bs.get("conv2", {}), nbs.setdefault("conv2", {}) if train else {},
                    out, stride=1, padding=pad3, train=train, relu=False,
                    capture=capture, path=f"{prefix}/conv2",
                    out_quant=bp["conv2"].get("oq"),
                )
            if "downsample" in bp:
                from quantnet.core.types import ActQuant

                ds = bp["downsample"]
                # A statically-quantized downsample consumes the raw int8
                # directly. This fast path is ONLY valid when downsample.aq
                # == conv1.aq — true for every tree static.quantize produces
                # (identical capture tensor, identical observer) and enforced
                # at bake time by static._validate_sibling_domains plus
                # tests/test_resnet.py::test_downsample_aq_equals_conv1_aq.
                # Any other precision (a fp32/bf16/weight-only policy island)
                # takes the dequantized form instead — feeding it raw int8
                # would be wrong (and a measured 1.5 ms loss when "fixed" by
                # always dequantizing: the f32 form materializes;
                # docs/PERF.md).
                ds_in = x if (
                    x.dtype == jnp.int8 and isinstance(ds.get("aq"), ActQuant)
                ) else identity
                identity = _conv_bn(
                    ds, bs.get("downsample", {}),
                    nbs.setdefault("downsample", {}) if train else {},
                    ds_in, stride=stride, padding="VALID", train=train,
                    relu=False, capture=capture, path=f"{prefix}/downsample",
                    out_quant=ds.get("oq"),
                )
                if capture is not None:
                    # Pre-add output stats (":out" keys, downsample blocks
                    # only): lets static PTQ quantize both residual operands
                    # before the add (pre_add_quant) — the reference's own
                    # semantics (custom_quantization_model.py:95-100
                    # dequantizes both operands before adding), and it keeps
                    # XLA from materializing raw s32 conv accumulators
                    # (docs/PERF.md headroom item 2).
                    last_conv = "conv3" if bottleneck else "conv2"
                    capture[f"{prefix}/{last_conv}:out"] = out
                    capture[f"{prefix}/downsample:out"] = identity
                if identity.dtype == jnp.int8:
                    ds_oq = bp["downsample"]["oq"]
                    identity = dequantize(identity, ds_oq.scale, ds_oq.zero_point)
            # Block-boundary int8 handoff: the block output is the dominant
            # inter-layer HBM tensor in the net (f32 it is ~22 MB/image across
            # all 16 blocks); when both this block's conv3 and the next
            # block's conv1 are statically quantized, requantize here — the
            # add/relu/quantize all fuse into conv3's epilogue and the tensor
            # hits HBM at 1 byte/elem. The next iteration dequantizes for its
            # identity branch (see above).
            nxt = _next_conv1(params, si, bi)
            boundary_aq = None
            if nxt is not None:
                boundary_aq = _chain_aq(
                    bp["conv3"] if bottleneck else bp["conv2"], nxt
                )
            from quantnet.core import config as _cfg

            if (
                boundary_aq is not None
                and not train
                and out.dtype != jnp.int8
                and _cfg.resolve_boundary_backend() == "pallas"
            ):
                # Headroom #3 experiment: fuse dequant+add+relu+requantize in
                # one layout-pinned Pallas kernel (quantnet/ops/pallas_boundary).
                # Bit-exact vs the unfused path (oracle-tested).
                from quantnet.ops.pallas_boundary import residual_boundary

                if "downsample" not in bp and block_in.dtype == jnp.int8:
                    a = bp["conv1"]["aq"]
                    x = residual_boundary(
                        out, block_in, a.scale, a.zero_point, boundary_aq
                    )
                else:
                    x = residual_boundary(out, identity, None, None, boundary_aq)
                continue
            if out.dtype == jnp.int8:
                oq = bp["conv3" if bottleneck else "conv2"]["oq"]
                out = dequantize(out, oq.scale, oq.zero_point)
            # Residual add in the fp32 accumulate domain (reference semantics:
            # dequantized operands, dynamic_ptq_model.py:88 /
            # custom_quantization_model.py:95-100).
            x = jax.nn.relu(out + identity)
            if boundary_aq is not None:
                x = quantize_affine(
                    x, boundary_aq.scale, boundary_aq.zero_point
                )

    x = avgpool_global(x)
    if capture is not None:
        capture["fc"] = x
        sp = capture.get("__specs__")
        if sp is not None:
            sp["fc"] = ("linear", None, None, None)
    logits = linear(params["fc"], x)
    return logits, new_state
