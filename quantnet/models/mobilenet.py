"""MobileNetV2 in functional JAX — the depthwise-separable model family.

Beyond-reference generality proof (the reference's model zoo stops at
SimpleConvNet + torchvision ResNet-50 — /root/reference/models/): MobileNetV2
is the canonical HARD-to-quantize architecture — depthwise convolutions have
per-channel weight ranges spanning orders of magnitude, which is precisely the
failure mode cross-layer equalization (quantnet/quantize/equalize.py, Nagel et
al. 2019) was invented for; MobileNet is that paper's headline experiment.
Adding the family exercises every transform in the framework against grouped
convs, ReLU6 and linear-bottleneck residuals with zero changes to the
transforms themselves (they are capture/pytree-generic).

Architecture (Sandler et al. 2018, torchvision layout, width multiplier
round-to-8): stem 3x3/2 -> 32, 17 inverted-residual blocks per the (t, c, n, s)
table, head 1x1 -> 1280, global avgpool, dropout(0.2), fc. NHWC/HWIO
throughout; the depthwise kernel is HWIO (kh, kw, 1, C) with
feature_group_count == C (quantnet/ops/conv.py `groups`).

Quantization domains mirror quantnet/models/resnet.py: per-layer islands with
int8 inter-layer tensor handoff (expand -> dw -> project chains plus
block-boundary requantize), residual adds in the f32 accumulate domain
(linear bottleneck: NO activation on the add), capture + "__specs__"
side-channels for calibration/AdaRound/bias-correction ("dwconv" spec kind).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from quantnet.core.quantize import dequantize, quantize_affine
from quantnet.core.types import ActQuant
from quantnet.ops.conv import conv2d
from quantnet.ops.layers import avgpool_global, batchnorm_apply, batchnorm_init, dropout
from quantnet.ops.linear import linear

# (expansion t, output channels c, repeats n, first-block stride s) —
# Sandler et al. 2018 Table 2 / torchvision inverted_residual_setting.
BLOCK_TABLE = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)
STEM_WIDTH = 32
HEAD_WIDTH = 1280


def _divisible(v: float, divisor: int = 8) -> int:
    """torchvision _make_divisible: round channel counts to a multiple of 8,
    never dropping more than 10% (keeps imported-width parity AND happens to
    be the lane-friendly rounding a TPU wants anyway)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _kaiming(rng, shape, fan_in):
    return jax.random.normal(rng, shape, jnp.float32) * jnp.sqrt(2.0 / fan_in)


def _conv_init(rng, kh, kw, cin, cout, *, depthwise=False):
    # Depthwise fan_in is kh*kw (each output channel reduces over one input
    # channel) — torch's kaiming over the HWIO (kh, kw, 1, C) kernel agrees.
    fan = kh * kw * (1 if depthwise else cin)
    return {"w": _kaiming(rng, (kh, kw, 1 if depthwise else cin, cout), fan)}


def _with_bn(layer, cout, state_slot):
    bn_p, bn_s = batchnorm_init(cout)
    layer["bn"] = bn_p
    state_slot.update(bn_s)
    return layer


def block_widths(width_mult: float = 1.0):
    """Per-block (expanded hidden, output) channel pairs after the width
    multiplier, plus stem/head widths — shared by init and tests."""
    stem = _divisible(STEM_WIDTH * width_mult)
    head = _divisible(HEAD_WIDTH * max(1.0, width_mult))
    blocks = []
    cin = stem
    for t, c, n, s in BLOCK_TABLE:
        cout = _divisible(c * width_mult)
        for i in range(n):
            blocks.append((t, cin * t, cout, s if i == 0 else 1))
            cin = cout
    return stem, head, tuple(blocks)


def init(
    rng: jax.Array,
    num_classes: int = 1000,
    width_mult: float = 1.0,
) -> Tuple[dict, dict]:
    """Params/state pytrees in forward order (dict order IS model order —
    quantnet/quantize/common.py first/last_layer_path rely on it)."""
    stem, head, blocks = block_widths(width_mult)
    params: dict = {}
    state: dict = {}
    keys = iter(jax.random.split(rng, 3 * len(blocks) + 4))

    state["conv_stem"] = {}
    params["conv_stem"] = _with_bn(
        _conv_init(next(keys), 3, 3, 3, stem), stem, state["conv_stem"]
    )

    cin = stem
    for bi, (t, hidden, cout, s) in enumerate(blocks):
        bp: dict = {}
        bs: dict = {}
        if t != 1:
            bs["expand"] = {}
            bp["expand"] = _with_bn(
                _conv_init(next(keys), 1, 1, cin, hidden), hidden, bs["expand"]
            )
        bs["dw"] = {}
        bp["dw"] = _with_bn(
            _conv_init(next(keys), 3, 3, hidden, hidden, depthwise=True),
            hidden,
            bs["dw"],
        )
        bs["project"] = {}
        bp["project"] = _with_bn(
            _conv_init(next(keys), 1, 1, hidden, cout), cout, bs["project"]
        )
        params[f"block{bi}"] = bp
        state[f"block{bi}"] = bs
        cin = cout

    state["conv_head"] = {}
    params["conv_head"] = _with_bn(
        _conv_init(next(keys), 1, 1, cin, head), head, state["conv_head"]
    )
    params["fc"] = {
        "w": _kaiming(next(keys), (head, num_classes), head),
        "b": jnp.zeros((num_classes,), jnp.float32),
    }
    return params, state


def _conv_bn(params, state, new_state, x, *, stride, padding, train, act,
             capture, path, groups=1, out_quant=None):
    layer = params
    if "bn" in layer:
        y = conv2d(layer, x, stride=stride, padding=padding, groups=groups)
        y, ns = batchnorm_apply(layer["bn"], state, y, train=train)
        if train:
            new_state.update(ns)
        if act == "relu6":
            y = jnp.clip(y, 0.0, 6.0)
        return y
    if capture is not None:
        capture[path] = x
        sp = capture.get("__specs__")
        if sp is not None:
            # "dwconv": groups are recomputed from the input's channel count
            # at replay (quantnet/quantize/adaround.py::_apply_spec) — specs
            # stay 4-tuples across every model family.
            kind = "dwconv" if groups > 1 else "conv"
            sp[path] = (kind, stride, padding, act)
    return conv2d(
        layer, x, stride=stride, padding=padding, activation=act,
        groups=groups, out_quant=out_quant,
    )


def _chain_aq(producer: dict, consumer: Optional[dict]):
    """Consumer's ActQuant when the static int8 tensor handoff applies —
    same contract as quantnet/models/resnet.py::_chain_aq."""
    if (
        consumer is not None
        and "bn" not in producer
        and isinstance(consumer.get("aq"), ActQuant)
    ):
        return consumer["aq"]
    return None


def _block_names(params: dict) -> Tuple[str, ...]:
    # Numeric sort, NOT dict order: jit canonicalizes dict pytrees into
    # sorted-key order, which would interleave block10 before block2.
    return tuple(
        sorted((k for k in params if k.startswith("block")), key=lambda k: int(k[5:]))
    )


def _first_conv(block: dict) -> dict:
    return block.get("expand", block["dw"])


def apply(
    params: dict,
    state: dict,
    x: jax.Array,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    capture: Optional[dict] = None,
    torch_pad: bool = False,
) -> Tuple[jax.Array, dict]:
    """Forward. torch_pad selects torch's SYMMETRIC (1,1) padding at the
    stride-2 conv sites (stem + stride-2 depthwise) for numeric parity with
    imported torchvision weights — same rationale as resnet.py::apply."""
    pad2 = ((1, 1), (1, 1)) if torch_pad else "SAME"
    new_state = jax.tree_util.tree_map(lambda v: v, state) if train else state
    names = _block_names(params)

    ns = new_state.get("conv_stem", {}) if train else {}
    x = _conv_bn(
        params["conv_stem"], state.get("conv_stem", {}), ns, x,
        stride=2, padding=pad2, train=train, act="relu6",
        capture=capture, path="conv_stem",
        out_quant=_chain_aq(
            params["conv_stem"], _first_conv(params[names[0]])
        ) if names else None,
    )
    if train:
        new_state["conv_stem"] = ns

    for i, name in enumerate(names):
        bp = params[name]
        bs = state.get(name, {})
        nbs = new_state.get(name, {}) if train else {}
        t_expand = "expand" in bp
        hidden = _leaf_shape(bp["dw"]["w"])[3]
        stride = 2 if _block_stride_is_2(params, i) else 1
        residual = stride == 1 and _block_cin(bp) == _block_cout(bp)

        h = x
        identity = x
        if x.dtype == jnp.int8:
            # Block-boundary int8 handoff: x is in THIS block's first conv aq
            # domain (handoff gated on that); the residual identity takes the
            # dequantized form (elementwise, fuses into the add).
            a = _first_conv(bp)["aq"]
            identity = dequantize(x, a.scale, a.zero_point)
        if t_expand:
            h = _conv_bn(
                bp["expand"], bs.get("expand", {}),
                nbs.setdefault("expand", {}) if train else {}, h,
                stride=1, padding="VALID", train=train, act="relu6",
                capture=capture, path=f"{name}/expand",
                out_quant=_chain_aq(bp["expand"], bp["dw"]),
            )
        h = _conv_bn(
            bp["dw"], bs.get("dw", {}),
            nbs.setdefault("dw", {}) if train else {}, h,
            stride=stride, padding=pad2 if stride == 2 else "SAME",
            train=train, act="relu6", capture=capture, path=f"{name}/dw",
            groups=hidden,
            out_quant=_chain_aq(bp["dw"], bp["project"]),
        )
        # Linear bottleneck: NO activation on the projection or the add.
        nxt = (
            _first_conv(params[names[i + 1]])
            if i + 1 < len(names)
            else params["conv_head"]
        )
        boundary_aq = _chain_aq(bp["project"], nxt)
        h = _conv_bn(
            bp["project"], bs.get("project", {}),
            nbs.setdefault("project", {}) if train else {}, h,
            stride=1, padding="VALID", train=train, act=None,
            capture=capture, path=f"{name}/project",
            # Non-residual blocks requantize straight out of the project
            # epilogue; residual blocks must emit f32 for the add.
            out_quant=None if residual else boundary_aq,
        )
        if residual:
            x = h + identity
            if boundary_aq is not None:
                x = quantize_affine(x, boundary_aq.scale, boundary_aq.zero_point)
        else:
            x = h

    ns = new_state.get("conv_head", {}) if train else {}
    x = _conv_bn(
        params["conv_head"], state.get("conv_head", {}), ns, x,
        stride=1, padding="VALID", train=train, act="relu6",
        capture=capture, path="conv_head",
    )
    if train:
        new_state["conv_head"] = ns
    x = avgpool_global(x)
    x = dropout(x, 0.2, rng, train)
    if capture is not None:
        capture["fc"] = x
        sp = capture.get("__specs__")
        if sp is not None:
            sp["fc"] = ("linear", None, None, None)
    logits = linear(params["fc"], x)
    return logits, new_state


def _leaf_shape(w):
    return w.values.shape if hasattr(w, "values") else w.shape


def _block_cin(bp: dict) -> int:
    return _leaf_shape(_first_conv(bp)["w"])[2]


def _block_cout(bp: dict) -> int:
    return _leaf_shape(bp["project"]["w"])[3]


def _block_stride_is_2(params: dict, index: int) -> bool:
    """Static (trace-time) stride lookup: strides come from BLOCK_TABLE
    positions, which depend only on the block count — identical for every
    width multiplier."""
    strides = []
    for t, c, n, s in BLOCK_TABLE:
        strides.extend([s] + [1] * (n - 1))
    return strides[index] == 2
