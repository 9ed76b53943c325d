"""SimpleConvNet: the CIFAR-10 FP32 baseline, as a pure-functional JAX model.

Capability parity with the reference's SimpleConvNet
(/root/reference/models/baseline_model.py:5-83): three VGG-style blocks of
[Conv3x3 -> BN -> ReLU] x2 -> MaxPool2 -> Dropout(0.25) with widths 64/128/256,
then Flatten -> FC(4096->512) -> BN1d -> ReLU -> Dropout(0.5) -> FC(512->10),
Kaiming-normal init (reference :45-56). ~3.25M params; fc1 dominates.

Not a port: parameters are a plain nested dict pytree; the forward is a pure
function dispatching through quantnet.ops so that the *same* apply() serves the
FP32, weight-only, dynamic-PTQ and static-PTQ variants — a quantized model is
just a transformed params tree (see quantnet/quantize/*), not a wrapper class
(the reference needed one duck-typed wrapper class per scheme, SURVEY.md 2.1).

Layout is NHWC/HWIO (TPU-native), images enter as f32[N, 32, 32, 3].
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from quantnet.core.types import ActQuant
from quantnet.ops.conv import conv2d
from quantnet.ops.layers import batchnorm_apply, batchnorm_init, dropout, maxpool2d
from quantnet.ops.linear import linear

# (name, in_ch, out_ch) for the six convs; widths per reference baseline_model.py
CONV_DEFS = [
    ("conv1", 3, 64),
    ("conv2", 64, 64),
    ("conv3", 64, 128),
    ("conv4", 128, 128),
    ("conv5", 128, 256),
    ("conv6", 256, 256),
]
# Layer order (for quantization policy tables and calibration bookkeeping).
QUANT_LAYERS = [name for name, _, _ in CONV_DEFS] + ["fc1", "fc2"]


def _kaiming(rng, shape, fan_in):
    # Kaiming-normal, fan-in, relu gain (reference baseline_model.py:47-50)
    std = jnp.sqrt(2.0 / fan_in)
    return jax.random.normal(rng, shape, jnp.float32) * std


def init(
    rng: jax.Array, num_classes: int = 10, image_size: int = 32
) -> Tuple[dict, dict]:
    """Returns (params, state). state holds BN running stats."""
    params, state = {}, {}
    keys = jax.random.split(rng, len(CONV_DEFS) + 2)
    for k, (name, cin, cout) in zip(keys, CONV_DEFS):
        params[name] = {
            "w": _kaiming(k, (3, 3, cin, cout), 3 * 3 * cin),
            "b": jnp.zeros((cout,), jnp.float32),
        }
        bn_p, bn_s = batchnorm_init(cout)
        params[name]["bn"] = bn_p
        state[name] = bn_s

    feat = (image_size // 8) ** 2 * 256  # 4x4x256 = 4096 for 32x32 input
    fc_dim = 512
    params["fc1"] = {
        "w": _kaiming(keys[-2], (feat, fc_dim), feat),
        "b": jnp.zeros((fc_dim,), jnp.float32),
    }
    bn_p, bn_s = batchnorm_init(fc_dim)
    params["fc1"]["bn"] = bn_p
    state["fc1"] = bn_s
    params["fc2"] = {
        "w": _kaiming(keys[-1], (fc_dim, num_classes), fc_dim),
        "b": jnp.zeros((num_classes,), jnp.float32),
    }
    return params, state


def _chain_plan(params) -> dict:
    """Static-path int8 tensor handoff plan: layer -> successor's ActQuant.

    Every edge in this model's layer order is chainable (the ops between
    consecutive quantized layers — relu, maxpool, inference dropout, reshape —
    are monotone or identity, so requantizing at the producer is exactly
    equivalent to quantizing at the consumer; see quantnet/ops/conv.py)."""
    plan = {}
    for i, name in enumerate(QUANT_LAYERS[:-1]):
        cur, nxt = params.get(name), params.get(QUANT_LAYERS[i + 1])
        # Any producer can requantize into a static consumer's frozen domain
        # (every quantnet/ops epilogue honors out_quant — fp32/bf16-policy
        # islands and weight-only layers included); the producer must be a
        # post-fold quantized-graph layer (no live BN between it and the
        # consumer).
        if (
            cur is not None
            and nxt is not None
            and "bn" not in cur
            and isinstance(nxt.get("aq"), ActQuant)
        ):
            plan[name] = nxt["aq"]
    return plan


def _conv_bn_relu(params, state, new_state, name, x, train, capture=None, out_quant=None):
    layer = params[name]
    if "bn" in layer:
        x = conv2d(layer, x, stride=1, padding="SAME")
        x, ns = batchnorm_apply(layer["bn"], state[name], x, train=train)
        if train:
            new_state[name] = ns
        x = jax.nn.relu(x)
    else:
        # BN-folded (quantized) variant: activation fused into the op epilogue.
        if capture is not None:
            capture[name] = x
            sp = capture.get("__specs__")
            if sp is not None:
                # See quantnet/models/resnet.py::_conv_bn — static op spec
                # side-channel for layer-local reconstruction (adaround).
                sp[name] = ("conv", 1, "SAME", "relu")
        x = conv2d(layer, x, stride=1, padding="SAME", activation="relu",
                   out_quant=out_quant)
    return x


def apply(
    params: dict,
    state: dict,
    x: jax.Array,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    capture: Optional[dict] = None,
) -> Tuple[jax.Array, dict]:
    """Forward pass. Returns (logits, new_state).

    `capture`, when a dict is passed, is filled with each quantizable layer's
    *input* activation (used by calibration, quantnet/quantize/static.py). Only
    populated on the BN-folded inference path.
    """
    new_state = dict(state) if train else state
    rngs = jax.random.split(rng, 4) if rng is not None else [None] * 4
    chain = _chain_plan(params)

    x = _conv_bn_relu(params, state, new_state, "conv1", x, train, capture, chain.get("conv1"))
    x = _conv_bn_relu(params, state, new_state, "conv2", x, train, capture, chain.get("conv2"))
    x = maxpool2d(x)
    x = dropout(x, 0.25, rngs[0], train)

    x = _conv_bn_relu(params, state, new_state, "conv3", x, train, capture, chain.get("conv3"))
    x = _conv_bn_relu(params, state, new_state, "conv4", x, train, capture, chain.get("conv4"))
    x = maxpool2d(x)
    x = dropout(x, 0.25, rngs[1], train)

    x = _conv_bn_relu(params, state, new_state, "conv5", x, train, capture, chain.get("conv5"))
    x = _conv_bn_relu(params, state, new_state, "conv6", x, train, capture, chain.get("conv6"))
    x = maxpool2d(x)
    x = dropout(x, 0.25, rngs[2], train)

    x = x.reshape(x.shape[0], -1)

    fc1 = params["fc1"]
    if "bn" in fc1:
        x = linear(fc1, x)
        x, ns = batchnorm_apply(fc1["bn"], state["fc1"], x, train=train)
        if train:
            new_state["fc1"] = ns
        x = jax.nn.relu(x)
    else:
        if capture is not None:
            capture["fc1"] = x
            sp = capture.get("__specs__")
            if sp is not None:
                sp["fc1"] = ("linear", None, None, "relu")
        x = linear(fc1, x, activation="relu", out_quant=chain.get("fc1"))
    x = dropout(x, 0.5, rngs[3], train)

    if capture is not None:
        capture["fc2"] = x
        sp = capture.get("__specs__")
        if sp is not None:
            sp["fc2"] = ("linear", None, None, None)
    logits = linear(params["fc2"], x)
    return logits, new_state
