"""Dynamic PTQ: per-batch activation scales, pre-quantized INT8 weights.

Scheme 1 of the reference (models/dynamic_ptq_model.py:281-306: fuse BN, then
quantize_dynamic({Linear, Conv2d}, qint8)). Two intent-honoring upgrades over
the reference's actual behavior (SURVEY.md behavior note 1):
  - convs really run INT8 (PyTorch silently kept them FP32);
  - weights are per-output-channel by default (PyTorch dynamic is per-tensor).

The transform is pure: fold BN -> quantize weights -> tag every layer with a
DynamicActQuant marker so the ops compute absmax -> scale -> int8 per batch,
fused on device (no host sync).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax

from quantnet.core.types import DynamicActQuant
from quantnet.quantize.common import (
    last_layer_path,
    quantize_weight,
    resolve_policy,
    walk_layers,
)
from quantnet.quantize.fold import fold_model


@partial(
    jax.jit,
    static_argnames=("per_channel", "skip_last_layer", "policy_items", "last_layer_name"),
)
def _transform(params, state, per_channel, skip_last_layer, policy_items, last_layer_name):
    # Whole transform is one device program: fold + weight quant in one dispatch
    # (eager per-layer quantization costs a host round-trip per op).
    params, state = fold_model(params, state)
    last = last_layer_name or last_layer_path(params)
    layer_policy = dict(policy_items) if policy_items else None

    def q(path: str, layer: dict) -> dict:
        action = resolve_policy(path, "dynamic", layer_policy)
        if action == "fp32" or (skip_last_layer and path == last):
            return dict(layer)
        out = dict(layer)
        out["w"] = quantize_weight(layer["w"], per_channel)
        out["aq"] = DynamicActQuant()
        return out

    return walk_layers(params, q), state


def quantize(
    params: dict,
    state: dict,
    *,
    per_channel: bool = True,
    skip_last_layer: bool = False,
    layer_policy: Optional[dict] = None,
    last_layer_name: Optional[str] = None,
) -> Tuple[dict, dict]:
    """FP32 (params, state) -> dynamically-quantized (params', {})."""
    policy_items = tuple(sorted(layer_policy.items())) if layer_policy else None
    return _transform(
        params, state, per_channel, skip_last_layer, policy_items, last_layer_name
    )
