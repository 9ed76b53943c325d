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
    first_layer_path,
    last_layer_path,
    quantize_weight,
    resolve_policy,
    walk_layers,
)
from quantnet.quantize.fold import fold_model


@partial(
    jax.jit,
    static_argnames=(
        "per_channel", "skip_last_layer", "skip_first_layer", "policy_items",
        "last_layer_name", "handoff",
    ),
)
def _transform(
    params, state, per_channel, skip_last_layer, skip_first_layer,
    policy_items, last_layer_name, handoff,
):
    # Whole transform is one device program: fold + weight quant in one dispatch
    # (eager per-layer quantization costs a host round-trip per op).
    params, state = fold_model(params, state)
    last = last_layer_name or last_layer_path(params)
    first = first_layer_path(params)
    layer_policy = dict(policy_items) if policy_items else None

    def q(path: str, layer: dict) -> dict:
        action = resolve_policy(path, "dynamic", layer_policy)
        explicit = bool(layer_policy) and (
            path in layer_policy or path.rsplit("/", 1)[-1] in layer_policy
        )
        if action == "fp32" or (
            not explicit
            and (
                (skip_last_layer and path == last)
                or (skip_first_layer and path == first)
            )
        ):
            return dict(layer)
        out = dict(layer)
        out["w"] = quantize_weight(layer["w"], per_channel)
        # The classifier's logits stay full precision (the handoff narrows
        # inter-layer tensors, not the model output).
        out["aq"] = DynamicActQuant(
            handoff=None if path == last else handoff
        )
        return out

    return walk_layers(params, q), state


def quantize(
    params: dict,
    state: dict,
    *,
    per_channel: bool = True,
    skip_last_layer: bool = False,
    skip_first_layer: bool = False,
    layer_policy: Optional[dict] = None,
    last_layer_name: Optional[str] = None,
    handoff: Optional[str] = "bfloat16",
) -> Tuple[dict, dict]:
    """FP32 (params, state) -> dynamically-quantized (params', {}).

    handoff="bfloat16" (default): quantized layers write their outputs to HBM
    as bf16 instead of f32. Dynamic scales are per-batch data-dependent, so
    the static scheme's int8 handoff can't apply — but since every dynamic
    consumer immediately re-quantizes its input to int8 (4.7e-3 relative
    step at absmax), the bf16 rounding (~3.9e-3 max relative error) is below
    the quantization noise floor while halving inter-layer activation HBM
    traffic — the round-1 reason dynamic PTQ measured *slower* than fp32 on
    TPU (docs/PERF.md scheme sweep). Set None for full-f32 inter-layer
    tensors.

    skip_first_layer keeps the C=3 stem in fp32 compute (same deployment
    policy as the static scheme — docs/PERF.md first-layer policy: the s8
    conv at 3 input channels runs far below MXU rates while the per-batch
    input quantize costs more than the conv it feeds)."""
    policy_items = tuple(sorted(layer_policy.items())) if layer_policy else None
    return _transform(
        params, state, per_channel, skip_last_layer, skip_first_layer,
        policy_items, last_layer_name, handoff,
    )
