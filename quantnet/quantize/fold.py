"""BatchNorm folding: the TPU-native equivalent of the reference's fuse_modules.

The reference fused [convN, bnN] x6 + [fc1, bn7] before every quantization
scheme (models/dynamic_ptq_model.py:289-299, custom_quantization_model.py:180-190,
with the legality-checking variant safe_fuse at :14-29). Here fusion is a pure
pytree transform: every layer dict carrying a 'bn' sub-dict gets its weights
rewritten with the BN affine folded in and the 'bn' entry dropped; the model's
apply() detects the absence of 'bn' and skips BN at trace time.
"""
from __future__ import annotations

from typing import Tuple

import jax

from quantnet.ops.layers import fold_batchnorm_into_conv
from quantnet.quantize.common import walk_layers


def can_fold(layer: dict) -> bool:
    """Fusion legality check (equivalent of reference safe_fuse,
    custom_quantization_model.py:14-29): only layers that actually carry BN."""
    return "bn" in layer


def fold_model(params: dict, state: dict) -> Tuple[dict, dict]:
    """Fold all BN layers into their conv/dense. Returns (params', state').

    Idempotent (reference fuse_model had explicit already-fused detection,
    custom_quantization_model.py:266-298): layers without 'bn' pass through.
    """

    def fold_one(path: str, layer: dict) -> dict:
        if not can_fold(layer):
            return dict(layer)
        leaf = path.rsplit("/", 1)[-1]
        # BN state is keyed by the same path structure as params.
        bn_state = _lookup_state(state, path)
        w, b = fold_batchnorm_into_conv(
            layer["w"], layer.get("b"), layer["bn"], bn_state, channel_axis=-1
        )
        out = {k: v for k, v in layer.items() if k != "bn"}
        out["w"], out["b"] = w, b
        return out

    new_params = walk_layers(params, fold_one)
    return new_params, {}


# One device program for the whole fold — folding eagerly would pay a host
# round-trip per arithmetic op, which over a remote-device tunnel costs more
# than the fold itself. jit caches per params-tree structure.
fold_model_jit = jax.jit(fold_model)


def _lookup_state(state: dict, path: str):
    node = state
    for part in path.split("/"):
        node = node[part]
    return node
