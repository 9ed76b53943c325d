"""Checkpointing: orbax for training state, a self-describing artifact format
for inference params (FP32 or quantized).

Reference contract (SURVEY.md section 5, checkpoint/resume): best-accuracy
checkpoint of {model, optimizer, scheduler, best_accuracy}
(model_trainer.py:93-99), reload-best-at-end (:104-106), resume-from-disk
(run_experiment.py:24,56). Plus the upgrade the reference lacked: quantized
models are serialized as a standalone artifact (packed INT8 weights + scales +
zero-points + scheme metadata) so inference never re-quantizes/re-calibrates —
the reference re-derived quantized models from the FP32 checkpoint every run.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from quantnet.core.types import ActQuant, DynamicActQuant, QTensor

# ---------------------------------------------------------------------------
# Training-state checkpoints (orbax)
# ---------------------------------------------------------------------------


def save(path: str, tree: Any) -> None:
    """Save a training-state pytree with orbax (async-safe, atomic)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)


def restore(path: str, target: Optional[Any] = None) -> Any:
    """Restore a training-state pytree; `target` gives structure/dtypes."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        return ckptr.restore(path, item=target)
    return ckptr.restore(path)


# ---------------------------------------------------------------------------
# Inference artifacts: npz payload + JSON manifest, no target tree needed
# ---------------------------------------------------------------------------

_LEAF_KINDS = ("array", "qtensor", "actquant", "dynamic_marker")


def _flatten(tree: Any, prefix: str, arrays: dict, manifest: dict) -> None:
    if isinstance(tree, dict):
        manifest["__order__"] = manifest.get("__order__", [])
        node = {"kind": "dict", "keys": sorted(tree.keys())}
        manifest[prefix] = node
        for k in sorted(tree.keys()):
            _flatten(tree[k], f"{prefix}.{k}" if prefix else str(k), arrays, manifest)
    elif isinstance(tree, QTensor):
        manifest[prefix] = {"kind": "qtensor", "axis": tree.axis,
                            "has_zp": tree.zero_point is not None,
                            "bits": tree.bits, "group_size": tree.group_size}
        vals = np.asarray(tree.values)
        if tree.bits == 4:
            # True sub-byte artifact: two int4 values per byte. Low nibble =
            # even flat index, high = odd; values are in [-7, 7], biased +8
            # into [1, 15] so the nibble is unambiguous. Shape recorded for
            # unpacking.
            manifest[prefix]["shape"] = list(vals.shape)
            flat = vals.reshape(-1).astype(np.int16) + 8
            if flat.size % 2:
                flat = np.concatenate([flat, np.zeros(1, np.int16)])
            packed = (flat[0::2] | (flat[1::2] << 4)).astype(np.uint8)
            arrays[f"{prefix}#values"] = packed
        else:
            arrays[f"{prefix}#values"] = vals
        arrays[f"{prefix}#scale"] = np.asarray(tree.scale)
        if tree.zero_point is not None:
            arrays[f"{prefix}#zp"] = np.asarray(tree.zero_point)
    elif isinstance(tree, ActQuant):
        manifest[prefix] = {"kind": "actquant"}
        arrays[f"{prefix}#scale"] = np.asarray(tree.scale)
        arrays[f"{prefix}#zp"] = np.asarray(tree.zero_point)
    elif isinstance(tree, DynamicActQuant):
        # handoff (inter-layer narrow dtype) is semantic state: dropping it
        # on save/load silently disabled the bf16 handoff and cost the
        # loaded dynamic artifact ~1.5x throughput (caught when the
        # experiment pipeline's dynamic bench disagreed with the in-process
        # number).
        manifest[prefix] = {"kind": "dynamic_marker", "handoff": tree.handoff}
    else:
        arr = np.asarray(tree)
        if arr.dtype == jnp.bfloat16:
            # npz has no bfloat16: store as f32 (lossless upcast), downcast on
            # load per the recorded dtype.
            manifest[prefix] = {"kind": "array", "dtype": "bfloat16"}
            arrays[prefix] = arr.astype(np.float32)
        else:
            manifest[prefix] = {"kind": "array"}
            arrays[prefix] = arr


def _unflatten(prefix: str, arrays, manifest: dict) -> Any:
    node = manifest[prefix]
    kind = node["kind"]
    if kind == "dict":
        return {
            k: _unflatten(f"{prefix}.{k}" if prefix else str(k), arrays, manifest)
            for k in node["keys"]
        }
    if kind == "qtensor":
        zp = jnp.asarray(arrays[f"{prefix}#zp"]) if node["has_zp"] else None
        bits = node.get("bits", 8)
        vals = arrays[f"{prefix}#values"]
        if bits == 4:
            packed = np.asarray(vals).astype(np.uint8)
            lo = (packed & 0xF).astype(np.int8) - 8
            hi = (packed >> 4).astype(np.int8) - 8
            flat = np.stack([lo, hi], axis=1).reshape(-1)
            shape = tuple(node["shape"])
            vals = flat[: int(np.prod(shape))].reshape(shape)
        return QTensor(
            values=jnp.asarray(vals),
            scale=jnp.asarray(arrays[f"{prefix}#scale"]),
            zero_point=zp,
            axis=node["axis"],
            bits=bits,
            group_size=node.get("group_size"),
        )
    if kind == "actquant":
        return ActQuant(
            scale=jnp.asarray(arrays[f"{prefix}#scale"]),
            zero_point=jnp.asarray(arrays[f"{prefix}#zp"]),
        )
    if kind == "dynamic_marker":
        return DynamicActQuant(handoff=node.get("handoff"))
    if kind == "array":
        a = jnp.asarray(arrays[prefix])
        if node.get("dtype") == "bfloat16":
            a = a.astype(jnp.bfloat16)
        return a
    raise ValueError(f"unknown leaf kind {kind!r}")


def save_artifact(path: str, params: dict, metadata: Optional[dict] = None) -> None:
    """Serialize an inference params tree (dicts of arrays / QTensor / ActQuant
    / DynamicActQuant leaves) to `<path>.npz` + `<path>.json`."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays: dict = {}
    manifest: dict = {}
    _flatten(params, "", arrays, manifest)
    manifest.pop("__order__", None)
    np.savez_compressed(path + ".npz", **arrays)
    with open(path + ".json", "w") as f:
        json.dump({"manifest": manifest, "metadata": metadata or {}}, f)


def load_artifact(path: str):
    """Returns (params_tree, metadata)."""
    with open(path + ".json") as f:
        blob = json.load(f)
    with np.load(path + ".npz") as arrays:
        arrays = dict(arrays)
    return _unflatten("", arrays, blob["manifest"]), blob["metadata"]
