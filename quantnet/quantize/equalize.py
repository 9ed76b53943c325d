"""Cross-layer equalization (CLE): data-free range rebalancing for PTQ.

Nagel et al., "Data-Free Quantization Through Weight Equalization and Bias
Correction" (ICCV 2019) — with AdaRound, the other standard PTQ accuracy
tool (AIMET ships both; PAPERS.md). The reference has nothing comparable;
this is a beyond-reference pass completing the framework's PTQ toolbox.

The idea: ReLU is positively homogeneous, so for two connected layers
    y = W2 · relu(W1 x + b1) + b2
any per-channel rescale S of layer 1's output can be absorbed by layer 2:
    W1' = S W1,  b1' = S b1,  W2' = W2 S^-1
is function-preserving. CLE picks s_c = sqrt(r1_c · r2_c) / r1_c (r = per-
channel weight absmax), which equalizes the two layers' per-channel ranges
— exactly the failure mode of per-TENSOR weight quantization (one hot
channel blows up the shared scale and rounds the rest to zero; the
framework's on-chip QAT collapse demo constructs precisely this case, and
CLE repairs it without any training or data).

TPU-native formulation: one jitted pure pytree transform (BN folded first
— BN is where range imbalance accumulates, and folding is required for the
homogeneity argument to apply to the deployed graph); the pair graph is
static metadata derived from the model structure (sequential convnet
chain, intra-block ResNet pairs — residual joins are never crossed).
Max-pool, eval-mode dropout and the NHWC flatten all commute with
per-channel positive scaling, so the convnet chain equalizes end to end,
including conv6 -> fc1 across the flatten (the fc weight is viewed as
(H·W, C, out) and scaled on its channel axis).

Not implemented (documented scope): the paper's bias-absorption follow-up;
per-channel weight quantization (this framework's default) does not need
CLE — it exists for the per-tensor deployment configs (`--per-tensor`) and
imported checkpoints with pathological per-channel spread. (The paper's
OTHER follow-up, empirical bias correction, lives in
quantnet/quantize/bias_correct.py.)

ReLU6 (MobileNet pairs): the clip is positively homogeneous only on its
linear segment, so CLE across ReLU6 is exact iff no pre-activation crosses
6 in either the original or rescaled net — the same regime restriction the
paper/AIMET handle by swapping ReLU6 for ReLU on trained MobileNets.
Sub-clip exactness is pinned in tests/test_mobilenet.py; clip-active drift
is a measured, model-specific quantity (scripts/tpu_mobilenet_bench.py).
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from quantnet.quantize.fold import fold_model_jit

_EPS = 1e-9

# Pair kinds: how the SECOND layer's weight indexes the first's output
# channels. "conv": HWIO input axis 2; "fc": (C, out) rows; "fc_flat":
# (H*W*C, out) with C fastest-varying (NHWC flatten).
PairSpec = Tuple[str, str, str]


def _get(tree: dict, path: str) -> dict:
    node = tree
    for k in path.split("/"):
        node = node[k]
    return node


def detect_pairs(params: dict) -> Tuple[PairSpec, ...]:
    """Equalizable pairs from the model structure.

    Convnet (top-level conv1..convN + fc1/fc2): the full sequential chain —
    ReLU/max-pool/dropout/flatten sit between every pair and commute with
    the rescale. ResNet (layer1..4 of blocks): intra-block pairs only
    (conv1->conv2 [, conv2->conv3]); the residual add joins two paths, so
    block outputs and downsample convs are never rescaled. MobileNetV2
    (conv_stem + blockN of expand/dw/project): the paper's own target —
    intra-block expand->dw (the depthwise consumes channel c ONLY into
    output channel c, kind "dw_in") and dw->project, plus stem->block0/dw
    (block0 is never residual). ReLU6 caveat: clipping breaks positive
    homogeneity at the 6-boundary, so CLE across ReLU6 is exact only where
    pre-activations stay under the clip — the same approximation Nagel et
    al. accept for MobileNet (their §4 experiments); residual joins are
    never crossed, as everywhere else.
    """
    pairs: List[PairSpec] = []
    if "conv_stem" in params:
        names = sorted(
            (k for k in params if k.startswith("block")), key=lambda k: int(k[5:])
        )
        if names:
            pairs.append(("conv_stem", f"{names[0]}/dw", "dw_in"))
        for name in names:
            block = params[name]
            if "expand" in block:
                pairs.append((f"{name}/expand", f"{name}/dw", "dw_in"))
            pairs.append((f"{name}/dw", f"{name}/project", "conv"))
        return tuple(pairs)
    if "conv1" in params and "fc1" in params and "layer1" not in params:
        convs = []
        i = 1
        while f"conv{i}" in params:
            convs.append(f"conv{i}")
            i += 1
        for a, b in zip(convs, convs[1:]):
            pairs.append((a, b, "conv"))
        if convs:
            pairs.append((convs[-1], "fc1", "fc_flat"))
        if "fc2" in params:
            pairs.append(("fc1", "fc2", "fc"))
        return tuple(pairs)
    for si in range(1, 5):
        stage = params.get(f"layer{si}")
        if not isinstance(stage, dict):
            continue
        for bi in sorted(stage, key=int):
            block = stage[bi]
            t = f"layer{si}/{bi}"
            if "conv2" in block:
                pairs.append((f"{t}/conv1", f"{t}/conv2", "conv"))
            if "conv3" in block:
                pairs.append((f"{t}/conv2", f"{t}/conv3", "conv"))
    return tuple(pairs)


def _ranges(w1: jax.Array, w2: jax.Array, kind: str):
    """(r1, r2, scale_shape2): per-channel absmax of layer1's output axis and
    layer2's matching input axis, plus the broadcast shape dividing w2."""
    c = w1.shape[-1]
    r1 = jnp.max(jnp.abs(w1.reshape(-1, c)), axis=0)
    if kind == "conv":  # (kh, kw, C, out)
        r2 = jnp.max(jnp.abs(w2), axis=(0, 1, 3))
        shape2 = (1, 1, c, 1)
    elif kind == "dw_in":  # depthwise (kh, kw, 1, C): channel c -> channel c
        r2 = jnp.max(jnp.abs(w2), axis=(0, 1, 2))
        shape2 = (1, 1, 1, c)
    elif kind == "fc":  # (C, out)
        r2 = jnp.max(jnp.abs(w2), axis=1)
        shape2 = (c, 1)
    elif kind == "fc_flat":  # (H*W*C, out), C fastest
        v = w2.reshape(-1, c, w2.shape[-1])
        r2 = jnp.max(jnp.abs(v), axis=(0, 2))
        shape2 = None  # handled via the 3-D view
    else:
        raise ValueError(f"unknown pair kind {kind!r}")
    return r1, r2, shape2


@partial(jax.jit, static_argnames=("pairs", "iterations"))
def _equalize(params: dict, pairs: Tuple[PairSpec, ...], iterations: int):
    def one_pair(params, spec):
        p1, p2, kind = spec
        l1, l2 = dict(_get(params, p1)), dict(_get(params, p2))
        w1, w2 = l1["w"], l2["w"]
        r1, r2, shape2 = _ranges(w1, w2, kind)
        # s = sqrt(r1 r2)/r1 equalizes both ranges to sqrt(r1 r2); dead
        # channels (either range ~0) keep s=1.
        s = jnp.where(
            (r1 > _EPS) & (r2 > _EPS), jnp.sqrt(r1 * r2) / (r1 + _EPS), 1.0
        )
        l1["w"] = w1 * s
        if l1.get("b") is not None:
            l1["b"] = l1["b"] * s
        if kind == "fc_flat":
            c = w1.shape[-1]
            v = w2.reshape(-1, c, w2.shape[-1])
            l2["w"] = (v / s[None, :, None]).reshape(w2.shape)
        else:
            l2["w"] = w2 / s.reshape(shape2)
        # write back along the paths
        def set_path(tree, path, value):
            keys = path.split("/")
            node = dict(tree)
            cur = node
            for k in keys[:-1]:
                cur[k] = dict(cur[k])
                cur = cur[k]
            cur[keys[-1]] = value
            return node

        params = set_path(params, p1, l1)
        params = set_path(params, p2, l2)
        return params

    for _ in range(iterations):
        for spec in pairs:
            params = one_pair(params, spec)
    return params


def cross_layer_equalize(
    params: dict,
    state: dict,
    *,
    pairs: Optional[Tuple[PairSpec, ...]] = None,
    iterations: int = 2,
) -> Tuple[dict, dict]:
    """FP32 (params, state) -> equalized, BN-folded (params', state').

    Function-preserving in eval mode (tested to fp32 tolerance); apply
    BEFORE any quantize transform. `iterations` sweeps the pair chain so
    scales propagate through longer sequences (the paper reports fast
    convergence; 2 suffices for these depths). Pass explicit `pairs` for
    custom models; auto-detected otherwise (detect_pairs)."""
    params, state = fold_model_jit(params, state)
    pairs = detect_pairs(params) if pairs is None else tuple(pairs)
    if not pairs:
        return params, state
    return _equalize(params, pairs, iterations), state
