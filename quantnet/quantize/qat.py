"""Quantization-aware training (QAT): finetune through fake-quantization, then
bake a deployable static-INT8 tree.

Beyond-reference capability: the reference's "custom quantization" schemes
wrap layers in QuantStub/DeQuantStub islands but never train through them
(the stubs are identity without prepare()/convert() — SURVEY.md behavior
note 2, reference models/custom_quantization_model.py:34-58). QAT is the
standard next step of exactly that per-layer-island design: simulate the
deployed int8 graph during a short finetune so the weights adapt to the
quantization noise, recovering accuracy that post-training quantization
loses.

Recipe (all pure pytree transforms, reusing the PTQ machinery):
  1. fold BN (quantnet/quantize/fold.py) — QAT trains the *deployed* graph,
     which is BN-folded; this is the "BN frozen" finetune phase.
  2. calibrate activation ranges once (static.calibrate) and freeze them as
     host scalars (`FakeQuant` static leaves — no array leaves, so the
     optimizer never touches them).
  3. finetune with the ordinary Trainer: every layer op sees the 'fq' marker
     and computes with STE fake-quantized weights + activations
     (quantnet/core/quantize.py::fake_quant_*_ste).
  4. bake(): quantize the finetuned weights for real; the frozen ranges
     become ActQuant leaves — structurally identical to static.quantize
     output, so evaluation, benchmarking, serialization and serving all work
     unchanged.
"""
from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp

from quantnet.core.types import ActQuant, FakeQuant
from quantnet.quantize import static
from quantnet.quantize.common import (
    first_layer_path,
    last_layer_path,
    quantize_weight,
    resolve_policy,
    walk_layers,
    weight_colsum,
)
from quantnet.quantize.fold import fold_model_jit


def prepare(
    params: dict,
    state: dict,
    apply_fn: Callable,
    calibration_batches: Iterable,
    *,
    observer: str = "minmax",
    per_channel: bool = True,
    skip_last_layer: bool = False,
    skip_first_layer: bool = False,
    layer_policy: Optional[dict] = None,
) -> Tuple[dict, dict]:
    """FP32 (params, state) -> QAT-ready (params', {}) with 'fq' markers.

    Folds BN, calibrates per-layer input ranges (one pass over
    calibration_batches), and attaches a FakeQuant static leaf per quantizable
    layer. skip_first_layer / skip_last_layer / layer_policy follow the same
    semantics as static.quantize (an explicit layer_policy entry wins over
    the skip flags); any policy value other than 'qat' leaves the layer in
    fp32 for both training and bake.
    """
    params, state = fold_model_jit(params, state)
    act_qparams = jax.device_get(
        static.calibrate(
            apply_fn, params, state, calibration_batches, observer=observer
        )
    )
    last = last_layer_path(params)
    first = first_layer_path(params)

    def q(path: str, layer: dict) -> dict:
        action = resolve_policy(path, "qat", layer_policy)
        explicit = bool(layer_policy) and (
            path in layer_policy or path.rsplit("/", 1)[-1] in layer_policy
        )
        if action != "qat" or (
            not explicit
            and (
                (skip_last_layer and path == last)
                or (skip_first_layer and path == first)
            )
        ):
            return dict(layer)
        out = dict(layer)
        scale, zp = act_qparams[path]
        out["fq"] = FakeQuant(float(scale), int(zp), per_channel)
        return out

    return walk_layers(params, q), state


@jax.jit
def bake(qat_params: dict) -> dict:
    """QAT tree -> deployable static-INT8 tree (same structure as
    static.quantize output: QTensor weights, ActQuant input domains, wsum
    zero-point corrections). Layers without 'fq' stay fp32. One jitted device
    program for the whole bake (same rationale as static._bake)."""

    def q(path: str, layer: dict) -> dict:
        fq = layer.get("fq")
        if fq is None:
            return dict(layer)
        out = {k: v for k, v in layer.items() if k != "fq"}
        qw = quantize_weight(layer["w"], fq.per_channel)
        out["w"] = qw
        out["aq"] = ActQuant(
            scale=jnp.asarray(fq.scale, jnp.float32),
            zero_point=jnp.asarray(fq.zero_point, jnp.int32),
        )
        out["wsum"] = weight_colsum(qw)
        return out

    return walk_layers(qat_params, q)
