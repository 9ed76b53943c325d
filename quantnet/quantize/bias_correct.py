"""Empirical bias correction for quantized trees (Nagel et al. 2019, §4.2).

Weight quantization is not zero-mean per output channel: clipping and
rounding skew each channel's expected response, shifting E[y_c] — a bias
error that batch-norm folding has already baked into the weights and that
accumulates layer by layer. The fix is analytic: measure the per-channel
expected error on calibration activations and subtract it from the layer
bias. With cross-layer equalization (quantize/equalize.py) and AdaRound
(quantize/adaround.py) this completes the standard data-free/calibration
PTQ toolbox the reference never had.

TPU-native formulation (shares adaround's machinery): ONE jitted capture
pass records every quantized layer's deployed-domain input (fake-quantized
through the layer's frozen ActQuant where present, so the measured shift is
exactly the weight-quantization error the deployed graph sees), then one
jitted correction program computes
    e_c = E_batch,spatial[ (q_layer(x) - fp32_layer(x))_c ]   (pre-activation)
and emits the same tree with b' = b - e. Only 'b' leaves change; QTensor
payloads, scales, wsum corrections and artifact packing are untouched.
"""
from __future__ import annotations

from typing import Iterable, Tuple

import jax
import jax.numpy as jnp

from quantnet.core.quantize import dequantize, quantize_affine
from quantnet.core.types import ActQuant, QTensor
from quantnet.quantize.fold import fold_model_jit
from quantnet.quantize.common import walk_layers


def _apply_linear_part(spec, layer: dict, x: jax.Array) -> jax.Array:
    """The layer's op WITHOUT its activation (bias shifts pre-activation)."""
    from quantnet.ops.conv import conv2d
    from quantnet.ops.linear import linear

    kind, stride, padding, _activation = spec
    if kind == "conv":
        return conv2d(layer, x, stride=stride, padding=padding)
    if kind == "dwconv":
        # Depthwise (quantnet/models/mobilenet.py): groups == input channels.
        return conv2d(
            layer, x, stride=stride, padding=padding, groups=x.shape[-1]
        )
    return linear(layer, x)


def bias_correct(
    qparams: dict,
    qstate: dict,
    params: dict,
    state: dict,
    apply_fn,
    batches: Iterable,
    *,
    max_examples: int = 512,
) -> Tuple[dict, dict]:
    """Quantized (qparams, qstate) -> same tree with corrected biases.

    params/state: the ORIGINAL fp32 tree the quantized one derives from
    (BN re-folded here, as in adaround.refine). batches: calibration
    batches (same contract as static.calibrate). Layers whose weights are
    not QTensor, or that have no bias, pass through unchanged.
    """
    fparams, fstate = fold_model_jit(params, state)

    paths = []

    def visit(path, layer):
        if isinstance(layer.get("w"), QTensor) and layer.get("b") is not None:
            paths.append(path)
        return layer

    walk_layers(qparams, visit)
    if not paths:
        return qparams, qstate
    paths = tuple(sorted(paths))

    q_layers, fp_layers, aqs = {}, {}, {}

    def grab_q(path, layer):
        if path in paths:
            q_layers[path] = layer
            aq = layer.get("aq")
            aqs[path] = aq if isinstance(aq, ActQuant) else None
        return layer

    walk_layers(qparams, grab_q)

    def grab_fp(path, layer):
        if path in paths:
            fp_layers[path] = layer
        return layer

    walk_layers(fparams, grab_fp)

    xs_in = []
    total = 0
    for batch in batches:
        x = batch[0] if isinstance(batch, (tuple, list)) else batch
        xs_in.append(x)
        total += x.shape[0]
        if total >= max_examples:
            break
    if not xs_in:
        raise ValueError("bias_correct() needs at least one calibration batch")

    # Static op specs via the capture side-channel (eval_shape — no FLOPs).
    spec_cap = {"__specs__": {}}
    jax.eval_shape(
        lambda p, s, x: apply_fn(p, s, x, capture=spec_cap)[0],
        fparams, fstate, xs_in[0],
    )
    specs = spec_cap["__specs__"]
    missing = [p for p in paths if p not in specs]
    if missing:
        raise ValueError(
            f"model did not record op specs for {missing}; bias correction "
            "needs the '__specs__' capture side-channel"
        )

    @jax.jit
    def shift_sums(x):
        """Per-layer (sum over batch+spatial of per-channel error, count)."""
        cap = {}
        apply_fn(fparams, fstate, x, capture=cap)
        sums, counts = {}, {}
        for p in paths:
            xi = cap[p]
            aq = aqs[p]
            if aq is not None:
                # deployed-domain input: both lanes see x-hat, isolating the
                # weight-quantization shift (adaround's convention)
                xi = dequantize(
                    quantize_affine(xi, aq.scale, aq.zero_point),
                    aq.scale, aq.zero_point,
                )
            # strip the bias from both lanes (it cancels in the difference)
            q_l = {k: v for k, v in q_layers[p].items() if k != "b"}
            f_l = {k: v for k, v in fp_layers[p].items() if k != "b"}
            err = _apply_linear_part(specs[p], q_l, xi) - _apply_linear_part(
                specs[p], f_l, xi
            )
            red = tuple(range(err.ndim - 1))
            sums[p] = jnp.sum(err, axis=red)
            counts[p] = err.size // err.shape[-1]
        return sums, counts

    tot_sum = {p: 0.0 for p in paths}
    tot_n = {p: 0 for p in paths}
    for x in xs_in:
        s, c = shift_sums(x)
        for p in paths:
            tot_sum[p] = tot_sum[p] + s[p]
            tot_n[p] = tot_n[p] + c[p]

    @jax.jit
    def apply_corrections(qparams, shifts):
        def q(path, layer):
            if path not in shifts:
                return layer
            out = dict(layer)
            out["b"] = layer["b"] - shifts[path]
            return out

        return walk_layers(qparams, q)

    shifts = {p: tot_sum[p] / tot_n[p] for p in paths}
    return apply_corrections(qparams, shifts), qstate
