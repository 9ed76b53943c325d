"""Learned rounding (AdaRound-style) refinement for quantized weight trees.

Round-to-nearest is not the rounding that minimizes *task* error: at 4 bits the
rounding residual is the dominant quantization error, and flipping a small
fraction of weights to the other side of the grid point recovers a large share
of the lost accuracy (Nagel et al., "Up or Down? Adaptive Rounding for
Post-Training Quantization", ICML 2020 — the technique AIMET ships as its
standard PTQ accuracy tool, PAPERS.md). The reference never had anything like
this (its PTQ schemes don't even calibrate — SURVEY.md behavior notes 2-3);
this module is a beyond-reference accuracy pass for the framework's sub-byte
tiers (weight_only_int4 / W4A8), where nearest rounding measurably loses
~0.9pt on the CIFAR track (docs/results_tpu_v5e/NOTE.md).

Objective: the paper's LAYER-LOCAL reconstruction — each layer's soft-rounded
output against its own fp32 output on captured calibration activations — NOT
the network-level logits MSE. Round 3 shipped the network-level variant and
measured it *negative* on chip (−0.30pt int4 / −0.08pt w4a8, docs/PERF.md):
with every layer's rounding free at once, the end-to-end objective lets early
layers absorb late layers' errors on the tiny calibration set and generalizes
worse than round-to-nearest. The layer-local objective is convex-ish per layer
(the op is linear in the weight; relu is the only nonlinearity) and matches
what AIMET/the paper actually optimize.

TPU-native formulation: all layers still optimize JOINTLY IN ONE jitted
program — their objectives are independent, so the sum of per-layer
reconstruction losses runs as a single device step over the whole rounding
pytree (one compile total, vs the paper's one optimization program per
layer). Inputs come from the model's capture hook with each op's static spec
(models record ("conv"|"linear", stride, padding, activation) into the
"__specs__" side-channel); tiers that quantize activations at deployment
(static/W4A8) reconstruct from the SAME input-quantized activations
(fake-quant through the layer's frozen ActQuant), isolating exactly the
rounding error the deployed graph will see. Each weight can move at most
1 LSB (floor vs ceil), so a few hundred steps on a few hundred calibration
examples suffice; the rectified-sigmoid regularizer anneals every soft
choice to a hard 0/1 by the end.

The refined tree keeps its exact artifact contract: same QTensor scales /
zero-points / group metadata (only `values` change, by at most 1), `wsum`
zero-point corrections recomputed where present, nibble-packing untouched.
"""
from __future__ import annotations

from functools import partial
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from quantnet.core.quantize import dequantize, quantize_affine, sym_max
from quantnet.core.types import ActQuant, QTensor
from quantnet.quantize.common import walk_layers, weight_colsum
from quantnet.quantize.fold import fold_model_jit

# Rectified-sigmoid stretch (Nagel et al. 2020, eq. 23): h(v) spans [0, 1]
# with flat saturation zones so the regularizer can pin choices hard.
GAMMA, ZETA = -0.1, 1.1
_EPS = 1e-4


def _rect_sigmoid(v: jax.Array) -> jax.Array:
    return jnp.clip(jax.nn.sigmoid(v) * (ZETA - GAMMA) + GAMMA, 0.0, 1.0)


def _rect_sigmoid_inv(h: jax.Array) -> jax.Array:
    h = jnp.clip(h, _EPS, 1.0 - _EPS)
    p = (h - GAMMA) / (ZETA - GAMMA)
    return jnp.log(p) - jnp.log1p(-p)


def _scale_full(qt: QTensor) -> jax.Array:
    """Dequant scale broadcast to the payload's full shape (handles scalar,
    per-channel, and group-wise scale layouts uniformly)."""
    if qt.group_size is not None:
        g = qt.group_size
        shape = qt.values.shape
        s = jnp.broadcast_to(qt.scale, (shape[0] // g, g, *shape[1:]))
        return s.reshape(shape)
    return jnp.broadcast_to(qt.scale, qt.values.shape)


def _refinable_paths(qparams: dict) -> list:
    paths = []

    def visit(path, layer):
        if isinstance(layer.get("w"), QTensor):
            paths.append(path)
        return layer

    walk_layers(qparams, visit)
    return sorted(paths)


@partial(jax.jit, static_argnames=("paths",))
def _init_rounding(qparams, fparams, paths):
    """Per-path (floor grid, initial rounding logits) from the fp32 weights
    and the frozen quantization scales."""
    floors, logits = {}, {}

    def collect(path, layer):
        if path in paths:
            qt = layer["w"]
            # fp32 source weight at the same path (trees share structure).
            node = fparams
            for k in path.split("/"):
                node = node[k]
            grid = node["w"].astype(jnp.float32) / _scale_full(qt)
            f = jnp.floor(grid)
            floors[path] = f
            logits[path] = _rect_sigmoid_inv(grid - f)
        return layer

    walk_layers(qparams, collect)
    return floors, logits


def _apply_spec(spec, layer: dict, x: jax.Array) -> jax.Array:
    """Re-apply one layer's op outside the model, from its captured spec."""
    from quantnet.ops.conv import conv2d
    from quantnet.ops.linear import linear

    kind, stride, padding, activation = spec
    if kind == "conv":
        return conv2d(
            layer, x, stride=stride, padding=padding, activation=activation
        )
    if kind == "dwconv":
        # Depthwise (quantnet/models/mobilenet.py): groups == input channels.
        return conv2d(
            layer, x, stride=stride, padding=padding, activation=activation,
            groups=x.shape[-1],
        )
    return linear(layer, x, activation=activation)


def refine(
    qparams: dict,
    qstate: dict,
    params: dict,
    state: dict,
    apply_fn,
    batches: Iterable,
    *,
    steps: int = 400,
    lr: float = 1e-2,
    reg_lambda: float = 0.01,
    beta_range: Tuple[float, float] = (20.0, 2.0),
    layer_filter: Optional[Tuple[str, ...]] = None,
    max_examples: int = 512,
) -> Tuple[dict, dict]:
    """Refine an already-quantized tree's weight rounding on calibration data.

    qparams/qstate: output of weight_only.quantize / static.quantize|bake —
    any tree whose quantized layers carry QTensor weights (int8 or sub-byte,
    per-tensor / per-channel / group-wise all supported).
    params/state: the ORIGINAL fp32 tree the quantized one was derived from
    (BN is re-folded here so paths align).
    batches: calibration batches (same contract as static.calibrate). Each
    refined layer's fp32 input activations on these are captured ONCE and
    stay device-resident for the optimization (memory ~ 2x the summed layer
    activation footprint per example; `max_examples` caps it).
    layer_filter: optional subset of layer paths to refine (default: all
    QTensor-weight layers).

    Returns a tree identical to qparams except for the int payload values
    (each moved by at most 1 LSB) and recomputed `wsum` corrections.
    """
    fparams, fstate = fold_model_jit(params, state)
    paths = tuple(
        p for p in _refinable_paths(qparams)
        if layer_filter is None or p in layer_filter
    )
    if not paths:
        return qparams, qstate

    floors, logits = _init_rounding(qparams, fparams, paths)

    # Static per-path constants (closed over, not traced per step).
    scales, maxes, aqs, fp_layers = {}, {}, {}, {}

    def grab(path, layer):
        if path in paths:
            qt = layer["w"]
            scales[path] = _scale_full(qt)
            maxes[path] = sym_max(qt.bits)
            aq = layer.get("aq")
            aqs[path] = aq if isinstance(aq, ActQuant) else None
        return layer

    walk_layers(qparams, grab)

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
        raise ValueError("refine() needs at least one calibration batch")

    # Static op specs via the capture side-channel (an eval_shape trace:
    # array captures become tracers we ignore, spec tuples are plain python).
    spec_cap = {"__specs__": {}}
    jax.eval_shape(
        lambda p, s, x: apply_fn(p, s, x, capture=spec_cap)[0],
        fparams, fstate, xs_in[0],
    )
    specs = spec_cap["__specs__"]
    missing = [p for p in paths if p not in specs]
    if missing:
        raise ValueError(
            f"model did not record op specs for {missing}; layer-local "
            "refinement needs the '__specs__' capture side-channel "
            "(see quantnet/models/resnet.py::_conv_bn)"
        )

    @jax.jit
    def grab_acts(x):
        """One fp32 forward -> per-layer (input, target output).

        Tiers that quantize activations at deployment (frozen ActQuant)
        reconstruct from the input-quantized activations — both lanes see
        x-hat, so the objective isolates exactly the weight-rounding error.
        """
        cap = {}
        apply_fn(fparams, fstate, x, capture=cap)
        xs, ys = {}, {}
        for p in paths:
            xi = cap[p]
            aq = aqs[p]
            if aq is not None:
                xi = dequantize(
                    quantize_affine(xi, aq.scale, aq.zero_point),
                    aq.scale, aq.zero_point,
                )
            xs[p] = xi
            ys[p] = _apply_spec(specs[p], fp_layers[p], xi)
        return xs, ys

    acts = [grab_acts(x) for x in xs_in]

    tx = optax.adam(lr)
    opt_state = tx.init(logits)

    @jax.jit
    def step(logits, opt_state, xs, ys, beta):
        def loss_fn(logits):
            recon = 0.0
            reg = 0.0
            for p in paths:
                soft = floors[p] + _rect_sigmoid(logits[p])
                layer = dict(fp_layers[p])
                layer["w"] = jnp.clip(soft, -maxes[p], maxes[p]) * scales[p]
                pred = _apply_spec(specs[p], layer, xs[p])
                # Per-layer normalization so deep/wide layers don't drown
                # the rest of the sum (the joint step optimizes independent
                # objectives; normalization only balances step sizes).
                recon = recon + jnp.mean(jnp.square(pred - ys[p])) / (
                    jnp.mean(jnp.square(ys[p])) + 1e-8
                )
                h = _rect_sigmoid(logits[p])
                reg = reg + jnp.mean(1.0 - jnp.abs(2.0 * h - 1.0) ** beta)
            return recon + reg_lambda * reg, recon

        (_, recon), grads = jax.value_and_grad(loss_fn, has_aux=True)(logits)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(logits, updates), opt_state, recon

    b0, b1 = beta_range
    for i in range(steps):
        # Annealed regularizer sharpness: soft exploration early, hard 0/1
        # pinning late (geometric schedule, matching the paper's intent).
        beta = b0 * (b1 / b0) ** (i / max(steps - 1, 1))
        xs, ys = acts[i % len(acts)]
        logits, opt_state, _ = step(
            logits, opt_state, xs, ys, jnp.float32(beta)
        )

    return _bake(qparams, qstate, floors, logits, tuple(paths))


@partial(jax.jit, static_argnames=("paths",))
def _bake(qparams, qstate, floors, logits, paths):
    def bake(path, layer):
        if path not in paths:
            return layer
        out = dict(layer)
        qt = layer["w"]
        m = sym_max(qt.bits)
        # Tie behavior, documented: an exact 0.5 fraction bakes UP (>=),
        # whereas the nearest-rounding quantizer uses jnp.round (half-to-
        # even), so the two can differ on exact grid midpoints. Midpoints
        # are measure-zero in float weight data; the steps=0
        # round-to-nearest equivalence holds for all non-tie values.
        hard = (_rect_sigmoid(logits[path]) >= 0.5).astype(jnp.float32)
        values = jnp.clip(floors[path] + hard, -m, m).astype(jnp.int8)
        qw = qt.replace(values=values)
        out["w"] = qw
        if "wsum" in out:
            out["wsum"] = weight_colsum(qw)
        return out

    return walk_layers(qparams, bake), qstate
