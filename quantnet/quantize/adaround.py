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

TPU-native formulation: instead of the paper's layer-by-layer reconstruction
(which needs per-layer forward metadata and one optimization program per
layer), the rounding variables for EVERY quantized layer are optimized jointly
against the network output — one jitted train step over the whole params
pytree, the model's own apply() as the objective, soft-rounded weights
substituted functionally. Each weight can move at most 1 LSB (the rounding
choice is floor vs ceil), so the hypothesis space is tiny and a few hundred
steps on the calibration set suffice; the rectified-sigmoid regularizer anneals
every soft choice to a hard 0/1 by the end.

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

from quantnet.core.quantize import sym_max
from quantnet.core.types import QTensor
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


def _soft_params(fparams, floors, logits, scales, maxes):
    """fp32 tree with soft-rounded weights substituted at the refined paths."""

    def subst(path, layer):
        if path not in logits:
            return layer
        out = dict(layer)
        soft = floors[path] + _rect_sigmoid(logits[path])
        m = maxes[path]
        out["w"] = jnp.clip(soft, -m, m) * scales[path]
        return out

    return walk_layers(fparams, subst)


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
) -> Tuple[dict, dict]:
    """Refine an already-quantized tree's weight rounding on calibration data.

    qparams/qstate: output of weight_only.quantize / static.quantize|bake —
    any tree whose quantized layers carry QTensor weights (int8 or sub-byte,
    per-tensor / per-channel / group-wise all supported).
    params/state: the ORIGINAL fp32 tree the quantized one was derived from
    (BN is re-folded here so paths align).
    batches: calibration batches (same contract as static.calibrate); logits
    of the fp32 model on these are the reconstruction target.
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
    scales, maxes, qts = {}, {}, {}

    def grab(path, layer):
        if path in paths:
            qt = layer["w"]
            qts[path] = qt
            scales[path] = _scale_full(qt)
            maxes[path] = sym_max(qt.bits)
        return layer

    walk_layers(qparams, grab)

    xs = []
    for batch in batches:
        xs.append(batch[0] if isinstance(batch, (tuple, list)) else batch)
    if not xs:
        raise ValueError("refine() needs at least one calibration batch")

    @jax.jit
    def ref_logits(x):
        y, _ = apply_fn(fparams, fstate, x)
        return y

    ys = [ref_logits(x) for x in xs]

    tx = optax.adam(lr)
    opt_state = tx.init(logits)

    @jax.jit
    def step(logits, opt_state, x, y_ref, beta):
        def loss_fn(logits):
            sp = _soft_params(fparams, floors, logits, scales, maxes)
            y, _ = apply_fn(sp, fstate, x)
            recon = jnp.mean(jnp.square(y - y_ref))
            reg = 0.0
            for p in paths:
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
        k = i % len(xs)
        logits, opt_state, _ = step(
            logits, opt_state, xs[k], ys[k], jnp.float32(beta)
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
        hard = (_rect_sigmoid(logits[path]) > 0.5).astype(jnp.float32)
        values = jnp.clip(floors[path] + hard, -m, m).astype(jnp.int8)
        qw = qt.replace(values=values)
        out["w"] = qw
        if "wsum" in out:
            out["wsum"] = weight_colsum(qw)
        return out

    return walk_layers(qparams, bake), qstate
