"""Learned-rounding (AdaRound-style) refinement: quantnet/quantize/adaround.py.

Oracle strategy (SURVEY.md section 4 pattern): the refinement must (a) be a
no-op at steps=0 (initial soft rounding == round-to-nearest), (b) never move
any weight more than 1 LSB, (c) keep the artifact metadata (scales, group
layout, wsum correction) exactly consistent, and (d) measurably reduce the
quantized model's output error on the calibration objective.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantnet.core.types import QTensor
from quantnet.quantize import adaround, static, weight_only
from quantnet.quantize.common import walk_layers, weight_colsum


def tiny_init(rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    params = {
        "conv1": {
            "w": jax.random.normal(k1, (3, 3, 3, 8), jnp.float32) * 0.3,
            "b": jnp.zeros((8,), jnp.float32),
        },
        "fc": {
            # K=128 so the group-wise (g=64) path is exercised.
            "w": jax.random.normal(k2, (128, 6), jnp.float32) * 0.3,
            "b": jax.random.normal(k3, (6,), jnp.float32) * 0.05,
        },
    }
    return params, {}


def tiny_apply(params, state, x, *, train=False, rng=None, capture=None):
    from quantnet.ops.conv import conv2d
    from quantnet.ops.linear import linear

    sp = capture.get("__specs__") if capture is not None else None
    if capture is not None:
        capture["conv1"] = x
        if sp is not None:
            sp["conv1"] = ("conv", 1, "SAME", "relu")
    x = conv2d(params["conv1"], x, stride=1, padding="SAME", activation="relu")
    x = x.reshape(x.shape[0], -1)  # 4*4*8 = 128
    if capture is not None:
        capture["fc"] = x
        if sp is not None:
            sp["fc"] = ("linear", None, None, None)
    return linear(params["fc"], x), state


def calib_batches(n=4, bs=16, seed=7):
    rng = jax.random.PRNGKey(seed)
    return [
        (jax.random.normal(k, (bs, 4, 4, 3), jnp.float32), None)
        for k in jax.random.split(rng, n)
    ]


def qtensors(tree):
    out = {}

    def grab(path, layer):
        if isinstance(layer.get("w"), QTensor):
            out[path] = layer["w"]
        return layer

    walk_layers(tree, grab)
    return out


def logit_mse(qp, qs, fp, fs, batches):
    err = 0.0
    for x, _ in batches:
        yq, _ = tiny_apply(qp, qs, x)
        yf, _ = tiny_apply(fp, fs, x)
        err += float(jnp.mean(jnp.square(yq - yf)))
    return err / len(batches)


def test_scale_full_matches_dequantize_contract():
    """_scale_full must reproduce QTensor.dequantize's scale broadcasting for
    every scale layout (per-tensor, per-channel, group-wise)."""
    from quantnet.core.quantize import (
        quantize_symmetric, quantize_symmetric_grouped,
    )

    rng = jax.random.PRNGKey(5)
    w2 = jax.random.normal(rng, (128, 6), jnp.float32)
    w4 = jax.random.normal(rng, (3, 3, 8, 16), jnp.float32)
    for qt in (
        quantize_symmetric(w2, axis=None),
        quantize_symmetric(w2, axis=1),
        quantize_symmetric(w4, axis=3),
        quantize_symmetric_grouped(w2, 32, bits=4),
    ):
        via_full = qt.values.astype(jnp.float32) * adaround._scale_full(qt)
        np.testing.assert_allclose(
            np.asarray(via_full), np.asarray(qt.dequantize()), rtol=1e-6
        )


def test_rect_sigmoid_inverse_roundtrip():
    h = jnp.linspace(0.01, 0.99, 23)
    back = adaround._rect_sigmoid(adaround._rect_sigmoid_inv(h))
    np.testing.assert_allclose(np.asarray(back), np.asarray(h), atol=1e-5)


def test_steps_zero_is_round_to_nearest():
    params, state = tiny_init(jax.random.PRNGKey(0))
    qp, qs = weight_only.quantize(
        params, state, bits=4, group_size=64, skip_last_layer=False
    )
    rp, _ = adaround.refine(
        qp, qs, params, state, tiny_apply, calib_batches(1), steps=0
    )
    before, after = qtensors(qp), qtensors(rp)
    assert set(before) == set(after) == {"conv1", "fc"}
    for path in before:
        np.testing.assert_array_equal(
            np.asarray(before[path].values), np.asarray(after[path].values)
        )
        # Metadata untouched.
        assert after[path].bits == before[path].bits
        assert after[path].group_size == before[path].group_size
        np.testing.assert_array_equal(
            np.asarray(before[path].scale), np.asarray(after[path].scale)
        )


def test_refined_values_within_one_lsb_and_in_range():
    params, state = tiny_init(jax.random.PRNGKey(1))
    qp, qs = weight_only.quantize(
        params, state, bits=4, group_size=64, skip_last_layer=False
    )
    rp, _ = adaround.refine(
        qp, qs, params, state, tiny_apply, calib_batches(), steps=40
    )
    before, after = qtensors(qp), qtensors(rp)
    for path in before:
        b = np.asarray(before[path].values, np.int32)
        a = np.asarray(after[path].values, np.int32)
        assert np.abs(a - b).max() <= 1
        assert a.min() >= -7 and a.max() <= 7


def test_refine_reduces_output_error_int4():
    params, state = tiny_init(jax.random.PRNGKey(2))
    batches = calib_batches(4)
    qp, qs = weight_only.quantize(
        params, state, bits=4, group_size=64, skip_last_layer=False
    )
    rp, rs = adaround.refine(
        qp, qs, params, state, tiny_apply, batches, steps=120, lr=2e-2
    )
    mse_nearest = logit_mse(qp, qs, params, state, batches)
    mse_refined = logit_mse(rp, rs, params, state, batches)
    assert mse_refined < mse_nearest, (mse_refined, mse_nearest)
    # Held-out batches: the 1-LSB hypothesis space shouldn't overfit.
    held = calib_batches(2, seed=99)
    assert logit_mse(rp, rs, params, state, held) < logit_mse(
        qp, qs, params, state, held
    )


def test_refine_static_tree_keeps_wsum_consistent():
    params, state = tiny_init(jax.random.PRNGKey(3))
    batches = calib_batches(2)
    qp, qs = static.quantize(
        params, state, tiny_apply, batches,
        weight_bits=4, weight_group_size=64,
    )
    rp, _ = adaround.refine(
        qp, qs, params, state, tiny_apply, batches, steps=30
    )

    def check(path, layer):
        if isinstance(layer.get("w"), QTensor) and "wsum" in layer:
            np.testing.assert_array_equal(
                np.asarray(layer["wsum"]),
                np.asarray(weight_colsum(layer["w"])),
            )
            # ActQuant untouched by refinement.
            qlayer = qp
            for k in path.split("/"):
                qlayer = qlayer[k]
            np.testing.assert_array_equal(
                np.asarray(layer["aq"].scale), np.asarray(qlayer["aq"].scale)
            )
        return layer

    walk_layers(rp, check)


def test_refine_reduces_output_error_w4a8():
    """Layer-local objective on a static (input-quantized) tree: the
    reconstruction runs from the SAME fake-quantized inputs the deployed
    graph sees, and must still reduce the quantized model's output error."""
    params, state = tiny_init(jax.random.PRNGKey(6))
    batches = calib_batches(4)
    qp, qs = static.quantize(
        params, state, tiny_apply, batches,
        weight_bits=4, weight_group_size=64,
    )
    rp, rs = adaround.refine(
        qp, qs, params, state, tiny_apply, batches, steps=120, lr=2e-2
    )
    mse_nearest = logit_mse(qp, qs, params, state, batches)
    mse_refined = logit_mse(rp, rs, params, state, batches)
    assert mse_refined < mse_nearest, (mse_refined, mse_nearest)


def test_layer_filter_restricts_refinement():
    params, state = tiny_init(jax.random.PRNGKey(4))
    batches = calib_batches(2)
    qp, qs = weight_only.quantize(
        params, state, bits=4, group_size=64, skip_last_layer=False
    )
    rp, _ = adaround.refine(
        qp, qs, params, state, tiny_apply, batches, steps=60, lr=5e-2,
        layer_filter=("fc",),
    )
    before, after = qtensors(qp), qtensors(rp)
    np.testing.assert_array_equal(
        np.asarray(before["conv1"].values), np.asarray(after["conv1"].values)
    )


def test_refine_full_convnet_smoke():
    """End-to-end on the real SimpleConvNet tree (BN folding path included)."""
    from quantnet.models import convnet

    params, state = convnet.init(jax.random.PRNGKey(0), image_size=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3), jnp.float32)
    qp, qs = weight_only.quantize(params, state, bits=4, group_size=128)
    rp, rs = adaround.refine(
        qp, qs, params, state, convnet.apply, [(x, None)], steps=3
    )
    y, _ = convnet.apply(rp, rs, x)
    assert y.shape == (8, 10)
    assert np.isfinite(np.asarray(y)).all()
