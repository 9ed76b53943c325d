"""Cross-layer equalization (quantnet/quantize/equalize.py).

The data-free PTQ range-rebalancing pass (Nagel et al. 2019): must be
function-preserving in eval mode, must actually equalize per-channel weight
ranges, and must repair the per-tensor-quantization collapse that
pathological per-channel spread causes (the same failure mode the on-chip
QAT collapse demo constructs — CLE fixes it with no data and no training).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantnet.models import convnet, resnet
from quantnet.quantize.equalize import cross_layer_equalize, detect_pairs
from quantnet.quantize.fold import fold_model_jit


def _randomize_bn(state, rng):
    """Non-trivial BN stats so folding actually moves weight ranges."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    keys = jax.random.split(rng, len(leaves))
    out = [
        l + 0.3 * jax.random.normal(k, l.shape) if l.ndim else l
        for l, k in zip(leaves, keys)
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


class TestFunctionPreservation:
    def test_convnet_logits_unchanged(self):
        params, state = convnet.init(jax.random.PRNGKey(0))
        state = _randomize_bn(state, jax.random.PRNGKey(1))
        x = jax.random.normal(jax.random.PRNGKey(2), (8, 32, 32, 3))
        ref, _ = convnet.apply(*fold_model_jit(params, state), x)
        eq_p, eq_s = cross_layer_equalize(params, state)
        got, _ = convnet.apply(eq_p, eq_s, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3
        )

    def test_resnet18_logits_unchanged(self):
        params, state = resnet.init(
            jax.random.PRNGKey(3), num_classes=10, depth=18
        )
        state = _randomize_bn(state, jax.random.PRNGKey(4))
        x = jax.random.normal(jax.random.PRNGKey(5), (4, 64, 64, 3))
        ref, _ = resnet.apply(*fold_model_jit(params, state), x)
        eq_p, eq_s = cross_layer_equalize(params, state)
        got, _ = resnet.apply(eq_p, eq_s, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3
        )


class TestPairDetection:
    def test_convnet_chain(self):
        params, _ = convnet.init(jax.random.PRNGKey(0))
        pairs = detect_pairs(params)
        assert ("conv1", "conv2", "conv") in pairs
        assert ("conv6", "fc1", "fc_flat") in pairs
        assert ("fc1", "fc2", "fc") in pairs
        assert len(pairs) == 7

    def test_resnet_intra_block_only(self):
        params, _ = resnet.init(jax.random.PRNGKey(0), depth=50)
        pairs = detect_pairs(params)
        assert ("layer1/0/conv1", "layer1/0/conv2", "conv") in pairs
        assert ("layer1/0/conv2", "layer1/0/conv3", "conv") in pairs
        # residual joins are never crossed
        for a, b, _k in pairs:
            assert "downsample" not in a and "downsample" not in b
            assert not a.startswith("conv1")  # stem excluded
        # bottleneck: 2 pairs per block, (3+4+6+3) blocks
        assert len(pairs) == 2 * 16


class TestEqualization:
    def test_ranges_equalized(self):
        params, state = convnet.init(jax.random.PRNGKey(6))
        # skew conv2's channels hard (function-preserving would need the
        # inverse on conv3 — irrelevant here, we only check the ranges)
        f = jnp.logspace(-2, 1, 64)
        params["conv2"]["w"] = params["conv2"]["w"] * f
        eq_p, _ = cross_layer_equalize(params, state, iterations=3)
        w1, w2 = eq_p["conv2"]["w"], eq_p["conv3"]["w"]
        r1 = jnp.max(jnp.abs(w1.reshape(-1, 64)), axis=0)
        r2 = jnp.max(jnp.abs(w2), axis=(0, 1, 3))
        # Chain sweeps interfere (the NEXT pair rescales conv3's output
        # channels, moving its input-axis ranges), so pairwise ranges are
        # balanced-to-within-a-factor, not exactly equal; the quantization-
        # relevant invariant is that the injected 1000x per-channel spread
        # collapses and neither side is left holding it.
        ratio = np.asarray(r1 / r2)
        assert ratio.max() / ratio.min() < 10, ratio
        for r in (r1, r2):
            spread = float(jnp.max(r) / jnp.min(r))
            assert spread < 40, spread  # from the injected 1000x spread

    def test_repairs_per_tensor_collapse(self):
        """The pathological per-channel rescale (relu positive homogeneity:
        conv channel c scaled by f_c, the consuming fc rows divided by f_c
        — fp32-identical) collapses per-TENSOR weight quantization; CLE
        restores it with no data and no training."""
        from quantnet.core.quantize import quantize_symmetric

        k1, k2, kx = jax.random.split(jax.random.PRNGKey(7), 3)
        w_conv = jax.random.normal(k1, (3, 3, 3, 16)) * 0.2
        w_fc = jax.random.normal(k2, (16, 4)) * 0.3
        f = jnp.logspace(-2, 1, 16)
        params = {
            "conv1": {"w": w_conv * f, "b": jnp.zeros((16,))},
            "fc": {"w": w_fc / f[:, None], "b": jnp.zeros((4,))},
        }
        x = jax.random.normal(kx, (16, 16, 16, 3))

        def fwd(p, xs):
            from quantnet.ops.conv import conv2d
            from quantnet.ops.linear import linear

            h = conv2d(p["conv1"], xs, stride=2, padding="SAME",
                       activation="relu")
            return linear(p["fc"], h.mean(axis=(1, 2)))

        def per_tensor_quant(p):
            return {
                name: {**layer, "w": quantize_symmetric(
                    layer["w"], axis=None
                ).dequantize()}
                for name, layer in p.items()
            }

        ref = fwd(params, x)
        mse_collapsed = float(jnp.mean((fwd(per_tensor_quant(params), x) - ref) ** 2))
        eq_p, _ = cross_layer_equalize(
            params, {}, pairs=(("conv1", "fc", "fc"),), iterations=2
        )
        np.testing.assert_allclose(  # CLE itself is function-preserving
            np.asarray(fwd(eq_p, x)), np.asarray(ref), rtol=1e-4, atol=1e-5
        )
        mse_equalized = float(jnp.mean((fwd(per_tensor_quant(eq_p), x) - ref) ** 2))
        assert mse_equalized < mse_collapsed / 10, (
            mse_collapsed, mse_equalized
        )


def test_quantize_cli_equalize_flag(tmp_path):
    from quantnet.cli.main import main

    save = str(tmp_path / "saved")
    common = ["--save-dir", save, "--synthetic-train-size", "64",
              "--synthetic-test-size", "64", "--batch-size", "32"]
    main(["train", "--epochs", "0", *common])
    main(["quantize", "--scheme", "static", "--calibration-batches", "1",
          "--per-tensor", "--equalize", *common])
    import os

    assert os.path.exists(os.path.join(save, "static.npz"))
