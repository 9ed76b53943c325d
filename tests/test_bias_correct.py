"""Empirical bias correction (quantnet/quantize/bias_correct.py).

Weight quantization skews each channel's expected response; the correction
must (a) change ONLY bias leaves, (b) remove the measured per-channel mean
shift on held-out data, (c) not hurt the end-to-end quantized forward.
"""
import jax
import jax.numpy as jnp
import numpy as np

from quantnet.models import convnet
from quantnet.quantize import weight_only
from quantnet.quantize.bias_correct import bias_correct


def _calib(seed, n=64):
    return [(jax.random.normal(jax.random.PRNGKey(seed), (n, 32, 32, 3)), None)]


def test_only_bias_changes():
    params, state = convnet.init(jax.random.PRNGKey(0))
    qp, qs = weight_only.quantize(params, state, bits=4, group_size=128)
    cp, cs = bias_correct(
        qp, qs, params, state, convnet.apply, _calib(1)
    )
    for name in ("conv1", "conv4", "fc1"):
        np.testing.assert_array_equal(
            np.asarray(qp[name]["w"].values), np.asarray(cp[name]["w"].values)
        )
        np.testing.assert_array_equal(
            np.asarray(qp[name]["w"].scale), np.asarray(cp[name]["w"].scale)
        )
        assert not np.allclose(
            np.asarray(qp[name]["b"]), np.asarray(cp[name]["b"])
        )
    # fp32 classifier untouched (not a QTensor layer)
    np.testing.assert_array_equal(
        np.asarray(qp["fc2"]["b"]), np.asarray(cp["fc2"]["b"])
    )


def test_mean_shift_removed_per_layer():
    """The real bias shift lives at post-ReLU layers (their inputs have a
    strongly positive mean, so the weight-quantization error has a
    deterministic per-channel expectation — a zero-mean-input layer like
    conv1 has nothing to correct). After correction, conv2's output mean
    shift ON HELD-OUT DATA collapses."""
    from quantnet.ops.conv import conv2d
    from quantnet.quantize.fold import fold_model_jit

    params, state = convnet.init(jax.random.PRNGKey(2))
    qp, qs = weight_only.quantize(params, state, per_channel=False, bits=4)
    cp, _ = bias_correct(qp, qs, params, state, convnet.apply, _calib(3, 128))
    fparams, fstate = fold_model_jit(params, state)
    x_heldout = jax.random.normal(jax.random.PRNGKey(99), (128, 32, 32, 3))
    cap = {}
    convnet.apply(fparams, fstate, x_heldout, capture=cap)
    xi = cap["conv2"]  # post-ReLU: positive-mean input

    def shift(layer):
        err = conv2d(layer, xi) - conv2d(fparams["conv2"], xi)
        return np.asarray(jnp.mean(err, axis=(0, 1, 2)))

    before = shift(qp["conv2"])
    after = shift(cp["conv2"])
    assert np.abs(before).mean() > 1e-4  # the shift is real
    assert np.abs(after).mean() < 0.35 * np.abs(before).mean(), (
        np.abs(before).mean(), np.abs(after).mean()
    )


def test_end_to_end_error_not_worse():
    params, state = convnet.init(jax.random.PRNGKey(4))
    qp, qs = weight_only.quantize(params, state, bits=4, group_size=128)
    cp, cs = bias_correct(qp, qs, params, state, convnet.apply, _calib(5))
    x = jax.random.normal(jax.random.PRNGKey(6), (32, 32, 32, 3))
    ref, _ = convnet.apply(params, state, x)
    mse_q = float(jnp.mean((convnet.apply(qp, qs, x)[0] - ref) ** 2))
    mse_c = float(jnp.mean((convnet.apply(cp, cs, x)[0] - ref) ** 2))
    assert mse_c <= mse_q * 1.05, (mse_q, mse_c)


def test_cli_bias_correct_flag(tmp_path):
    from quantnet.cli.main import main

    save = str(tmp_path / "saved")
    common = ["--save-dir", save, "--synthetic-train-size", "64",
              "--synthetic-test-size", "64", "--batch-size", "32"]
    main(["train", "--epochs", "0", *common])
    main(["quantize", "--scheme", "weight_only_int4",
          "--calibration-batches", "1", "--bias-correct", *common])
    import os

    assert os.path.exists(os.path.join(save, "weight_only_int4.npz"))
