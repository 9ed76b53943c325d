"""Numerics sanitizers: the jit-purity / debug-nans CI job promised in
SURVEY.md section 5 (the reference had no sanitizers at all).

Every quantized forward and a full train step run under jax_debug_nans — any
NaN produced anywhere in the compiled graphs raises immediately.
"""
import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantnet.models import convnet
from quantnet.quantize import dynamic, static, weight_only


@contextlib.contextmanager
def debug_nans():
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)


@pytest.fixture(scope="module")
def model():
    params, state = convnet.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 32, 32, 3), jnp.float32)
    return params, state, x


def test_quantized_forwards_nan_free(model):
    params, state, x = model
    schemes = {
        "dynamic": dynamic.quantize(params, state),
        "static": static.quantize(params, state, convnet.apply, [(x, None)]),
        "weight_only": weight_only.quantize(params, state),
    }
    with debug_nans():
        for name, (qp, qs) in schemes.items():
            logits, _ = jax.jit(
                lambda p, s, x: convnet.apply(p, s, x, train=False)
            )(qp, qs, x)
            assert np.isfinite(np.asarray(logits)).all(), name


def test_train_step_nan_free(model):
    from quantnet.core.config import TrainConfig
    from quantnet.train.trainer import make_optimizer, make_train_step

    params, state, x = model
    labels = jnp.zeros((16,), jnp.int32)
    cfg = TrainConfig(epochs=1, batch_size=16, lr=0.1)
    tx, _ = make_optimizer(cfg, steps_per_epoch=1)
    step = make_train_step(convnet.apply, tx)
    carry = (params, state, tx.init(params))
    with debug_nans():
        carry, loss, acc = step(carry, jax.random.PRNGKey(2), x, labels)
    assert np.isfinite(float(loss))


def test_zero_input_quantization_does_not_nan():
    """All-zero calibration/activation ranges must not divide by zero."""
    params, state = convnet.init(jax.random.PRNGKey(0))
    x = jnp.zeros((4, 32, 32, 3), jnp.float32)
    with debug_nans():
        qp, qs = static.quantize(params, state, convnet.apply, [(x, None)])
        logits, _ = convnet.apply(qp, qs, x, train=False)
        assert np.isfinite(np.asarray(logits)).all()
        dp, ds = dynamic.quantize(params, state)
        logits, _ = convnet.apply(dp, ds, x, train=False)
        assert np.isfinite(np.asarray(logits)).all()


def test_profiler_trace_writes_artifacts(tmp_path, model):
    from quantnet.bench.profiling import annotate, trace

    params, state, x = model
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        with annotate("eval:fp32"):
            logits, _ = jax.jit(
                lambda p, s, x: convnet.apply(p, s, x, train=False)
            )(params, state, x)
            logits.block_until_ready()
    import os

    found = []
    for root, _dirs, files in os.walk(logdir):
        found += files
    assert found, "profiler trace should write event files"
