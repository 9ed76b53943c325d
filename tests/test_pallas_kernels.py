"""Pallas kernel correctness in interpreter mode (CPU-runnable).

The kernels' compiled path runs on real TPU (exercised by
scripts/tpu_backend_sweep.py and the pallas backend flag); interpret mode
checks the same kernel logic against the XLA reference on any host — the
correctness oracle pattern from SURVEY.md section 4.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from quantnet.ops.pallas_matmul import dynamic_int8_matmul_fused, int8_matmul_pallas


@pytest.fixture(scope="module")
def int8_operands():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.randint(k1, (48, 200), -127, 128, jnp.int8)
    w = jax.random.randint(k2, (200, 136), -127, 128, jnp.int8)
    return x, w


def test_int8_matmul_matches_xla(int8_operands):
    x, w = int8_operands
    ref = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    with pltpu.force_tpu_interpret_mode():
        got = int8_matmul_pallas(x, w)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_int8_matmul_tile_padding_exact():
    """Shapes far from tile multiples must still be exact (zero padding is
    exact in integer arithmetic)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.randint(k1, (7, 33), -127, 128, jnp.int8)
    w = jax.random.randint(k2, (33, 5), -127, 128, jnp.int8)
    ref = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    with pltpu.force_tpu_interpret_mode():
        got = int8_matmul_pallas(x, w)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_dynamic_matmul_close_to_oracle():
    """Oracle = the unfused dynamic path (quantize per row over full K, int8
    GEMM, rescale). With one K-block the fused kernel computes the same thing;
    differences are float rounding only."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(k1, (32, 256), jnp.float32)
    w = jax.random.normal(k2, (256, 128), jnp.float32)
    from quantnet.core.quantize import dynamic_quantize, quantize_symmetric

    qw = quantize_symmetric(w, axis=1)
    bias = jnp.linspace(-1, 1, 128, dtype=jnp.float32)
    qx, x_scale = dynamic_quantize(x, axis=0)
    acc = jax.lax.dot_general(
        qx, qw.values, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    ref = acc.astype(jnp.float32) * (x_scale * qw.scale) + bias
    with pltpu.force_tpu_interpret_mode():
        got = dynamic_int8_matmul_fused(x, qw.values, qw.scale.reshape(-1), bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_fused_dynamic_matmul_multi_kblock():
    """Per-(row, K-block) scales differ from per-row scales — accuracy must be
    at least as good: compare both against the exact f32 product."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(k1, (16, 1024), jnp.float32)
    w = jax.random.normal(k2, (1024, 128), jnp.float32)
    from quantnet.core.quantize import dynamic_quantize, quantize_symmetric

    qw = quantize_symmetric(w, axis=1)
    zero = jnp.zeros((128,), jnp.float32)
    exact = x @ (qw.values.astype(jnp.float32) * qw.scale)
    with pltpu.force_tpu_interpret_mode():
        fused = dynamic_int8_matmul_fused(
            x, qw.values, qw.scale.reshape(-1), zero, block_k=256
        )
    qx, x_scale = dynamic_quantize(x, axis=0)
    acc = jax.lax.dot_general(
        qx, qw.values, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    unfused = acc.astype(jnp.float32) * (x_scale * qw.scale)
    err_fused = float(jnp.sqrt(jnp.mean((fused - exact) ** 2)))
    err_unfused = float(jnp.sqrt(jnp.mean((unfused - exact) ** 2)))
    assert err_fused <= err_unfused * 1.05  # finer-grained scales can't be worse


def _boundary_oracle(out, identity, id_scale, id_zp, aq):
    from quantnet.core.quantize import dequantize, quantize_affine

    ident = (
        dequantize(identity, id_scale, id_zp)
        if identity.dtype == jnp.int8
        else identity
    )
    return quantize_affine(jax.nn.relu(out + ident), aq.scale, aq.zero_point)


def test_residual_boundary_int8_identity_exact():
    """Fused boundary kernel == unfused dequant+add+relu+quantize, bit-exact
    (same f32 ops in the same order — docs/PERF.md headroom #3 kernel)."""
    from quantnet.core.types import ActQuant
    from quantnet.ops.pallas_boundary import residual_boundary

    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    out = jax.random.normal(k1, (2, 9, 9, 256), jnp.float32) * 3.0
    ident = jax.random.randint(k2, (2, 9, 9, 256), -128, 128, jnp.int8)
    id_scale, id_zp = jnp.float32(0.043), jnp.int32(-5)
    aq = ActQuant(scale=jnp.float32(0.061), zero_point=jnp.int32(-128))
    ref = _boundary_oracle(out, ident, id_scale, id_zp, aq)
    with pltpu.force_tpu_interpret_mode():
        got = residual_boundary(out, ident, id_scale, id_zp, aq)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_residual_boundary_f32_identity_exact():
    from quantnet.core.types import ActQuant
    from quantnet.ops.pallas_boundary import residual_boundary

    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    out = jax.random.normal(k1, (4, 7, 7, 512), jnp.float32)
    ident = jax.random.normal(k2, (4, 7, 7, 512), jnp.float32)
    aq = ActQuant(scale=jnp.float32(0.017), zero_point=jnp.int32(-100))
    ref = _boundary_oracle(out, ident, None, None, aq)
    with pltpu.force_tpu_interpret_mode():
        got = residual_boundary(out, ident, None, None, aq)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_resnet_boundary_backend_pallas_matches_xla(monkeypatch):
    """Whole-model: static-INT8 resnet18 logits with QUANTNET_BOUNDARY=pallas
    (interpret mode) match the default XLA boundary path."""
    from quantnet.core import config as cfg
    from quantnet.models import resnet
    from quantnet.quantize import static

    rng = jax.random.PRNGKey(0)
    params, state = resnet.init(rng, num_classes=10, depth=18)
    calib = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3), jnp.float32)
    qparams, qstate = static.quantize(params, state, resnet.apply, [(calib, None)])
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3), jnp.float32)

    ref_logits, _ = resnet.apply(qparams, qstate, x)
    monkeypatch.setattr(cfg.flags, "boundary_backend", "pallas")
    with pltpu.force_tpu_interpret_mode():
        got_logits, _ = resnet.apply(qparams, qstate, x)
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-5
    )
