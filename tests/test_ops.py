"""Kernel-level correctness: every int8 op path vs the fp32/fake-quant oracle.

Every compute path in quantnet/ops (weight-only, dynamic, static; linear and
conv) is validated against an fp32 matmul/conv over fake-quantized operands —
the backend-independent oracle of SURVEY.md section 7 step 3.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantnet.core.quantize import (
    affine_qparams,
    fake_quantize_affine,
    fake_quantize_symmetric,
    quantize_symmetric,
)
from quantnet.core.types import ActQuant, DynamicActQuant
from quantnet.ops.conv import _im2col, conv2d
from quantnet.ops.linear import linear
from quantnet.quantize.common import weight_colsum


def _mk_linear(rng, k=64, n=32, bias=True):
    kw, kb = jax.random.split(rng)
    w = jax.random.normal(kw, (k, n)) * 0.1
    b = jax.random.normal(kb, (n,)) if bias else None
    layer = {"w": w}
    if bias:
        layer["b"] = b
    return layer


def _mk_conv(rng, kh=3, kw=3, ci=8, co=16, bias=True):
    k1, k2 = jax.random.split(rng)
    w = jax.random.normal(k1, (kh, kw, ci, co)) * 0.1
    layer = {"w": w}
    if bias:
        layer["b"] = jax.random.normal(k2, (co,))
    return layer


class TestLinearPaths:
    def test_fp32(self, rng):
        layer = _mk_linear(rng)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
        y = linear(layer, x)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x @ layer["w"] + layer["b"]), rtol=1e-5
        )

    def test_weight_only_matches_fakequant_oracle(self, rng):
        layer = _mk_linear(rng)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
        qlayer = dict(layer, w=quantize_symmetric(layer["w"], axis=1))
        y = linear(qlayer, x)
        oracle = x @ fake_quantize_symmetric(layer["w"], axis=1) + layer["b"]
        np.testing.assert_allclose(np.asarray(y), np.asarray(oracle), rtol=1e-4, atol=1e-5)

    def test_dynamic_matches_fakequant_oracle(self, rng):
        layer = _mk_linear(rng)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
        qlayer = dict(
            layer, w=quantize_symmetric(layer["w"], axis=1), aq=DynamicActQuant()
        )
        y = linear(qlayer, x)
        # oracle: fake-quantize both operands (per-row x, per-col w), fp32 matmul
        fx = fake_quantize_symmetric(x, axis=0)
        fw = fake_quantize_symmetric(layer["w"], axis=1)
        oracle = fx @ fw + layer["b"]
        np.testing.assert_allclose(np.asarray(y), np.asarray(oracle), rtol=1e-3, atol=1e-4)

    def test_static_matches_fakequant_oracle(self, rng):
        layer = _mk_linear(rng)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 64)) + 0.5
        scale, zp = affine_qparams(jnp.min(x), jnp.max(x))
        qw = quantize_symmetric(layer["w"], axis=1)
        qlayer = dict(
            layer, w=qw, aq=ActQuant(scale=scale, zero_point=zp), wsum=weight_colsum(qw)
        )
        y = linear(qlayer, x)
        fx = fake_quantize_affine(x, scale, zp)
        fw = fake_quantize_symmetric(layer["w"], axis=1)
        oracle = fx @ fw + layer["b"]
        np.testing.assert_allclose(np.asarray(y), np.asarray(oracle), rtol=1e-3, atol=1e-4)

    def test_relu_fused(self, rng):
        layer = _mk_linear(rng)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
        y = linear(layer, x, activation="relu")
        assert float(jnp.min(y)) >= 0.0

    def test_jit_traces_once_per_variant(self, rng):
        layer = _mk_linear(rng)
        qlayer = dict(layer, w=quantize_symmetric(layer["w"], axis=1))
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
        f = jax.jit(linear)
        np.testing.assert_allclose(
            np.asarray(f(qlayer, x)), np.asarray(linear(qlayer, x)), rtol=1e-5
        )


class TestIm2col:
    @pytest.mark.parametrize("stride", [1, 2])
    def test_matches_conv(self, rng, stride):
        x = jax.random.normal(rng, (2, 8, 8, 4))
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 4, 6))
        patches = _im2col(x, 3, 3, stride)
        y = patches.reshape(-1, 3 * 3 * 4) @ w.reshape(-1, 6)
        n, ho, wo, _ = patches.shape
        y = y.reshape(n, ho, wo, 6)
        ref = jax.lax.conv_general_dilated(
            x, w, (stride, stride), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-4)

    def test_int8_dtype_preserved(self, rng):
        x = (jax.random.normal(rng, (1, 6, 6, 2)) * 10).astype(jnp.int8)
        patches = _im2col(x, 3, 3, 1)
        assert patches.dtype == jnp.int8


class TestConvPaths:
    def _oracle_conv(self, x, w, b, stride=1):
        y = jax.lax.conv_general_dilated(
            x, w, (stride, stride), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return y + b if b is not None else y

    def test_fp32(self, rng):
        layer = _mk_conv(rng)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8))
        y = conv2d(layer, x)
        ref = self._oracle_conv(x, layer["w"], layer["b"])
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-5)

    def test_weight_only_oracle(self, rng):
        layer = _mk_conv(rng)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8))
        qlayer = dict(layer, w=quantize_symmetric(layer["w"], axis=3))
        y = conv2d(qlayer, x)
        ref = self._oracle_conv(x, fake_quantize_symmetric(layer["w"], axis=3), layer["b"])
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-3, atol=1e-4)

    @pytest.mark.parametrize("stride", [1, 2])
    def test_dynamic_oracle(self, rng, stride):
        layer = _mk_conv(rng)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8))
        qlayer = dict(layer, w=quantize_symmetric(layer["w"], axis=3), aq=DynamicActQuant())
        y = conv2d(qlayer, x, stride=stride)
        fx = fake_quantize_symmetric(x, axis=None)
        fw = fake_quantize_symmetric(layer["w"], axis=3)
        ref = jax.lax.conv_general_dilated(
            fx, fw, (stride, stride), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + layer["b"]
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-3, atol=1e-3)

    @pytest.mark.parametrize("stride", [1, 2])
    def test_static_oracle_with_zero_point_padding(self, rng, stride):
        """The hard case: asymmetric input quant + SAME padding. fp32 zeros at
        the border must behave identically in the int8 domain (zp padding +
        wsum correction)."""
        layer = _mk_conv(rng)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8)) + 1.0
        scale, zp = affine_qparams(jnp.min(x), jnp.max(x))
        qw = quantize_symmetric(layer["w"], axis=3)
        qlayer = dict(
            layer, w=qw, aq=ActQuant(scale=scale, zero_point=zp), wsum=weight_colsum(qw)
        )
        y = conv2d(qlayer, x, stride=stride)
        fx = fake_quantize_affine(x, scale, zp)
        fw = fake_quantize_symmetric(layer["w"], axis=3)
        ref = jax.lax.conv_general_dilated(
            fx, fw, (stride, stride), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + layer["b"]
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-3, atol=1e-3)

    def test_conv_backends_agree(self, rng):
        """Backend cross-check: native XLA int8 conv, im2col+int8 GEMM and the
        f32-emulated path must agree (the first two bitwise — exact integer
        arithmetic; emulate within fp rounding)."""
        from quantnet.core import config as cfg

        layer = _mk_conv(rng)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8))
        qlayer = dict(layer, w=quantize_symmetric(layer["w"], axis=3), aq=DynamicActQuant())
        old = cfg.flags.int8_conv_backend
        results = {}
        try:
            for backend in ("xla", "im2col", "emulate"):
                cfg.flags.int8_conv_backend = backend
                results[backend] = conv2d(qlayer, x)
        finally:
            cfg.flags.int8_conv_backend = old
        np.testing.assert_allclose(
            np.asarray(results["xla"]), np.asarray(results["im2col"]),
            rtol=1e-6, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(results["xla"]), np.asarray(results["emulate"]),
            rtol=1e-4, atol=1e-4,
        )

    def test_matmul_backends_agree(self, rng):
        from quantnet.core import config as cfg
        from quantnet.ops.linear import linear

        layer = _mk_linear(rng)
        x = jax.random.normal(jax.random.PRNGKey(1), (16, 64))
        qlayer = dict(layer, w=quantize_symmetric(layer["w"], axis=1), aq=DynamicActQuant())
        old = cfg.flags.int8_matmul_backend
        results = {}
        try:
            for backend in ("xla", "emulate"):
                cfg.flags.int8_matmul_backend = backend
                results[backend] = linear(qlayer, x)
        finally:
            cfg.flags.int8_matmul_backend = old
        np.testing.assert_allclose(
            np.asarray(results["xla"]), np.asarray(results["emulate"]),
            rtol=1e-4, atol=1e-4,
        )


class TestInt8Handoff:
    """Static-path int8 tensor handoff: producer-side requantization must be
    exactly the consumer-side quantization of the same f32 output."""

    def test_conv_out_quant_exact(self, rng):
        import jax

        from quantnet.core.quantize import quantize_affine, quantize_symmetric
        from quantnet.core.types import ActQuant
        from quantnet.ops.conv import conv2d

        k1, k2 = jax.random.split(rng)
        x = jax.random.normal(k1, (2, 8, 8, 8))
        w = jax.random.normal(k2, (3, 3, 8, 16)) * 0.1
        aq = ActQuant(scale=jnp.float32(0.05), zero_point=jnp.int32(3))
        oq = ActQuant(scale=jnp.float32(0.02), zero_point=jnp.int32(-5))
        qw = quantize_symmetric(w, axis=3)
        from quantnet.quantize.common import weight_colsum

        layer = {"w": qw, "b": jnp.zeros((16,)), "aq": aq, "wsum": weight_colsum(qw)}
        f32_out = conv2d(layer, x, activation="relu")
        chained = conv2d(layer, x, activation="relu", out_quant=oq)
        assert chained.dtype == jnp.int8
        expect = quantize_affine(f32_out, oq.scale, oq.zero_point)
        np.testing.assert_array_equal(np.asarray(chained), np.asarray(expect))

    def test_conv_accepts_prequantized_input(self, rng):
        import jax

        from quantnet.core.quantize import quantize_affine, quantize_symmetric
        from quantnet.core.types import ActQuant
        from quantnet.ops.conv import conv2d
        from quantnet.quantize.common import weight_colsum

        k1, k2 = jax.random.split(rng)
        x = jax.random.normal(k1, (2, 8, 8, 8))
        w = jax.random.normal(k2, (3, 3, 8, 16)) * 0.1
        aq = ActQuant(scale=jnp.float32(0.05), zero_point=jnp.int32(3))
        qw = quantize_symmetric(w, axis=3)
        layer = {"w": qw, "b": jnp.zeros((16,)), "aq": aq, "wsum": weight_colsum(qw)}
        from_f32 = conv2d(layer, x)
        from_int8 = conv2d(layer, quantize_affine(x, aq.scale, aq.zero_point))
        np.testing.assert_allclose(
            np.asarray(from_f32), np.asarray(from_int8), rtol=1e-6, atol=1e-6
        )

    def test_static_convnet_uses_handoff_and_matches(self, rng):
        """Model-level: the chained static forward stays within quantization
        noise of fp32, and the chain plan covers every edge."""
        import jax

        from quantnet.models import convnet
        from quantnet.models.convnet import QUANT_LAYERS, _chain_plan
        from quantnet.quantize import static

        params, state = convnet.init(rng)
        x = jax.random.normal(jax.random.PRNGKey(5), (8, 32, 32, 3))
        qp, qs = static.quantize(params, state, convnet.apply, [(x, None)])
        plan = _chain_plan(qp)
        assert set(plan) == set(QUANT_LAYERS[:-1])
        ref, _ = convnet.apply(params, state, x, train=False)
        got, _ = convnet.apply(qp, qs, x, train=False)
        err = float(jnp.sqrt(jnp.mean((got - ref) ** 2)))
        assert err < 0.5, err


class TestGroupedConv:
    """Grouped/depthwise convs (feature_group_count — quantnet/models/
    mobilenet.py): every quant path against the fp32/fake-quant oracle."""

    def _mk_dw(self, rng, c=16, bias=True):
        k1, k2 = jax.random.split(rng)
        layer = {"w": jax.random.normal(k1, (3, 3, 1, c)) * 0.2}
        if bias:
            layer["b"] = jax.random.normal(k2, (c,))
        return layer

    def _oracle(self, x, w, b, stride=1, groups=1):
        y = jax.lax.conv_general_dilated(
            x, w, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )
        return y + b if b is not None else y

    def test_fp32_depthwise(self, rng):
        layer = self._mk_dw(rng)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))
        y = conv2d(layer, x, groups=16)
        ref = self._oracle(x, layer["w"], layer["b"], groups=16)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-5)

    def test_relu6(self, rng):
        layer = self._mk_dw(rng)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16)) * 20
        y = conv2d(layer, x, groups=16, activation="relu6")
        ref = jnp.clip(self._oracle(x, layer["w"], layer["b"], groups=16), 0.0, 6.0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-5)
        assert float(jnp.max(y)) <= 6.0 and float(jnp.min(y)) >= 0.0

    @pytest.mark.parametrize("stride", [1, 2])
    def test_static_depthwise_oracle(self, rng, stride):
        """Asymmetric input quant + SAME zero-point padding + wsum correction
        on a grouped conv — each output channel's correction term spans only
        its own group's reduction."""
        layer = self._mk_dw(rng)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16)) + 1.0
        scale, zp = affine_qparams(jnp.min(x), jnp.max(x))
        qw = quantize_symmetric(layer["w"], axis=3)
        qlayer = dict(
            layer, w=qw, aq=ActQuant(scale=scale, zero_point=zp),
            wsum=weight_colsum(qw),
        )
        y = conv2d(qlayer, x, stride=stride, groups=16)
        fx = fake_quantize_affine(x, scale, zp)
        fw = fake_quantize_symmetric(layer["w"], axis=3)
        ref = self._oracle(fx, fw, layer["b"], stride=stride, groups=16)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-3, atol=1e-3)

    def test_dynamic_depthwise_oracle(self, rng):
        layer = self._mk_dw(rng)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))
        qlayer = dict(
            layer, w=quantize_symmetric(layer["w"], axis=3), aq=DynamicActQuant()
        )
        y = conv2d(qlayer, x, groups=16)
        fx = fake_quantize_symmetric(x, axis=None)
        fw = fake_quantize_symmetric(layer["w"], axis=3)
        ref = self._oracle(fx, fw, layer["b"], groups=16)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-3, atol=1e-3)

    def test_grouped_nondepthwise(self, rng):
        """groups strictly between 1 and C (grouped, not depthwise)."""
        k1, k2 = jax.random.split(rng)
        layer = {
            "w": jax.random.normal(k1, (3, 3, 4, 16)) * 0.2,
            "b": jax.random.normal(k2, (16,)),
        }
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))
        y = conv2d(layer, x, groups=4)
        ref = self._oracle(x, layer["w"], layer["b"], groups=4)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-5)

    def test_grouped_backends_agree(self, rng):
        """Grouped convs force XLA's native path even when im2col/pallas is
        selected (block-diagonal GEMM would be pure overhead); xla and
        emulate must agree."""
        from quantnet.core import config as cfg

        layer = self._mk_dw(rng)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))
        qlayer = dict(
            layer, w=quantize_symmetric(layer["w"], axis=3), aq=DynamicActQuant()
        )
        old = cfg.flags.int8_conv_backend
        results = {}
        try:
            for backend in ("xla", "im2col", "emulate"):
                cfg.flags.int8_conv_backend = backend
                results[backend] = conv2d(qlayer, x, groups=16)
        finally:
            cfg.flags.int8_conv_backend = old
        np.testing.assert_allclose(
            np.asarray(results["xla"]), np.asarray(results["im2col"]),
            rtol=1e-6, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(results["xla"]), np.asarray(results["emulate"]),
            rtol=1e-4, atol=1e-4,
        )

    def test_weight_only_grouped_jit_matches_eager(self, rng):
        """Regression: on the v5e/axon stack a grouped conv whose weight
        operand was an in-graph s8->f32 convert of a program input compiled
        to NaN under jit (eager fine, dense fine) — quantnet/ops/conv.py
        barriers the converted weights for groups > 1. CPU pins jit/eager
        parity through the barriered path; the on-chip pin is the
        weight_only row of docs/results_tpu_v5e_mobilenet_224."""
        layer = self._mk_dw(rng)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))
        qlayer = dict(layer, w=quantize_symmetric(layer["w"], axis=3))
        eager = conv2d(qlayer, x, groups=16, activation="relu6")
        jitted = jax.jit(
            lambda l, x: conv2d(l, x, groups=16, activation="relu6")
        )(qlayer, x)
        assert np.isfinite(np.asarray(jitted)).all()
        np.testing.assert_allclose(
            np.asarray(jitted), np.asarray(eager), rtol=1e-5, atol=1e-5
        )
