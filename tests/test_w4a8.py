"""W4A8 tier: 4-bit group-wise weights inside the static int8-activation path.

Round-3 capability closing the "size OR speed" split of the pure weight-only
int4 tier (docs/PERF.md): the grouped static linear path runs the same
s8 x s8 -> s32 MXU GEMM as static INT8, with the group-wise dequant folded
into the combine-over-groups epilogue and the zero-point correction kept
per group. Oracle pattern per SURVEY.md section 7 step 3: every path is
validated against the dequantize-and-compute-in-f32 reference.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantnet.core.quantize import (
    affine_qparams,
    dequantize,
    quantize_affine,
    quantize_symmetric_grouped,
)
from quantnet.core.types import ActQuant, DynamicActQuant, QTensor, tree_nbytes
from quantnet.ops.conv import conv2d
from quantnet.ops.linear import linear
from quantnet.quantize import static
from quantnet.quantize.common import quantize_weight, weight_colsum
from quantnet.train import checkpoint as ckpt


def _frozen_aq(x):
    scale, zp = affine_qparams(jnp.min(x), jnp.max(x))
    return ActQuant(scale=scale, zero_point=zp)


class TestGroupedStaticLinear:
    def test_matches_dequant_oracle(self, rng):
        kw, kx = jax.random.split(rng)
        w = jax.random.normal(kw, (128, 24)) * 0.1
        b = jnp.arange(24, dtype=jnp.float32) * 0.01
        x = jax.random.normal(kx, (4, 128))
        qt = quantize_symmetric_grouped(w, group_size=32, bits=4)
        aq = _frozen_aq(x)
        layer = {"w": qt, "b": b, "aq": aq, "wsum": weight_colsum(qt)}
        y = linear(layer, x)
        # oracle: exactly the math the int8 path factorizes — affine-quantized
        # input, dequantized, against the group-dequantized weight
        xq = dequantize(quantize_affine(x, aq.scale, aq.zero_point),
                        aq.scale, aq.zero_point)
        oracle = xq @ qt.dequantize() + b
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(oracle), rtol=1e-4, atol=1e-5
        )

    def test_int8_input_handoff(self, rng):
        # A producer already requantized into this layer's domain: the grouped
        # path must consume raw int8 identically to quantizing f32 itself.
        kw, kx = jax.random.split(rng)
        w = jax.random.normal(kw, (64, 12)) * 0.2
        x = jax.random.normal(kx, (3, 64))
        qt = quantize_symmetric_grouped(w, group_size=16, bits=4)
        aq = _frozen_aq(x)
        layer = {"w": qt, "aq": aq, "wsum": weight_colsum(qt)}
        y_f32 = linear(layer, x)
        y_int8 = linear(layer, quantize_affine(x, aq.scale, aq.zero_point))
        np.testing.assert_allclose(np.asarray(y_f32), np.asarray(y_int8),
                                   rtol=1e-6, atol=1e-6)

    def test_relu_and_out_quant_epilogue(self, rng):
        kw, kx = jax.random.split(rng)
        w = jax.random.normal(kw, (32, 8))
        x = jax.random.normal(kx, (5, 32))
        qt = quantize_symmetric_grouped(w, group_size=8, bits=4)
        aq = _frozen_aq(x)
        layer = {"w": qt, "aq": aq, "wsum": weight_colsum(qt)}
        oq = ActQuant(scale=jnp.float32(0.05), zero_point=jnp.int32(-100))
        y = linear(layer, x, activation="relu", out_quant=oq)
        assert y.dtype == jnp.int8
        xq = dequantize(quantize_affine(x, aq.scale, aq.zero_point),
                        aq.scale, aq.zero_point)
        oracle = quantize_affine(
            jax.nn.relu(xq @ qt.dequantize()), oq.scale, oq.zero_point
        )
        np.testing.assert_array_equal(np.asarray(y), np.asarray(oracle))

    def test_grouped_colsum_shape(self, rng):
        qt = quantize_symmetric_grouped(jax.random.normal(rng, (256, 10)),
                                        group_size=64, bits=4)
        ws = weight_colsum(qt)
        assert ws.shape == (4, 10) and ws.dtype == jnp.int32
        v = np.asarray(qt.values).astype(np.int64).reshape(4, 64, 10)
        np.testing.assert_array_equal(np.asarray(ws), v.sum(axis=1))


class TestGroupedGuards:
    def test_dynamic_grouped_raises(self, rng):
        qt = quantize_symmetric_grouped(jax.random.normal(rng, (64, 8)),
                                        group_size=16, bits=4)
        x = jnp.zeros((2, 64))
        with pytest.raises(NotImplementedError):
            linear({"w": qt, "aq": DynamicActQuant()}, x)

    def test_conv_grouped_raises(self, rng):
        # Hand-built grouped conv weight (quantize_weight never makes one):
        # must fail loudly, not silently mis-broadcast its (G,1,...) scale.
        w = jax.random.normal(rng, (4, 3, 3, 8))
        qt = QTensor(values=jnp.zeros((4, 3, 3, 8), jnp.int8),
                     scale=jnp.ones((2, 1, 3, 8)), zero_point=None,
                     axis=None, bits=4, group_size=2)
        with pytest.raises(NotImplementedError):
            conv2d({"w": qt}, jnp.zeros((1, 8, 8, 8)))
        del w

    def test_per_tensor_request_wins_over_group_size(self, rng):
        # ADVICE round-2: per_channel=False + group_size must mean per-tensor.
        qt = quantize_weight(jax.random.normal(rng, (128, 8)),
                             per_channel=False, bits=4, group_size=32)
        assert qt.group_size is None
        assert qt.scale.shape == ()


class TestW4A8Scheme:
    def _quantize(self, rng, **kw):
        from quantnet.models import convnet

        params, state = convnet.init(rng)
        calib = [jax.random.normal(jax.random.PRNGKey(1), (16, 32, 32, 3))]
        qp, qs = static.quantize(
            params, state, convnet.apply, calib,
            weight_bits=4, weight_group_size=128, **kw,
        )
        return convnet, params, state, qp, qs

    def test_structure(self, rng):
        convnet, params, state, qp, qs = self._quantize(rng)
        fc1 = qp["fc1"]["w"]
        assert isinstance(fc1, QTensor)
        assert fc1.bits == 4 and fc1.group_size == 128
        assert isinstance(qp["fc1"]["aq"], ActQuant)
        assert qp["fc1"]["wsum"].shape == (4096 // 128, 512)
        c1 = qp["conv1"]["w"]
        # convs: per-channel int4 fallback, still on the static int8 path
        assert c1.bits == 4 and c1.group_size is None
        assert isinstance(qp["conv1"]["aq"], ActQuant)
        assert int(jnp.max(jnp.abs(fc1.values))) <= 7

    def test_forward_runs_and_tracks_fp32(self, rng):
        convnet, params, state, qp, qs = self._quantize(rng)
        x = jax.random.normal(jax.random.PRNGKey(7), (8, 32, 32, 3))
        ref, _ = convnet.apply(params, state, x)
        got, _ = convnet.apply(qp, qs, x)
        assert got.shape == ref.shape
        assert bool(jnp.all(jnp.isfinite(got)))
        # same catastrophic-breakage bound as the int4 weight-only tier
        # (tests/test_int4.py): random-init nets compound 4-bit noise
        assert float(jnp.mean((ref - got) ** 2)) < 0.3 * float(jnp.mean(ref**2)) + 1e-3

    def test_size_below_static_int8(self, rng):
        convnet, params, state, qp, qs = self._quantize(rng)
        calib = [jax.random.normal(jax.random.PRNGKey(1), (16, 32, 32, 3))]
        qp8, _ = static.quantize(params, state, convnet.apply, calib)
        assert tree_nbytes(qp) < 0.62 * tree_nbytes(qp8)

    def test_artifact_roundtrip_bit_identical(self, tmp_path, rng):
        convnet, params, state, qp, qs = self._quantize(rng)
        path = os.path.join(str(tmp_path), "w4a8")
        ckpt.save_artifact(path, {"params": qp, "state": qs}, {"scheme": "w4a8"})
        # fc1 payload is nibble-packed on disk
        with np.load(path + ".npz") as z:
            packed = z["params.fc1.w#values"]
        assert packed.dtype == np.uint8
        assert packed.size == (4096 * 512 + 1) // 2
        loaded, _ = ckpt.load_artifact(path)
        x = jax.random.normal(jax.random.PRNGKey(9), (4, 32, 32, 3))
        y0, _ = convnet.apply(qp, qs, x)
        y1, _ = convnet.apply(loaded["params"], loaded["state"], x)
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    def test_weight_bits_validation(self, rng):
        from quantnet.models import convnet

        params, state = convnet.init(rng)
        with pytest.raises(ValueError):
            static.quantize(params, state, convnet.apply,
                            [jnp.zeros((2, 32, 32, 3))], weight_bits=5)
