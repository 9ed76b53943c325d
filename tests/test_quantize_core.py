"""Unit tests: quantize/dequantize primitives and observers.

Systematizes the reference's only numeric check — the FP32-vs-INT8
mean-abs-diff of static_ptq_model.py:78-95 — into proper tolerance-bounded
round-trip and oracle tests (SURVEY.md section 4, pattern to adopt).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantnet.core import observers, quantize
from quantnet.core.types import QTensor, tree_nbytes


class TestSymmetric:
    def test_roundtrip_error_bounded(self, rng):
        x = jax.random.normal(rng, (64, 128))
        qt = quantize.quantize_symmetric(x)
        err = jnp.max(jnp.abs(qt.dequantize() - x))
        # max quantization error is scale/2
        assert float(err) <= float(qt.scale) / 2 + 1e-7

    def test_per_channel_tighter_than_per_tensor(self, rng):
        # scale one column up 100x: per-channel must adapt, per-tensor cannot
        x = jax.random.normal(rng, (64, 8))
        x = x.at[:, 3].mul(100.0)
        pt = quantize.quantize_symmetric(x, axis=None)
        pc = quantize.quantize_symmetric(x, axis=1)
        err_pt = jnp.mean(jnp.abs(pt.dequantize() - x))
        err_pc = jnp.mean(jnp.abs(pc.dequantize() - x))
        assert float(err_pc) < float(err_pt) / 5

    def test_int8_range(self, rng):
        x = jax.random.normal(rng, (32, 32)) * 1000
        qt = quantize.quantize_symmetric(x)
        assert qt.values.dtype == jnp.int8
        assert int(jnp.max(jnp.abs(qt.values.astype(jnp.int32)))) <= 127

    def test_zero_input(self):
        qt = quantize.quantize_symmetric(jnp.zeros((8, 8)))
        assert np.all(np.asarray(qt.values) == 0)
        assert np.isfinite(float(qt.scale))


class TestAffine:
    def test_zero_exactly_representable(self, rng):
        x = jax.random.uniform(rng, (128,), minval=0.0, maxval=5.0)
        scale, zp = quantize.affine_qparams(jnp.min(x), jnp.max(x))
        q0 = quantize.quantize_affine(jnp.zeros(()), scale, zp)
        deq0 = quantize.dequantize(q0, scale, zp)
        assert float(jnp.abs(deq0)) < 1e-6

    def test_roundtrip(self, rng):
        x = jax.random.uniform(rng, (256,), minval=-2.0, maxval=7.0)
        scale, zp = quantize.affine_qparams(jnp.min(x), jnp.max(x))
        q = quantize.quantize_affine(x, scale, zp)
        err = jnp.max(jnp.abs(quantize.dequantize(q, scale, zp) - x))
        assert float(err) <= float(scale) / 2 + 1e-6

    def test_relu_range_uses_full_grid(self, rng):
        # post-ReLU activations: min=0 -> zero_point should sit at -128
        x = jax.random.uniform(rng, (256,), minval=0.0, maxval=4.0)
        scale, zp = quantize.affine_qparams(jnp.zeros(()), jnp.max(x))
        assert int(zp) == -128


class TestDynamic:
    def test_per_row_scales(self, rng):
        x = jax.random.normal(rng, (4, 64))
        x = x.at[2].mul(50.0)
        q, s = quantize.dynamic_quantize(x, axis=0)
        assert s.shape == (4, 1)
        deq = quantize.dequantize(q, s)
        assert float(jnp.max(jnp.abs(deq - x))) <= float(jnp.max(s)) / 2 + 1e-5

    def test_jit_fuses(self, rng):
        x = jax.random.normal(rng, (8, 8))
        f = jax.jit(lambda x: quantize.dynamic_quantize(x, axis=None))
        q, s = f(x)
        q2, s2 = quantize.dynamic_quantize(x, axis=None)
        np.testing.assert_array_equal(np.asarray(q), np.asarray(q2))


class TestFakeQuantOracle:
    def test_fake_quant_matches_real_dequant(self, rng):
        x = jax.random.normal(rng, (32, 16))
        fq = quantize.fake_quantize_symmetric(x, axis=1)
        qt = quantize.quantize_symmetric(x, axis=1)
        np.testing.assert_allclose(np.asarray(fq), np.asarray(qt.dequantize()), rtol=1e-6)


class TestObservers:
    @pytest.mark.parametrize("kind", ["minmax", "moving_average", "histogram"])
    def test_observer_covers_data(self, rng, kind):
        obs = observers.make_observer(kind)
        batches = [jax.random.normal(jax.random.PRNGKey(i), (64,)) * 3 for i in range(8)]
        for b in batches:
            obs = obs.update(b)
        scale, zp = obs.qparams()
        allx = jnp.concatenate(batches)
        q = quantize.quantize_affine(allx, scale, zp)
        deq = quantize.dequantize(q, scale, zp)
        # coarse coverage bound: mean error small relative to data std
        assert float(jnp.mean(jnp.abs(deq - allx))) < 0.15 * float(jnp.std(allx))

    def test_observer_update_jits(self, rng):
        obs = observers.make_observer("minmax")
        step = jax.jit(lambda o, x: o.update(x))
        for i in range(4):
            obs = step(obs, jax.random.normal(jax.random.PRNGKey(i), (128,)))
        scale, zp = obs.qparams()
        assert np.isfinite(float(scale))

    def test_histogram_clips_outliers(self, rng):
        obs = observers.make_observer("histogram", percentile=0.99)
        x = jax.random.normal(rng, (10000,))
        x = x.at[0].set(1e4)  # one enormous outlier
        obs = obs.update(x)
        scale, _ = obs.qparams()
        mm = observers.make_observer("minmax").update(x)
        mm_scale, _ = mm.qparams()
        assert float(scale) < float(mm_scale) / 100


class TestTreeNbytes:
    def test_counts_packed_int8(self, rng):
        w = jax.random.normal(rng, (128, 64))
        fp = {"w": w}
        q = {"w": quantize.quantize_symmetric(w, axis=1)}
        assert tree_nbytes(q) < tree_nbytes(fp) / 3.5  # ~4x compression


class TestMSEObserver:
    def test_covers_bulk_and_beats_minmax_under_outliers(self, rng):
        """With a heavy outlier, the MSE-optimal clip should choose a tighter
        range than minmax, giving lower quantization MSE over the data."""
        import jax

        from quantnet.core.observers import make_observer
        from quantnet.core.quantize import fake_quantize_affine

        x = jax.random.normal(rng, (8192,))
        x = x.at[0].set(100.0)  # outlier

        mm = make_observer("minmax").update(x)
        mse_obs = make_observer("mse").update(x)
        s_mm, z_mm = mm.qparams()
        s_mse, z_mse = mse_obs.qparams()
        err_mm = float(jnp.mean((fake_quantize_affine(x, s_mm, z_mm) - x) ** 2))
        err_mse = float(jnp.mean((fake_quantize_affine(x, s_mse, z_mse) - x) ** 2))
        assert err_mse < err_mm

    def test_clean_data_close_to_minmax(self, rng):
        from quantnet.core.observers import make_observer

        x = jax.random.normal(rng, (4096,))
        s_mse, _ = make_observer("mse").update(x).qparams()
        s_mm, _ = make_observer("minmax").update(x).qparams()
        assert 0.3 < float(s_mse) / float(s_mm) <= 1.01

    def test_update_jits_and_scheme_works_end_to_end(self, rng):
        import jax

        from quantnet.models import convnet
        from quantnet.quantize import static

        params, state = convnet.init(rng)
        x = jax.random.normal(jax.random.PRNGKey(2), (8, 32, 32, 3))
        qp, qs = static.quantize(
            params, state, convnet.apply, [(x, None)], observer="mse"
        )
        got, _ = convnet.apply(qp, qs, x, train=False)
        ref, _ = convnet.apply(params, state, x, train=False)
        err = float(jnp.sqrt(jnp.mean((got - ref) ** 2)))
        assert err < 0.5


class TestModelOrderPaths:
    """first/last_layer_path must be robust to dict-order canonicalization:
    jit sorts dict pytree keys, so any tree that round-tripped through a
    jitted transform (fold_model_jit output included) iterates
    alphabetically — which once made skip_last_layer on a ResNet tree skip
    'layer4/1/conv2' instead of 'fc' (the sorted-order last path)."""

    def test_resnet_sorted_tree_first_last(self):
        import jax

        from quantnet.models import resnet
        from quantnet.quantize.common import first_layer_path, last_layer_path

        params, _ = resnet.init(jax.random.PRNGKey(0), num_classes=10, depth=18)
        sorted_tree = {k: params[k] for k in sorted(params)}
        assert first_layer_path(sorted_tree) == "conv1"
        assert last_layer_path(sorted_tree) == "fc"

    def test_skip_last_layer_inside_jit_skips_fc(self):
        """The live bug: weight_only's jitted transform saw the sorted tree."""
        import jax

        from quantnet.core.types import QTensor
        from quantnet.models import resnet
        from quantnet.quantize import weight_only

        params, state = resnet.init(jax.random.PRNGKey(0), num_classes=10, depth=18)
        qp, _ = weight_only.quantize(params, state, skip_last_layer=True)
        assert not isinstance(qp["fc"]["w"], QTensor)
        assert isinstance(qp["layer4"]["1"]["conv2"]["w"], QTensor)

    def test_mobilenet_first_is_stem_not_block0(self):
        import jax

        from quantnet.models import mobilenet
        from quantnet.quantize.common import first_layer_path, last_layer_path

        params, _ = mobilenet.init(jax.random.PRNGKey(0), num_classes=10)
        sorted_tree = {k: params[k] for k in sorted(params)}
        assert first_layer_path(sorted_tree) == "conv_stem"
        assert last_layer_path(sorted_tree) == "fc"

    def test_natural_numeric_order(self):
        from quantnet.quantize.common import _model_order_key

        assert _model_order_key("block2/dw") < _model_order_key("block10/dw")
        assert _model_order_key("conv_stem") < _model_order_key("conv1")
        assert _model_order_key("layer4/2/conv3") < _model_order_key("fc")
        assert _model_order_key("conv_head") < _model_order_key("fc")
