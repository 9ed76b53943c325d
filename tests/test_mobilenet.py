"""MobileNetV2 family: depthwise-separable convs through every transform.

Beyond-reference generality (the reference stops at SimpleConvNet +
torchvision ResNet-50 — /root/reference/models/): MobileNetV2 exercises
grouped convs (feature_group_count), ReLU6 and linear-bottleneck residuals
against the pytree-generic quantization transforms, and is the original
target of cross-layer equalization (Nagel et al. 2019). Small spatial size
(64-96px) keeps CPU runtime sane; the architecture is identical at 224px.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantnet.core.types import QTensor
from quantnet.models import mobilenet
from quantnet.quantize import dynamic, fold, static, weight_only
from quantnet.quantize.common import first_layer_path, last_layer_path, layer_paths


@pytest.fixture(scope="module")
def model():
    return mobilenet.init(jax.random.PRNGKey(0), num_classes=10)


@pytest.fixture(scope="module")
def batch():
    return jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))


def _get(tree, path):
    node = tree
    for part in path.split("/"):
        node = node[part]
    return node


class TestMobileNetV2:
    def test_output_shape(self, model, batch):
        params, state = model
        logits, _ = mobilenet.apply(params, state, batch)
        assert logits.shape == (2, 10)

    def test_param_count(self, model):
        params, _ = model
        n = sum(x.size for x in jax.tree_util.tree_leaves(params))
        # torchvision mobilenet_v2: 3.50M at 1000 classes; 2.24M at 10
        assert 2.0e6 < n < 2.5e6, n

    def test_layer_paths_in_model_order(self, model):
        params, state = model
        fp, _ = fold.fold_model(params, state)
        paths = layer_paths(fp)
        # stem + block0 (dw+project) + 16 blocks x 3 + head + fc = 53
        assert len(paths) == 53
        assert first_layer_path(fp) == "conv_stem"
        assert last_layer_path(fp) == "fc"
        assert "block7/dw" in paths and "block16/project" in paths

    def test_block_structure(self, model):
        params, _ = model
        # block0 is the t=1 block: no expand
        assert "expand" not in params["block0"]
        assert "expand" in params["block1"]
        # depthwise kernel HWIO (3, 3, 1, C)
        assert params["block1"]["dw"]["w"].shape[:3] == (3, 3, 1)

    def test_fold_preserves_inference(self, model, batch):
        params, state = model
        ref, _ = mobilenet.apply(params, state, batch)
        fp, fs = fold.fold_model(params, state)
        got, _ = mobilenet.apply(fp, fs, batch)
        # 53 layers of f32 re-association noise; bounded relative to logits
        assert float(jnp.abs(got - ref).max()) < 0.05 * float(jnp.std(ref))

    def test_train_mode_updates_bn_state(self, model, batch):
        params, state = model
        _, new_state = mobilenet.apply(
            params, state, batch, train=True, rng=jax.random.PRNGKey(0)
        )
        changed = jax.tree_util.tree_map(
            lambda x, y: bool(jnp.any(x != y)), state, new_state
        )
        assert any(jax.tree_util.tree_leaves(changed))

    def test_jit_matches_eager_block_order(self, model, batch):
        """jit canonicalizes dict pytrees in sorted-key order (block10 before
        block2); the model must iterate blocks numerically under both."""
        params, state = model
        eager, _ = mobilenet.apply(params, state, batch)
        jitted = jax.jit(lambda p, s, x: mobilenet.apply(p, s, x)[0])(
            params, state, batch
        )
        np.testing.assert_allclose(
            np.asarray(jitted), np.asarray(eager), rtol=1e-4, atol=1e-4
        )

    def test_width_mult(self, model):
        params_half, state_half = mobilenet.init(
            jax.random.PRNGKey(0), num_classes=10, width_mult=0.5
        )
        n = sum(x.size for x in jax.tree_util.tree_leaves(params_half))
        nf = sum(x.size for x in jax.tree_util.tree_leaves(model[0]))
        assert n < 0.6 * nf
        logits, _ = mobilenet.apply(params_half, state_half, jnp.zeros((1, 64, 64, 3)))
        assert logits.shape == (1, 10)


class TestMobileNetQuant:
    def test_dynamic(self, model, batch):
        params, state = model
        qp, qs = dynamic.quantize(params, state, last_layer_name="fc")
        for p in layer_paths(qp):
            assert isinstance(_get(qp, p)["w"], QTensor), p
        ref, _ = mobilenet.apply(params, state, batch)
        got, _ = mobilenet.apply(qp, qs, batch)
        assert float(jnp.mean(jnp.abs(got - ref))) < 0.35 * float(jnp.std(ref))

    def test_static_with_calibration_and_handoff(self, model, batch):
        params, state = model
        qp, qs = static.quantize(
            params, state, mobilenet.apply, [(batch, None)], last_layer_name="fc"
        )
        for p in layer_paths(qp):
            assert "aq" in _get(qp, p), p
        ref, _ = mobilenet.apply(params, state, batch)
        got, _ = mobilenet.apply(qp, qs, batch)
        assert np.isfinite(np.asarray(got)).all()
        assert float(jnp.mean(jnp.abs(got - ref))) < 0.5 * float(jnp.std(ref))

    def test_static_jits(self, model, batch):
        """The full quantized forward (int8 handoff, grouped convs) traces and
        compiles as one program."""
        params, state = model
        qp, qs = static.quantize(
            params, state, mobilenet.apply, [(batch, None)], last_layer_name="fc"
        )
        eager, _ = mobilenet.apply(qp, qs, batch)
        jitted = jax.jit(lambda p, s, x: mobilenet.apply(p, s, x)[0])(qp, qs, batch)
        np.testing.assert_allclose(
            np.asarray(jitted), np.asarray(eager), rtol=1e-3, atol=1e-3
        )

    def test_weight_only_skip_head(self, model, batch):
        params, state = model
        qp, qs = weight_only.quantize(
            params, state, skip_last_layer=True, last_layer_name="fc"
        )
        assert not isinstance(qp["fc"]["w"], QTensor)
        assert isinstance(_get(qp, "block3/dw")["w"], QTensor)
        ref, _ = mobilenet.apply(params, state, batch)
        got, _ = mobilenet.apply(qp, qs, batch)
        assert float(jnp.mean(jnp.abs(got - ref))) < 0.15 * float(jnp.std(ref))

    def test_depthwise_weight_quant_is_per_channel(self, model):
        params, state = model
        qp, _ = weight_only.quantize(params, state)
        qw = _get(qp, "block1/dw")["w"]
        # per-output-channel scale over the (1,1,1,C) broadcast shape —
        # the per-channel spread of depthwise kernels is exactly why
        # per-tensor weight quant collapses on MobileNet (Nagel et al. 2019)
        assert qw.scale.shape[-1] == qw.values.shape[-1]

    def test_adaround_spec_replay(self, model, batch):
        """AdaRound's layer-local objective replays depthwise ops from the
        "dwconv" capture spec."""
        from quantnet.quantize.adaround import refine

        params, state = model
        fp, fs = fold.fold_model(params, state)
        qp, qs = weight_only.quantize(fp, fs, bits=4)
        rp, rs = refine(
            qp, qs, fp, fs, mobilenet.apply, [(batch, None)], steps=2, lr=1e-2
        )
        got, _ = mobilenet.apply(rp, rs, batch)
        assert np.isfinite(np.asarray(got)).all()

    def test_bias_correct_runs(self, model, batch):
        from quantnet.quantize.bias_correct import bias_correct

        params, state = model
        fp, fs = fold.fold_model(params, state)
        qp, qs = weight_only.quantize(fp, fs, bits=4)
        cp, cs = bias_correct(qp, qs, fp, fs, mobilenet.apply, [(batch, None)])
        # biases moved somewhere; payloads untouched
        moved = jax.tree_util.tree_map(
            lambda a, b: bool(jnp.any(a != b)) if a.dtype == jnp.float32 else False,
            {p: _get(qp, p).get("b") for p in layer_paths(qp) if _get(qp, p).get("b") is not None},
            {p: _get(cp, p).get("b") for p in layer_paths(cp) if _get(cp, p).get("b") is not None},
        )
        assert any(jax.tree_util.tree_leaves(moved))
        got, _ = mobilenet.apply(cp, cs, batch)
        assert np.isfinite(np.asarray(got)).all()


class TestMobileNetCLE:
    def test_detect_pairs(self, model):
        from quantnet.quantize.equalize import detect_pairs

        params, state = model
        fp, _ = fold.fold_model(params, state)
        pairs = detect_pairs(fp)
        d = {(a, b): k for a, b, k in pairs}
        assert d[("conv_stem", "block0/dw")] == "dw_in"
        assert d[("block1/expand", "block1/dw")] == "dw_in"
        assert d[("block1/dw", "block1/project")] == "conv"
        # block0 has no expand; residual joins never crossed (no cross-block
        # pairs except the stem)
        assert ("block0/expand", "block0/dw") not in d
        assert ("block1/project", "block2/expand") not in d
        # 1 stem + 16 expand->dw + 17 dw->project
        assert len(pairs) == 34

    def test_cle_exact_below_the_clip(self, model, batch):
        """CLE through ReLU6 is function-preserving exactly when no
        pre-activation crosses the 6-clip in either the original or the
        rescaled net (positive homogeneity holds only on the linear
        segment) — the same regime restriction Nagel et al./AIMET handle by
        replacing ReLU6 with ReLU before CLE on trained MobileNets. Scaling
        every weight down keeps the whole net sub-clip, where the transform
        must be exact; the clip-active fresh-init regime is covered by the
        drift measurement in scripts/tpu_mobilenet_bench.py."""
        from quantnet.quantize.equalize import cross_layer_equalize

        params, state = model
        calm = jax.tree_util.tree_map(lambda v: v * 0.5, params)
        ref, _ = mobilenet.apply(calm, state, batch)
        ep, es = cross_layer_equalize(calm, state)
        got, _ = mobilenet.apply(ep, es, batch)
        assert float(jnp.mean(jnp.abs(got - ref))) < 1e-2 * float(
            jnp.std(ref)
        ) + 1e-5
        # and the depthwise per-channel range spread must have shrunk
        fp, _ = fold.fold_model(calm, state)

        def spread(tree):
            w = _get(tree, "block1/dw")["w"]
            r = jnp.max(jnp.abs(w), axis=(0, 1, 2))
            return float(jnp.max(r) / jnp.maximum(jnp.min(r), 1e-9))

        assert spread(ep) < spread(fp)

    def test_cle_finite_when_clip_active(self, model, batch):
        """Fresh-init activations DO cross the clip; CLE must still produce
        finite outputs and reduced spread (accuracy impact is a measured,
        model-specific question — not asserted here)."""
        from quantnet.quantize.equalize import cross_layer_equalize

        params, state = model
        ep, es = cross_layer_equalize(params, state)
        got, _ = mobilenet.apply(ep, es, batch)
        assert np.isfinite(np.asarray(got)).all()
