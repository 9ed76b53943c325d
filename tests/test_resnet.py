"""ResNet-50 tests: shapes, folding, quant-island semantics, conv1_scale knob.

Covers the reference's ImageNet track (SURVEY.md components 5-7): bottleneck
rebuild, downsample wrapping, fp32-domain residual adds, conv1_scale, and the
optimized policy path on the deep model. Small spatial size (64px) keeps CPU
runtime sane; the architecture is identical at 224px.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantnet.core.types import QTensor
from quantnet.models import resnet
from quantnet.quantize import dynamic, fold, static, weight_only
from quantnet.quantize.common import layer_paths


@pytest.fixture(scope="module")
def model():
    return resnet.init(jax.random.PRNGKey(0), num_classes=100)


@pytest.fixture(scope="module")
def batch():
    return jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))


def _get(tree, path):
    node = tree
    for part in path.split("/"):
        node = node[part]
    return node


class TestResNet50:
    def test_output_shape(self, model, batch):
        params, state = model
        logits, _ = resnet.apply(params, state, batch)
        assert logits.shape == (2, 100)

    def test_param_count(self, model):
        params, _ = model
        n = sum(x.size for x in jax.tree_util.tree_leaves(params))
        # ResNet-50 ~25.5M params (with a 100-class head: ~23.7M)
        assert 20e6 < n < 28e6

    def test_layer_paths_cover_all_convs(self, model):
        params, state = model
        fparams, _ = fold.fold_model(params, state)
        paths = layer_paths(fparams)
        # stem + 16 blocks x 3 convs + 4 downsamples + fc = 54
        assert len(paths) == 54
        assert "conv1" in paths and "layer3/2/conv2" in paths and "fc" in paths

    def test_fold_preserves_inference(self, model, batch):
        params, state = model
        ref, _ = resnet.apply(params, state, batch)
        fparams, fstate = fold.fold_model(params, state)
        got, _ = resnet.apply(fparams, fstate, batch)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=5e-2, atol=5e-3
        )

    def test_conv1_scale_knob(self, model, batch):
        params, state = model
        a, _ = resnet.apply(params, state, batch, conv1_scale=1.0)
        b, _ = resnet.apply(params, state, batch, conv1_scale=0.5)
        assert float(jnp.max(jnp.abs(a - b))) > 0

    def test_train_mode_runs(self, model, batch):
        params, state = model
        logits, new_state = resnet.apply(
            params, state, batch, train=True, rng=jax.random.PRNGKey(0)
        )
        changed = jax.tree_util.tree_map(
            lambda x, y: bool(jnp.any(x != y)), state, new_state
        )
        assert any(jax.tree_util.tree_leaves(changed))


class TestResNetQuant:
    def test_dynamic_quantizes_all_convs(self, model, batch):
        params, state = model
        qp, qs = dynamic.quantize(params, state, last_layer_name="fc")
        for p in layer_paths(qp):
            assert isinstance(_get(qp, p)["w"], QTensor), p
        ref, _ = resnet.apply(params, state, batch)
        got, _ = resnet.apply(qp, qs, batch)
        # deep net accumulates quant noise; logit MAD bounded by logit scale
        assert float(jnp.mean(jnp.abs(got - ref))) < 0.35 * float(jnp.std(ref))

    def test_static_with_calibration(self, model, batch):
        params, state = model
        qp, qs = static.quantize(
            params, state, resnet.apply, [(batch, None)], last_layer_name="fc"
        )
        got, _ = resnet.apply(qp, qs, batch)
        ref, _ = resnet.apply(params, state, batch)
        assert np.isfinite(np.asarray(got)).all()
        assert float(jnp.mean(jnp.abs(got - ref))) < 0.5 * float(jnp.std(ref))
        # every quantizable layer got an ActQuant island
        for p in layer_paths(qp):
            assert "aq" in _get(qp, p), p

    def test_weight_only_skip_head(self, model, batch):
        params, state = model
        qp, qs = weight_only.quantize(
            params, state, skip_last_layer=True, last_layer_name="fc"
        )
        assert not isinstance(qp["fc"]["w"], QTensor)
        assert isinstance(_get(qp, "layer1/0/conv1")["w"], QTensor)
        got, _ = resnet.apply(qp, qs, batch)
        ref, _ = resnet.apply(params, state, batch)
        assert float(jnp.mean(jnp.abs(got - ref))) < 0.1 * float(jnp.std(ref))

    def test_compression(self, model):
        from quantnet.core.types import tree_nbytes

        params, state = model
        fparams, _ = fold.fold_model(params, state)
        qp, _ = dynamic.quantize(params, state, last_layer_name="fc")
        assert tree_nbytes(fparams) / tree_nbytes(qp) > 3.5


class TestResNetFamily:
    """Every torchvision depth initializes, runs, and quantizes with the same
    transforms (reference uses resnet50 only; the family shares its two block
    kinds — quantnet/models/resnet.py VARIANTS)."""

    @pytest.mark.parametrize("depth,params_m", [(18, 11.2), (34, 21.3)])
    def test_basic_block_depths(self, depth, params_m, batch):
        params, state = resnet.init(
            jax.random.PRNGKey(0), num_classes=100, depth=depth
        )
        n = sum(x.size for x in jax.tree_util.tree_leaves(params))
        # torchvision 1000-class counts minus most of the smaller head
        assert abs(n / 1e6 - params_m) < 1.5, n
        logits, _ = resnet.apply(params, state, batch)
        assert logits.shape == (2, 100)

    def test_resnet18_static_int8_with_handoff(self, batch):
        params, state = resnet.init(
            jax.random.PRNGKey(0), num_classes=100, depth=18
        )
        ref, _ = resnet.apply(params, state, batch)
        qp, qs = static.quantize(
            params, state, resnet.apply, [(batch, None)], skip_first_layer=True
        )
        # basic blocks: conv1/conv2 only, no conv3 anywhere
        assert "conv3" not in qp["layer1"]["0"]
        assert isinstance(qp["layer1"]["0"]["conv1"]["w"], QTensor)
        # layer1/0 has no downsample (stride 1, 64->64); layer2/0 does
        assert "downsample" not in qp["layer1"]["0"]
        assert "downsample" in qp["layer2"]["0"]
        logits, _ = resnet.apply(qp, qs, batch)
        scale = float(jnp.std(ref))
        assert float(jnp.mean(jnp.abs(logits - ref))) < 0.35 * scale

    def test_resnet101_structure(self):
        params, state = resnet.init(jax.random.PRNGKey(0), depth=101)
        assert len(params["layer3"]) == 23
        n = sum(x.size for x in jax.tree_util.tree_leaves(params))
        assert 42e6 < n < 46e6  # torchvision resnet101: 44.5M

    def test_import_torchvision_resnet18_naming(self):
        """Importer consumes torchvision's state_dict naming for basic-block
        depths (synthetic tensors, no download)."""
        torch = pytest.importorskip("torch")
        from quantnet.models.torch_import import resnet_from_torch

        sd = {}
        def add_conv_bn(conv, bn, cin, cout, k):
            sd[f"{conv}.weight"] = torch.randn(cout, cin, k, k)
            sd[f"{bn}.weight"] = torch.randn(cout)
            sd[f"{bn}.bias"] = torch.randn(cout)
            sd[f"{bn}.running_mean"] = torch.randn(cout)
            sd[f"{bn}.running_var"] = torch.rand(cout) + 0.5

        add_conv_bn("conv1", "bn1", 3, 64, 7)
        cin = 64
        for si, blocks in enumerate((2, 2, 2, 2)):
            width = (64, 128, 256, 512)[si]
            for bi in range(blocks):
                t = f"layer{si + 1}.{bi}"
                add_conv_bn(f"{t}.conv1", f"{t}.bn1", cin, width, 3)
                add_conv_bn(f"{t}.conv2", f"{t}.bn2", width, width, 3)
                if bi == 0 and si > 0:
                    add_conv_bn(f"{t}.downsample.0", f"{t}.downsample.1",
                                cin, width, 1)
                cin = width
        sd["fc.weight"] = torch.randn(10, 512)
        sd["fc.bias"] = torch.randn(10)

        params, state = resnet_from_torch(sd)
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3))
        logits, _ = resnet.apply(params, state, x)
        assert logits.shape == (2, 10)


class TestPreAddQuant:
    def test_oq_attached_and_accuracy_bounded(self, model, batch):
        params, state = model
        ref, _ = resnet.apply(params, state, batch)
        qp, qs = static.quantize(
            params, state, resnet.apply, [(batch, None)], pre_add_quant=True
        )
        # oq lands on conv3 + downsample of downsample blocks only
        assert "oq" in qp["layer1"]["0"]["conv3"]
        assert "oq" in qp["layer1"]["0"]["downsample"]
        assert "oq" not in qp["layer1"]["1"]["conv3"]
        logits, _ = resnet.apply(qp, qs, batch)
        scale = float(jnp.std(ref))
        assert float(jnp.mean(jnp.abs(logits - ref))) < 0.35 * scale

    def test_artifact_roundtrip_preserves_oq(self, model, batch, tmp_path):
        from quantnet.train import checkpoint as ckpt

        params, state = model
        qp, qs = static.quantize(
            params, state, resnet.apply, [(batch, None)], pre_add_quant=True
        )
        a, _ = resnet.apply(qp, qs, batch)
        path = str(tmp_path / "static_oq")
        ckpt.save_artifact(path, {"params": qp, "state": qs}, {"scheme": "static"})
        tree, meta = ckpt.load_artifact(path)
        b, _ = resnet.apply(tree["params"], tree["state"], batch)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


class TestHandoffInvariants:
    @pytest.mark.parametrize("depth", [18, 50])
    def test_downsample_aq_equals_conv1_aq(self, batch, depth):
        """Load-bearing invariant of the block-entry int8 fast path
        (quantnet/models/resnet.py): a statically-quantized downsample conv
        consumes the raw int8 block input, which is quantized in conv1's
        domain — valid because both layers observe the identical tensor
        during calibration. Assert bit-equality for every downsample block."""
        params, state = resnet.init(
            jax.random.PRNGKey(0), num_classes=100, depth=depth
        )
        qp, _ = static.quantize(params, state, resnet.apply, [(batch, None)])
        checked = 0
        for si in range(1, 5):
            for bp in qp[f"layer{si}"].values():
                if "downsample" not in bp:
                    continue
                a, d = bp["conv1"]["aq"], bp["downsample"]["aq"]
                np.testing.assert_array_equal(np.asarray(a.scale), np.asarray(d.scale))
                np.testing.assert_array_equal(
                    np.asarray(a.zero_point), np.asarray(d.zero_point)
                )
                checked += 1
        assert checked >= 3

    def test_fp32_downsample_policy_island(self, batch):
        """A fp32-policy downsample inside a static net must not receive raw
        int8 (regression test for the KeyError found in review): it takes the
        dequantized form and the forward stays close to fp32."""
        params, state = resnet.init(
            jax.random.PRNGKey(0), num_classes=100, depth=18
        )
        ref, _ = resnet.apply(params, state, batch)
        qp, qs = static.quantize(
            params, state, resnet.apply, [(batch, None)],
            layer_policy={"downsample": "fp32"},
        )
        from quantnet.core.types import QTensor
        assert not isinstance(qp["layer2"]["0"]["downsample"]["w"], QTensor)
        logits, _ = resnet.apply(qp, qs, batch)
        scale = float(jnp.std(ref))
        assert float(jnp.mean(jnp.abs(logits - ref))) < 0.35 * scale


class TestStemSpaceToDepth:
    """fold_stem_s2d: the 7x7/s2 stem rewritten as 4x4/s1 over
    space-to-depth input (docs/PERF.md headroom #1) must be numerically
    identical to the stock stem, compose with BN fold + every quant scheme,
    and accept host-pre-transformed input."""

    def test_fp32_equivalence(self, model, batch):
        params, state = model
        a, _ = resnet.apply(params, state, batch)
        p2 = resnet.fold_stem_s2d(params)
        assert p2["conv1"]["w"].shape == (4, 4, 12, 64)
        b, _ = resnet.apply(p2, state, batch)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )

    def test_odd_input_size(self, model):
        params, state = model
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 65, 65, 3))
        a, _ = resnet.apply(params, state, x)
        b, _ = resnet.apply(resnet.fold_stem_s2d(params), state, x)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )

    def test_host_pretransformed_input(self, model, batch):
        params, state = model
        p2 = resnet.fold_stem_s2d(params)
        a, _ = resnet.apply(p2, state, batch)
        xs = resnet.stem_s2d_input(batch)
        assert xs.shape[-1] == 12
        b, _ = resnet.apply(p2, state, xs)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )

    def test_static_int8_composes(self, model, batch):
        params, state = model
        p2 = resnet.fold_stem_s2d(params)
        qp, qs = static.quantize(
            p2, state, resnet.apply, [(batch, None)]
        )
        assert isinstance(qp["conv1"]["w"], QTensor)
        assert qp["conv1"]["w"].shape == (4, 4, 12, 64)
        ref_qp, ref_qs = static.quantize(
            params, state, resnet.apply, [(batch, None)]
        )
        a, _ = resnet.apply(ref_qp, ref_qs, batch)
        b, _ = resnet.apply(qp, qs, batch)
        # same scheme, slightly different stem quantization grid (12-channel
        # s2d input observes the same values) -> bounded logit difference
        denom = max(float(jnp.max(jnp.abs(a))), 1.0)
        assert float(jnp.max(jnp.abs(a - b))) / denom < 0.12
        assert (np.asarray(a).argmax(-1) == np.asarray(b).argmax(-1)).all()
