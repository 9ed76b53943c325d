"""Torch checkpoint importer: forward parity between the reference's PyTorch
models and the converted quantnet trees (random weights, eval mode)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quantnet.models import convnet, resnet  # noqa: E402
from quantnet.models.torch_import import (  # noqa: E402
    convnet_from_torch,
    import_checkpoint,
    resnet50_from_torch,
)


class _TorchSimpleConvNet(nn.Module):
    """Test fixture with the reference checkpoint's module names/topology
    (models/baseline_model.py) — needed to generate state_dicts to convert."""

    def __init__(self):
        super().__init__()
        widths = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256)]
        for i, (cin, cout) in enumerate(widths, start=1):
            setattr(self, f"conv{i}", nn.Conv2d(cin, cout, 3, padding=1))
            setattr(self, f"bn{i}", nn.BatchNorm2d(cout))
        self.pool = nn.MaxPool2d(2, 2)
        self.fc1 = nn.Linear(256 * 4 * 4, 512)
        self.bn7 = nn.BatchNorm1d(512)
        self.fc2 = nn.Linear(512, 10)

    def forward(self, x):
        import torch.nn.functional as F

        for a, b in ((1, 2), (3, 4), (5, 6)):
            x = F.relu(getattr(self, f"bn{a}")(getattr(self, f"conv{a}")(x)))
            x = F.relu(getattr(self, f"bn{b}")(getattr(self, f"conv{b}")(x)))
            x = self.pool(x)
        x = x.flatten(1)
        x = F.relu(self.bn7(self.fc1(x)))
        return self.fc2(x)


def _randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


@pytest.fixture(scope="module")
def torch_convnet():
    torch.manual_seed(0)
    m = _TorchSimpleConvNet().eval()
    with torch.no_grad():
        _randomize_bn_stats(m)
    return m


def test_convnet_forward_parity(torch_convnet):
    x = np.random.default_rng(0).normal(size=(4, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = torch_convnet(torch.from_numpy(x)).numpy()
    params, state = convnet_from_torch(torch_convnet.state_dict())
    got, _ = convnet.apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-4)


def test_convnet_full_checkpoint_roundtrip(torch_convnet, tmp_path):
    path = str(tmp_path / "trained_model.pth")
    torch.save(
        {
            "epoch": 7,
            "model_state_dict": torch_convnet.state_dict(),
            "best_accuracy": 85.42,
        },
        path,
    )
    params, state, best = import_checkpoint(path, "simple_convnet")
    assert best == pytest.approx(85.42)
    x = jnp.zeros((1, 32, 32, 3))
    logits, _ = convnet.apply(params, state, x)
    assert logits.shape == (1, 10)


def test_convnet_raw_state_dict_format(torch_convnet, tmp_path):
    """train_model.py saved the bare state_dict (reference :92)."""
    path = str(tmp_path / "raw.pth")
    torch.save(torch_convnet.state_dict(), path)
    params, state, best = import_checkpoint(path, "simple_convnet")
    assert best is None
    assert "conv1" in params and "fc2" in params


def _synthetic_resnet50_state_dict():
    """torchvision-shaped ResNet-50 state_dict built from our own init
    (reversed layout transforms) — torchvision itself is not in this image."""
    rng = np.random.default_rng(3)
    sd = {}

    def add_conv(key, hwio_shape, bias=False):
        h, w, i, o = hwio_shape
        sd[f"{key}.weight"] = torch.from_numpy(
            rng.normal(0, 0.05, (o, i, h, w)).astype(np.float32)
        )

    def add_bn(key, c):
        sd[f"{key}.weight"] = torch.from_numpy(rng.uniform(0.5, 1.5, c).astype(np.float32))
        sd[f"{key}.bias"] = torch.from_numpy(rng.normal(0, 0.1, c).astype(np.float32))
        sd[f"{key}.running_mean"] = torch.from_numpy(rng.normal(0, 0.1, c).astype(np.float32))
        sd[f"{key}.running_var"] = torch.from_numpy(rng.uniform(0.5, 1.5, c).astype(np.float32))

    add_conv("conv1", (7, 7, 3, 64))
    add_bn("bn1", 64)
    cin = 64
    from quantnet.models.resnet import EXPANSION, STAGE_WIDTHS, STAGES

    for si, blocks in enumerate(STAGES):
        width = STAGE_WIDTHS[si]
        cout = width * EXPANSION
        for bi in range(blocks):
            t = f"layer{si + 1}.{bi}"
            add_conv(f"{t}.conv1", (1, 1, cin, width))
            add_bn(f"{t}.bn1", width)
            add_conv(f"{t}.conv2", (3, 3, width, width))
            add_bn(f"{t}.bn2", width)
            add_conv(f"{t}.conv3", (1, 1, width, cout))
            add_bn(f"{t}.bn3", cout)
            if bi == 0:
                add_conv(f"{t}.downsample.0", (1, 1, cin, cout))
                add_bn(f"{t}.downsample.1", cout)
            cin = cout
    sd["fc.weight"] = torch.from_numpy(rng.normal(0, 0.02, (1000, cin)).astype(np.float32))
    sd["fc.bias"] = torch.from_numpy(np.zeros(1000, np.float32))
    return sd


def test_resnet50_structure_from_synthetic_state_dict():
    sd = _synthetic_resnet50_state_dict()
    params, state = resnet50_from_torch(sd)
    ref_params, ref_state = resnet.init(jax.random.PRNGKey(0))
    # identical tree structure and leaf shapes as our native init
    got_t = jax.tree_util.tree_structure(params)
    ref_t = jax.tree_util.tree_structure(ref_params)
    assert got_t == ref_t
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(ref_params)):
        assert a.shape == b.shape
    x = jnp.zeros((1, 64, 64, 3))
    logits, _ = resnet.apply(params, state, x)
    assert logits.shape == (1, 1000)
    assert np.isfinite(np.asarray(logits)).all()


class _TorchBottleneck(nn.Module):
    """torchvision Bottleneck (v1.5: stride on conv2), torchvision key names."""

    def __init__(self, cin, width, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        import torch.nn.functional as F

        identity = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + identity)


class _TorchResNet50(nn.Module):
    """Exact torchvision resnet50 topology + state_dict key names, written
    against plain torch (torchvision is not in this image — this fixture is
    what binds resnet import FORWARD PARITY in CI, not just tree structure).
    It caught a real bug: XLA "SAME" at stride 2 pads asymmetrically and is
    NOT torch's pad=1 — resnet.apply(torch_pad=True) exists because of it."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        cin = 64
        from quantnet.models.resnet import EXPANSION, STAGE_WIDTHS, STAGES

        for si, blocks in enumerate(STAGES):
            width = STAGE_WIDTHS[si]
            cout = width * EXPANSION
            layer = []
            for bi in range(blocks):
                stride = 2 if (bi == 0 and si > 0) else 1
                layer.append(
                    _TorchBottleneck(cin if bi == 0 else cout, width, cout, stride)
                )
            setattr(self, f"layer{si + 1}", nn.Sequential(*layer))
            cin = cout
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(cin, 1000)

    def forward(self, x):
        import torch.nn.functional as F

        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        for si in range(4):
            x = getattr(self, f"layer{si + 1}")(x)
        return self.fc(self.avgpool(x).flatten(1))


def test_resnet50_forward_parity():
    torch.manual_seed(1)
    m = _TorchResNet50().eval()
    with torch.no_grad():
        _randomize_bn_stats(m, seed=1)
    x = np.random.default_rng(1).normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    params, state = resnet50_from_torch(m.state_dict())
    got, _ = resnet.apply(
        params, state, jnp.asarray(x.transpose(0, 2, 3, 1)), torch_pad=True
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)


def test_resnet50_forward_parity_requires_torch_pad():
    """Without torch_pad the stride-2 convs sample different positions than
    torch's symmetric padding — the forwards must diverge grossly (this is
    the failure mode the torch_pad flag fixes, not an edge effect)."""
    torch.manual_seed(2)
    m = _TorchResNet50().eval()
    with torch.no_grad():
        _randomize_bn_stats(m, seed=2)
    x = np.random.default_rng(2).normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    params, state = resnet50_from_torch(m.state_dict())
    got, _ = resnet.apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert np.abs(np.asarray(got) - ref).max() > 1e-2


def test_imported_model_quantizes(torch_convnet):
    from quantnet.quantize import static

    params, state = convnet_from_torch(torch_convnet.state_dict())
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 32, 3))
    qp, qs = static.quantize(params, state, convnet.apply, [(x, None)])
    ref, _ = convnet.apply(params, state, x)
    got, _ = convnet.apply(qp, qs, x)
    err = float(jnp.sqrt(jnp.mean((got - ref) ** 2)))
    assert err < 0.5


def test_cli_import_torch_then_quantize(torch_convnet, tmp_path, capsys):
    from quantnet.cli.main import main

    pth = str(tmp_path / "trained_model.pth")
    torch.save({"model_state_dict": torch_convnet.state_dict(),
                "best_accuracy": 85.42}, pth)
    save = str(tmp_path / "saved")
    main(["import-torch", "--ckpt", pth, "--save-dir", save,
          "--synthetic-train-size", "64", "--synthetic-test-size", "64"])
    assert "imported" in capsys.readouterr().out
    main(["quantize", "--scheme", "static", "--save-dir", save,
          "--synthetic-train-size", "64", "--synthetic-test-size", "64",
          "--batch-size", "32", "--calibration-batches", "2"])
    import os

    assert os.path.exists(os.path.join(save, "static.npz"))


class _TorchMobileNetV2(nn.Module):
    """Exact torchvision mobilenet_v2 topology + state_dict key names, in
    plain torch (torchvision is not in this image). Nested Sequentials
    reproduce the key scheme: features.0.{0,1} stem; features.N.conv with
    [0.0/0.1 expand, 1.0/1.1 dw, 2/3 project] (t=1 block: [0.0/0.1 dw,
    1/2 project]); features.18.{0,1} head; classifier.1 fc."""

    def __init__(self):
        super().__init__()
        from quantnet.models.mobilenet import block_widths

        stem, head, blocks = block_widths()
        feats = [
            nn.Sequential(
                nn.Conv2d(3, stem, 3, stride=2, padding=1, bias=False),
                nn.BatchNorm2d(stem),
                nn.ReLU6(inplace=True),
            )
        ]
        self._residual = []
        cin = stem
        for t, hidden, cout, s in blocks:
            layers = []
            if t != 1:
                layers.append(
                    nn.Sequential(
                        nn.Conv2d(cin, hidden, 1, bias=False),
                        nn.BatchNorm2d(hidden),
                        nn.ReLU6(inplace=True),
                    )
                )
            layers.append(
                nn.Sequential(
                    nn.Conv2d(hidden, hidden, 3, stride=s, padding=1,
                              groups=hidden, bias=False),
                    nn.BatchNorm2d(hidden),
                    nn.ReLU6(inplace=True),
                )
            )
            layers.append(nn.Conv2d(hidden, cout, 1, bias=False))
            layers.append(nn.BatchNorm2d(cout))
            block = nn.Module()
            block.conv = nn.Sequential(*layers)
            feats.append(block)
            self._residual.append(s == 1 and cin == cout)
            cin = cout
        feats.append(
            nn.Sequential(
                nn.Conv2d(cin, head, 1, bias=False),
                nn.BatchNorm2d(head),
                nn.ReLU6(inplace=True),
            )
        )
        self.features = nn.Sequential(*feats)
        self.classifier = nn.Sequential(nn.Dropout(0.2), nn.Linear(head, 1000))

    def forward(self, x):
        x = self.features[0](x)
        for i, block in enumerate(self.features[1:-1]):
            out = block.conv(x)
            x = x + out if self._residual[i] else out
        x = self.features[-1](x)
        x = x.mean(dim=(2, 3))
        return self.classifier(x)


def test_mobilenetv2_forward_parity():
    from quantnet.models import mobilenet
    from quantnet.models.torch_import import mobilenet_from_torch

    torch.manual_seed(3)
    m = _TorchMobileNetV2().eval()
    with torch.no_grad():
        _randomize_bn_stats(m, seed=3)
    x = np.random.default_rng(3).normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    params, state = mobilenet_from_torch(m.state_dict())
    got, _ = mobilenet.apply(
        params, state, jnp.asarray(x.transpose(0, 2, 3, 1)), torch_pad=True
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)


def test_mobilenetv2_imported_tree_quantizes():
    from quantnet.models import mobilenet
    from quantnet.quantize import static

    torch.manual_seed(4)
    m = _TorchMobileNetV2().eval()
    with torch.no_grad():
        _randomize_bn_stats(m, seed=4)
    from quantnet.models.torch_import import mobilenet_from_torch

    params, state = mobilenet_from_torch(m.state_dict())
    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(2, 64, 64, 3)).astype(np.float32)
    )
    import functools

    apply_pad = functools.partial(mobilenet.apply, torch_pad=True)
    qp, qs = static.quantize(params, state, apply_pad, [(x, None)])
    logits, _ = apply_pad(qp, qs, x)
    assert np.isfinite(np.asarray(logits)).all()
