"""Import PyTorch checkpoints from the reference project into quantnet trees.

Reference users hold `.pth` checkpoints in two formats — the full dict
{'model_state_dict', 'optimizer_state_dict', ..., 'best_accuracy'}
(model_trainer.py:93-99, what main.py:22-26 loads) and the raw state_dict
(train_model.py:92) — plus torchvision ResNet-50 weights for the ImageNet
track. These converters map them onto quantnet's pure pytree models:

  layout:   conv OIHW -> HWIO;  linear (out, in) -> (in, out)
  batchnorm: weight/bias -> gamma/beta (params), running_mean/var -> state
  flatten:  torch flattens NCHW so the reference fc1's input dim is ordered
            (C, H, W); quantnet is NHWC -> (H, W, C). The fc1 weight's input
            dim is permuted accordingly, making logits match bitwise-modulo
            float reassociation.

torch is only imported inside functions — the framework never requires it.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from quantnet.models.convnet import CONV_DEFS


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _conv_w(t) -> np.ndarray:
    return _np(t).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _linear_w(t) -> np.ndarray:
    return _np(t).T  # (out, in) -> (in, out)


def _bn(sd: Dict, prefix: str) -> Tuple[dict, dict]:
    params = {"gamma": _np(sd[f"{prefix}.weight"]), "beta": _np(sd[f"{prefix}.bias"])}
    state = {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }
    return params, state


def load_torch_checkpoint(path: str) -> Dict:
    """torch.load a .pth in either reference format -> raw state_dict."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model_state_dict" in blob:
        return blob["model_state_dict"]
    return blob


def convnet_from_torch(sd: Dict) -> Tuple[dict, dict]:
    """Reference SimpleConvNet state_dict -> (params, state).

    Module names per reference models/baseline_model.py: conv1..conv6 paired
    with bn1..bn6, fc1 + bn7, fc2.
    """
    import jax.numpy as jnp

    params: dict = {}
    state: dict = {}
    for i, (name, _cin, _cout) in enumerate(CONV_DEFS, start=1):
        bn_p, bn_s = _bn(sd, f"bn{i}")
        params[name] = {
            "w": jnp.asarray(_conv_w(sd[f"conv{i}.weight"])),
            "b": jnp.asarray(_np(sd[f"conv{i}.bias"])),
            "bn": {k: jnp.asarray(v) for k, v in bn_p.items()},
        }
        state[name] = {k: jnp.asarray(v) for k, v in bn_s.items()}

    # fc1: permute the flattened input dim (C,H,W) -> (H,W,C)
    w = _np(sd["fc1.weight"])  # (512, 4096)
    out_dim = w.shape[0]
    c = CONV_DEFS[-1][2]
    hw = int(np.sqrt(w.shape[1] // c))
    w = w.reshape(out_dim, c, hw, hw).transpose(2, 3, 1, 0).reshape(-1, out_dim)
    bn_p, bn_s = _bn(sd, "bn7")
    params["fc1"] = {
        "w": jnp.asarray(w),
        "b": jnp.asarray(_np(sd["fc1.bias"])),
        "bn": {k: jnp.asarray(v) for k, v in bn_p.items()},
    }
    state["fc1"] = {k: jnp.asarray(v) for k, v in bn_s.items()}
    params["fc2"] = {
        "w": jnp.asarray(_linear_w(sd["fc2.weight"])),
        "b": jnp.asarray(_np(sd["fc2.bias"])),
    }
    return params, state


def resnet_from_torch(sd: Dict) -> Tuple[dict, dict]:
    """torchvision ResNet state_dict -> (params, state), any family depth.

    Covers the reference's ImageNet track (models/dynamic_ptq_model.py uses
    torchvision.models.resnet50 — the quantized families wrap its modules);
    resnet18/34/101/152 share the naming scheme and import identically. The
    structure (stage block counts, basic vs bottleneck) is read off the
    state_dict keys.
    """
    import jax.numpy as jnp

    def conv_bn(conv_key: str, bn_key: str, slot_state: dict) -> dict:
        bn_p, bn_s = _bn(sd, bn_key)
        slot_state.update({k: jnp.asarray(v) for k, v in bn_s.items()})
        layer = {
            "w": jnp.asarray(_conv_w(sd[f"{conv_key}.weight"])),
            "bn": {k: jnp.asarray(v) for k, v in bn_p.items()},
        }
        if f"{conv_key}.bias" in sd:
            layer["b"] = jnp.asarray(_np(sd[f"{conv_key}.bias"]))
        return layer

    params: dict = {}
    state: dict = {"conv1": {}}
    params["conv1"] = conv_bn("conv1", "bn1", state["conv1"])

    n_convs = 3 if "layer1.0.conv3.weight" in sd else 2
    for si in range(4):
        stage = f"layer{si + 1}"
        params[stage] = {}
        state[stage] = {}
        bi = 0
        while f"{stage}.{bi}.conv1.weight" in sd:
            t = f"{stage}.{bi}"
            bp: dict = {}
            bs: dict = {f"conv{ci}": {} for ci in range(1, n_convs + 1)}
            for ci in range(1, n_convs + 1):
                bp[f"conv{ci}"] = conv_bn(f"{t}.conv{ci}", f"{t}.bn{ci}", bs[f"conv{ci}"])
            if f"{t}.downsample.0.weight" in sd:
                bs["downsample"] = {}
                bp["downsample"] = conv_bn(
                    f"{t}.downsample.0", f"{t}.downsample.1", bs["downsample"]
                )
            params[stage][str(bi)] = bp
            state[stage][str(bi)] = bs
            bi += 1

    params["fc"] = {
        "w": jnp.asarray(_linear_w(sd["fc.weight"])),
        "b": jnp.asarray(_np(sd["fc.bias"])),
    }
    return params, state


# Backwards-compatible alias (the reference track is resnet50).
resnet50_from_torch = resnet_from_torch


def import_checkpoint(
    path: str, model: str = "simple_convnet"
) -> Tuple[dict, dict, Optional[float]]:
    """Load + convert a reference .pth. Returns (params, state, best_accuracy)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    best = None
    if isinstance(blob, dict) and "model_state_dict" in blob:
        best = blob.get("best_accuracy")
        sd = blob["model_state_dict"]
    else:
        sd = blob
    if model == "simple_convnet":
        params, state = convnet_from_torch(sd)
    elif model.startswith("resnet"):
        params, state = resnet_from_torch(sd)
    else:
        raise ValueError(f"unknown model {model!r}")
    return params, state, (float(best) if best is not None else None)
