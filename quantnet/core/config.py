"""Configuration: one dataclass tree + a thin kernel-backend flag object.

The reference had a single argparse CLI (run_experiment.py:11-17) and hardcoded
defaults scattered through function signatures (SURVEY.md section 5, config).
Here every knob lives in one serializable config tree consumed by the CLI
(quantnet/cli), the trainer, the quantizer, and the bench harness.
"""
from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Optional, Tuple


def _env_bool(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.lower() in ("1", "true", "yes", "on")


@dataclass
class Flags:
    """Kernel backend selection (env-overridable, read at trace time).

    int8_matmul_backend:
        auto    — native int8 on accelerators, f32-emulated on CPU
        xla     — lax.dot_general int8 x int8 -> int32
        pallas  — Pallas kernel (quantnet/ops/pallas_matmul.py)
        emulate — f32 matmul over int8-valued operands (CPU-friendly: XLA:CPU's
                  s8 GEMM/conv falls into scalar loops ~100x slower than f32)
    int8_conv_backend:
        auto | xla | im2col | emulate — same idea; im2col lowers the conv to
        the selected int8 matmul backend.
    """

    int8_matmul_backend: str = field(
        default_factory=lambda: os.environ.get("QUANTNET_INT8_MATMUL", "auto")
    )
    int8_conv_backend: str = field(
        default_factory=lambda: os.environ.get("QUANTNET_INT8_CONV", "auto")
    )
    # ResNet block-boundary residual epilogue: xla (let XLA fuse into the
    # producing conv) | pallas (fused layout-pinned kernel,
    # quantnet/ops/pallas_boundary.py — the headroom #3 experiment).
    boundary_backend: str = field(
        default_factory=lambda: os.environ.get("QUANTNET_BOUNDARY", "xla")
    )


flags = Flags()


def _on_cpu() -> bool:
    import jax

    return jax.default_backend() == "cpu"


def resolve_matmul_backend() -> str:
    b = flags.int8_matmul_backend
    if b == "auto":
        return "emulate" if _on_cpu() else "xla"
    return b


def resolve_conv_backend() -> str:
    b = flags.int8_conv_backend
    if b == "auto":
        return "emulate" if _on_cpu() else "xla"
    return b


def resolve_boundary_backend() -> str:
    return flags.boundary_backend


@dataclass(frozen=True)
class ModelConfig:
    name: str = "simple_convnet"  # or "resnet50"
    num_classes: int = 10
    image_size: int = 32
    channels: int = 3
    # convnet widths per block (reference models/baseline_model.py: 64/128/256)
    widths: Tuple[int, ...] = (64, 128, 256)
    fc_dim: int = 512
    dtype: str = "float32"  # compute dtype for fp32 path: float32 | bfloat16


@dataclass(frozen=True)
class QuantConfig:
    scheme: str = "static"  # dynamic | static | weight_only
    observer: str = "minmax"  # minmax | moving_average | histogram
    calibration_batches: int = 16
    per_channel_weights: bool = True
    # reference custom scheme leaves the classifier fp32
    # (models/custom_quantization_model.py:219) — config knob here:
    skip_last_layer: bool = False
    # per-layer overrides: {layer_name: "fp32"|"dynamic"|"static"|"weight_only"}
    layer_policy: Optional[dict] = None


@dataclass(frozen=True)
class TrainConfig:
    epochs: int = 20
    batch_size: int = 128
    lr: float = 0.1
    optimizer: str = "sgd_cosine"  # sgd_cosine (model_trainer.py) | adam_plateau (train_model.py)
    momentum: float = 0.9
    weight_decay: float = 5e-4
    label_smoothing: float = 0.0
    seed: int = 0
    save_dir: str = "./saved_models"
    log_every: int = 50
    # Reference train-transform parity (utils/dataset_manager.py:31-38:
    # RandomRotation(15) + ColorJitter(.2,.2,.2)), flag-gated — the base
    # augmentation is random-crop+flip; these add the PIL-only parts of the
    # reference transform, executed on device inside the jitted train step.
    aug_rotation_deg: float = 0.0
    aug_color_jitter: float = 0.0
    # Linear lr warmup (epochs) into the cosine schedule — standard
    # from-scratch ResNet recipe; 0 keeps the reference's plain cosine.
    warmup_epochs: float = 0.0
    # Global-norm gradient clipping; 0 disables. The QAT finetune sets this:
    # training a BN-folded graph through clipped-STE fake quantization has no
    # normalization layers left to damp an unlucky step, and measured on-chip
    # runs diverged without it (docs/PERF.md round 3, QAT stabilization).
    grad_clip_norm: float = 0.0


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "cifar10"  # cifar10 | imagenet | synthetic
    data_dir: str = "./data"
    batch_size: int = 128
    eval_batch_size: int = 1024
    augment: bool = True
    # synthetic fallback size (when no real dataset on disk)
    synthetic_train_size: int = 12800
    synthetic_test_size: int = 2560


@dataclass(frozen=True)
class MeshConfig:
    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1  # -1 = all devices
    model_parallel: int = 1


@dataclass(frozen=True)
class BenchConfig:
    warmup_iters: int = 10
    timed_iters: int = 100
    batch_sizes: Tuple[int, ...] = (1, 32, 1024)
    dtype: str = "float32"


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    quant: QuantConfig = field(default_factory=QuantConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    bench: BenchConfig = field(default_factory=BenchConfig)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        return cls(
            model=ModelConfig(**d.get("model", {})),
            quant=QuantConfig(**d.get("quant", {})),
            train=TrainConfig(**d.get("train", {})),
            data=DataConfig(**d.get("data", {})),
            mesh=MeshConfig(**d.get("mesh", {})),
            bench=BenchConfig(**d.get("bench", {})),
        )
