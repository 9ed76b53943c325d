"""Host-side input pipelines: CIFAR-10, ImageNet-val, synthetic fallback.

Replaces the reference's DatasetManager (utils/dataset_manager.py:130-166
CIFAR-10 loaders, :62-90 ImageNet val loader) with a torch-free, numpy-based
pipeline that hands device-ready NHWC float batches to jitted steps. Unlike the
reference — whose dataset module ran an ImageNet evaluation at import time and
crashed any clean import (utils/dataset_manager.py:187-234; SURVEY.md behavior
note 5) — importing this module performs no work.

Dataset resolution order:
  1. real CIFAR-10 python/binary batches if present under data_dir
     (cifar-10-batches-py pickle format);
  2. deterministic synthetic class-conditional data otherwise (zero-egress
     environments), so every downstream pipeline (train/calibrate/eval/bench)
     is exercisable and INT8-vs-FP32 accuracy deltas remain meaningful.

Augmentations (random crop with 4px padding, horizontal flip — the reference's
train transform at utils/dataset_manager.py:31-38 minus the PIL-only color
jitter/rotation) are applied on device inside the jitted train step
(quantnet/train/trainer.py) where they fuse with the forward pass.
"""
from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from typing import Iterator, Optional, Tuple

import numpy as np

CIFAR10_MEAN = np.array([0.4914, 0.4822, 0.4465], np.float32)
CIFAR10_STD = np.array([0.2470, 0.2435, 0.2616], np.float32)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

CIFAR10_CLASSES = (
    "plane", "car", "bird", "cat", "deer", "dog", "frog", "horse", "ship", "truck",
)


@dataclass
class Dataset:
    """In-memory split: images NHWC float32 (normalized), labels int32."""

    images: np.ndarray
    labels: np.ndarray
    num_classes: int
    name: str

    def __len__(self) -> int:
        return self.images.shape[0]

    def batches(
        self,
        batch_size: int,
        *,
        shuffle: bool = False,
        seed: int = 0,
        drop_remainder: bool = False,
        pad_remainder: bool = False,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yield (images, labels). With pad_remainder, the tail batch is padded
        by wrapping (static shapes for jit) and a mask is encoded by repeating
        labels — callers that care use `len(self)` to cut the tail."""
        n = len(self)
        idx = np.arange(n)
        if shuffle:
            np.random.default_rng(seed).shuffle(idx)
        end = n - (n % batch_size) if drop_remainder else n
        for start in range(0, end, batch_size):
            sel = idx[start : start + batch_size]
            if len(sel) < batch_size and pad_remainder:
                sel = np.concatenate([sel, idx[: batch_size - len(sel)]])
            yield self.images[sel], self.labels[sel]


def _find_cifar10_dir(data_dir: str) -> Optional[str]:
    for cand in (
        os.path.join(data_dir, "cifar-10-batches-py"),
        data_dir,
        "/root/data/cifar-10-batches-py",
    ):
        if os.path.isfile(os.path.join(cand, "data_batch_1")):
            return cand
    return None


def _load_cifar10_real(batch_dir: str) -> Tuple[Dataset, Dataset]:
    def load_file(path):
        with open(path, "rb") as f:
            d = pickle.load(f, encoding="bytes")
        return d[b"data"], np.asarray(d[b"labels"], np.int32)

    xs, ys = [], []
    for i in range(1, 6):
        x, y = load_file(os.path.join(batch_dir, f"data_batch_{i}"))
        xs.append(x)
        ys.append(y)
    xtr = np.concatenate(xs)
    ytr = np.concatenate(ys)
    xte, yte = load_file(os.path.join(batch_dir, "test_batch"))

    def prep(x):
        x = x.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1).astype(np.float32) / 255.0
        return (x - CIFAR10_MEAN) / CIFAR10_STD

    return (
        Dataset(prep(xtr), ytr, 10, "cifar10-train"),
        Dataset(prep(xte), yte, 10, "cifar10-test"),
    )


def make_synthetic(
    num_classes: int,
    image_size: int,
    train_size: int,
    test_size: int,
    seed: int = 1234,
    name: str = "synthetic",
) -> Tuple[Dataset, Dataset]:
    """Deterministic class-conditional images: each class has a fixed random
    spatial pattern; samples are pattern + noise, so the task is learnable and
    quantization-induced accuracy loss is measurable."""
    rng = np.random.default_rng(seed)
    protos = rng.normal(0.0, 1.0, (num_classes, image_size, image_size, 3)).astype(
        np.float32
    )

    def split(n, sseed):
        r = np.random.default_rng(sseed)
        labels = r.integers(0, num_classes, n).astype(np.int32)
        noise = r.normal(0.0, 1.0, (n, image_size, image_size, 3)).astype(np.float32)
        images = 0.8 * protos[labels] + noise
        return images, labels

    xtr, ytr = split(train_size, seed + 1)
    xte, yte = split(test_size, seed + 2)
    return (
        Dataset(xtr, ytr, num_classes, f"{name}-train"),
        Dataset(xte, yte, num_classes, f"{name}-test"),
    )


def load_cifar10(
    data_dir: str = "./data",
    *,
    synthetic_train_size: int = 12800,
    synthetic_test_size: int = 2560,
) -> Tuple[Dataset, Dataset]:
    """CIFAR-10 train/test; falls back to synthetic when no data on disk."""
    real = _find_cifar10_dir(data_dir)
    if real is not None:
        return _load_cifar10_real(real)
    return make_synthetic(
        10, 32, synthetic_train_size, synthetic_test_size, name="cifar10-synthetic"
    )


def _find_imagenet_dir(data_dir: str) -> Optional[str]:
    for cand in (os.path.join(data_dir, "imagenet"), "./imagenet"):
        if os.path.isdir(os.path.join(cand, "val")):
            return cand
    return None


def load_imagenet_val(
    data_dir: str = "./data",
    *,
    image_size: int = 224,
    synthetic_size: int = 512,
    num_classes: int = 1000,
) -> Dataset:
    """ImageNet validation split (reference utils/dataset_manager.py:62-90).

    Real ImageNet needs JPEG decode (PIL) — gated on directory presence; the
    zero-egress fallback is synthetic 224x224 data with the same stats contract.
    """
    real = _find_imagenet_dir(data_dir)
    if real is not None:
        raise NotImplementedError(
            "real ImageNet-val decoding requires an image decoder; "
            "mount pre-decoded .npy shards or use the synthetic fallback"
        )
    _, test = make_synthetic(
        num_classes, image_size, 1, synthetic_size, name="imagenet-synthetic"
    )
    return test
