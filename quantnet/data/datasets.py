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
from functools import partial
from typing import Iterator, Optional, Tuple

import numpy as np

CIFAR10_MEAN = np.array([0.4914, 0.4822, 0.4465], np.float32)
CIFAR10_STD = np.array([0.2470, 0.2435, 0.2616], np.float32)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

CIFAR10_CLASSES = (
    "plane", "car", "bird", "cat", "deer", "dog", "frog", "horse", "ship", "truck",
)


def _chunked_device_put(arr: np.ndarray, chunk_bytes: int = 1 << 28):
    """Ship a large host array to the device in ~256 MB slices, assembled
    into a single preallocated device buffer via donated dynamic updates
    (peak device memory = buffer + one chunk, never 2x).

    One multi-GB device_put wedged the axon tunnel for 15+ minutes (round 4,
    docs/PERF.md) while the same bytes stream fine at batch-sized transfers;
    chunking keeps each RPC in the regime the tunnel demonstrably handles.
    """
    import jax
    import jax.numpy as jnp

    if arr.nbytes <= chunk_bytes:
        return jnp.asarray(arr)
    rows = max(int(chunk_bytes // max(arr[0].nbytes, 1)), 1)

    @partial(jax.jit, donate_argnums=(0,))
    def update(buf, chunk, start):
        return jax.lax.dynamic_update_slice_in_dim(buf, chunk, start, axis=0)

    buf = jnp.zeros(arr.shape, arr.dtype)
    for s in range(0, arr.shape[0], rows):
        chunk = jnp.asarray(np.ascontiguousarray(arr[s:s + rows]))
        # static chunk rows except possibly the tail: two compiles max
        buf = update(buf, chunk, s)
    return buf


@dataclass
class Dataset:
    """In-memory split: labels int32 plus image storage in one of two forms —
    normalized float32 NHWC (`images`), or raw uint8 (`raw_u8` + `mean`/`std`),
    in which case batches are assembled (gather + normalize, C++ threads, 4x
    less host RAM) by the native loader (quantnet/data/native_loader.py)."""

    images: Optional[np.ndarray]
    labels: np.ndarray
    num_classes: int
    name: str
    raw_u8: Optional[np.ndarray] = None
    mean: Optional[np.ndarray] = None
    std: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return self.labels.shape[0]

    @property
    def image_size(self) -> int:
        store = self.images if self.images is not None else self.raw_u8
        return store.shape[1]

    @property
    def channels(self) -> int:
        store = self.images if self.images is not None else self.raw_u8
        return store.shape[3]

    def _batcher(self):
        if getattr(self, "_nb", None) is None:
            from quantnet.data.native_loader import NativeBatcher

            self._nb = NativeBatcher(self.raw_u8, self.labels, self.mean, self.std)
        return self._nb

    def device_arrays(self):
        """Ship the WHOLE split to the default device once and cache it:
        (images_dev, labels_dev, mean_dev, std_dev) — mean/std are None for
        f32-resident datasets (already normalized), set for u8-resident ones
        (normalize on device; u8 also means 4x less HBM and transfer).

        This is the device-resident input mode for single-chip training when
        the split fits in HBM (quantnet/train/trainer.py device_data=True):
        per-step input becomes a tiny int32 index vector instead of a
        dozens-of-MB host->device batch copy — the TPU-idiomatic shape for
        tunnel-attached chips, where per-batch streaming pays round-trip
        latency every step (and, on the axon tunnel, leaks the transfer
        buffer: measured ~77 MB leaked per 77 MB batch shipped, the OOM that
        killed a 224px training run at epoch 12). Cached on the dataset so
        several Trainer instances (train + QAT finetune) share one copy."""
        if getattr(self, "_dev", None) is None:
            import jax.numpy as jnp

            if self.raw_u8 is not None:
                imgs = _chunked_device_put(self.raw_u8)
                mean = jnp.asarray(self.mean, jnp.float32)
                std = jnp.asarray(self.std, jnp.float32)
            else:
                imgs, mean, std = _chunked_device_put(self.images), None, None
            self._dev = (imgs, jnp.asarray(self.labels), mean, std)
        return self._dev

    def release_device(self):
        """Drop the cached device-resident copy; the next device_arrays()
        call re-uploads. Frees HBM between pipeline stages that don't need
        the split resident — e.g. between training and AdaRound's
        activation capture, which at ResNet-50/224px scale cannot coexist
        with a 1.9 GB resident training split on one 16 GB chip (measured
        round 5: the r50 224px run OOM'd exactly there)."""
        self._dev = None
        self._dev_mesh = None

    def sample_batch(self, batch_size: int = 8) -> Tuple[np.ndarray, np.ndarray]:
        """First `batch_size` examples (reference DatasetManager.get_sample_batch,
        utils/dataset_manager.py:46-60)."""
        return next(self.batches(batch_size))

    def batches(
        self,
        batch_size: int,
        *,
        shuffle: bool = False,
        seed: int = 0,
        drop_remainder: bool = False,
        pad_remainder: bool = False,
        process_shard: bool = False,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yield (images, labels). With pad_remainder, the tail batch is padded
        by wrapping (static shapes for jit) and a mask is encoded by repeating
        labels — callers that care use `len(self)` to cut the tail.

        process_shard=True makes the pipeline multi-host-correct: batch_size
        is the GLOBAL batch; every process iterates the same (seeded) global
        permutation and yields only its own contiguous batch_size/process_count
        slice of each global batch — the per-host input sharding SURVEY.md
        section 2.4 calls for. Feed the local slices to
        quantnet.parallel.mesh.shard_batch, which assembles the global device
        array via jax.make_array_from_process_local_data. process_index/count
        default to jax.process_index()/jax.process_count()."""
        n = len(self)
        pi = pc = None
        if process_shard:
            import jax

            pc = process_count if process_count is not None else jax.process_count()
            pi = process_index if process_index is not None else jax.process_index()
            if batch_size % pc:
                raise ValueError(
                    f"global batch {batch_size} not divisible by {pc} processes"
                )
            if not (drop_remainder or pad_remainder):
                raise ValueError(
                    "process_shard requires drop_remainder or pad_remainder "
                    "(every process must see the same number of equal batches)"
                )
        if (
            self.raw_u8 is not None
            and shuffle
            and drop_remainder
            and not (pc and pc > 1)
        ):
            # Training epoch: native assembly with a one-deep prefetch thread
            # (the next batch is built while the device runs the current step).
            yield from self._batcher().epoch(
                batch_size, shuffle=True, augment=False, seed=seed
            )
            return
        idx = np.arange(n)
        if shuffle:
            np.random.default_rng(seed).shuffle(idx)
        if self.raw_u8 is not None and drop_remainder and pc and pc > 1:
            # Multi-host: every process slices the same seeded global
            # permutation, and the per-process index batches ride the SAME
            # native assembler + prefetch thread as single-process training
            # (identical batches to the generic path below, by construction:
            # same rng, same slicing).
            end = n - (n % batch_size)
            lbs = batch_size // pc
            sels = [
                idx[s + pi * lbs : s + (pi + 1) * lbs]
                for s in range(0, end, batch_size)
            ]
            yield from self._batcher().prefetch_batches(sels, seed=seed)
            return
        end = n - (n % batch_size) if drop_remainder else n
        for start in range(0, end, batch_size):
            sel = idx[start : start + batch_size]
            if len(sel) < batch_size and pad_remainder:
                sel = np.concatenate([sel, idx[: batch_size - len(sel)]])
            if pc and pc > 1:
                lbs = batch_size // pc
                sel = sel[pi * lbs : (pi + 1) * lbs]
            if self.raw_u8 is not None:
                yield self._batcher().prepare(sel.astype(np.int64), augment=False)
            else:
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
        # Keep storage uint8 NHWC; normalization happens at batch-assembly
        # time in the native loader (4x less host RAM than f32 storage).
        return np.ascontiguousarray(
            x.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        )

    return (
        Dataset(None, ytr, 10, "cifar10-train", raw_u8=prep(xtr),
                mean=CIFAR10_MEAN, std=CIFAR10_STD),
        Dataset(None, yte, 10, "cifar10-test", raw_u8=prep(xte),
                mean=CIFAR10_MEAN, std=CIFAR10_STD),
    )


def make_synthetic(
    num_classes: int,
    image_size: int,
    train_size: int,
    test_size: int,
    seed: int = 1234,
    name: str = "synthetic",
    *,
    patch_frac: float = 0.375,
    signal_max: float = 2.5,
) -> Tuple[Dataset, Dataset]:
    """Deterministic class-conditional images, built NOT to saturate.

    Each class has a fixed random patch pattern (side = patch_frac *
    image_size). A sample is unit gaussian noise plus that patch pasted at a
    random position with a per-sample amplitude drawn uniformly from
    [0, signal_max]. The amplitude continuum is the point: samples range from
    unclassifiable (amplitude ~0 -> chance) to easy, so a trained model's
    accuracy sits mid-band (~70-90% top-1 for the default CIFAR-shaped task)
    instead of pinning at 100%, and a small logit perturbation — e.g.
    INT8 quantization noise — moves accuracy by a measurable amount. This
    makes the framework's ``static-INT8 top-1 delta <= 0.3pt'' claim
    falsifiable on the zero-egress fallback task, where the round-1 generator
    (0.8*full-image prototype + noise) was saturated at 98%+ top-1 and every
    scheme trivially scored a 0.00pt delta.

    The random patch position forces translation-tolerant features (a
    convnet task, not a pixel-template lookup)."""
    rng = np.random.default_rng(seed)
    ps = max(int(round(image_size * patch_frac)), 4)
    protos = rng.normal(0.0, 1.0, (num_classes, ps, ps, 3)).astype(np.float32)

    def split(n, sseed):
        r = np.random.default_rng(sseed)
        labels = r.integers(0, num_classes, n).astype(np.int32)
        images = r.normal(0.0, 1.0, (n, image_size, image_size, 3)).astype(
            np.float32
        )
        amp = r.uniform(0.0, signal_max, n).astype(np.float32)
        ys = r.integers(0, image_size - ps + 1, n)
        xs = r.integers(0, image_size - ps + 1, n)
        for i in range(n):
            images[i, ys[i] : ys[i] + ps, xs[i] : xs[i] + ps, :] += (
                amp[i] * protos[labels[i]]
            )
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


def _load_imagenet_real(
    val_dir: str,
    image_size: int,
    max_images: Optional[int] = None,
    num_workers: Optional[int] = None,
) -> Dataset:
    """Decode an ImageFolder-layout val split (val/<wnid>/*.JPEG) with PIL:
    Resize(256) -> CenterCrop(image_size) — the reference's val transform
    (utils/dataset_manager.py:23-28), minus the normalize, which happens at
    batch-assembly time in the native loader.

    u8-resident streaming decode: the file list is enumerated first, the
    uint8 output array is preallocated once, and a thread pool decodes
    images directly into their rows (PIL releases the GIL inside
    decode/resize, so threads scale) — the worker-parallel decode of the
    reference's num_workers=4 DataLoader (utils/dataset_manager.py:83).
    Peak host RSS for a 50k x 224^2 split stays bounded at ~7.5 GB (u8)
    instead of ~30 GB (a float32 materialization of the whole split).
    Batches are then gathered + normalized by the C++ batch assembler
    (native/dataloader.cpp) exactly like the CIFAR path. num_workers
    defaults to QUANTNET_DECODE_WORKERS or 4 (the reference's default)."""
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    classes = sorted(
        d for d in os.listdir(val_dir) if os.path.isdir(os.path.join(val_dir, d))
    )
    class_idx = {c: i for i, c in enumerate(classes)}
    files = []
    for c in classes:
        cdir = os.path.join(val_dir, c)
        for fname in sorted(os.listdir(cdir)):
            files.append((os.path.join(cdir, fname), class_idx[c]))
            if max_images is not None and len(files) >= max_images:
                break
        if max_images is not None and len(files) >= max_images:
            break
    resize = int(image_size * 256 / 224)
    x = np.empty((len(files), image_size, image_size, 3), np.uint8)
    labels = np.empty((len(files),), np.int32)

    def decode(i: int) -> None:
        path, ci = files[i]
        img = Image.open(path).convert("RGB")
        w, h = img.size
        s = resize / min(w, h)
        img = img.resize((round(w * s), round(h * s)), Image.BILINEAR)
        w, h = img.size
        left, top = (w - image_size) // 2, (h - image_size) // 2
        img = img.crop((left, top, left + image_size, top + image_size))
        x[i] = np.asarray(img, np.uint8)  # disjoint rows: thread-safe
        labels[i] = ci

    if num_workers is None:
        num_workers = int(os.environ.get("QUANTNET_DECODE_WORKERS", "4"))
    if num_workers <= 1:
        for i in range(len(files)):
            decode(i)
    else:
        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            # list() so the first worker exception propagates, not drops
            list(pool.map(decode, range(len(files))))
    return Dataset(
        None, labels, len(classes), "imagenet-val",
        raw_u8=x, mean=IMAGENET_MEAN, std=IMAGENET_STD,
    )


def load_imagenet(
    data_dir: str = "./data",
    *,
    image_size: int = 224,
    synthetic_train_size: int = 512,
    synthetic_test_size: int = 512,
    num_classes: int = 1000,
    max_images: Optional[int] = None,
) -> Tuple[Dataset, Dataset]:
    """ImageNet (reference utils/dataset_manager.py:62-90 — val split only;
    the reference's ImageNet track is eval/calibration, never training).

    Returns (calibration_split, val_split). With real data both views are the
    val split (calibration batches are drawn from its head, like the
    reference's calibration_data_loader contract, static_ptq_model.py:19);
    zero-egress fallback is deterministic synthetic data at the same shapes.
    """
    real = _find_imagenet_dir(data_dir)
    if real is not None:
        val = _load_imagenet_real(
            os.path.join(real, "val"), image_size, max_images=max_images
        )
        return val, val
    return make_synthetic(
        num_classes,
        image_size,
        synthetic_train_size,
        synthetic_test_size,
        name="imagenet-synthetic",
    )


def load_imagenet_val(
    data_dir: str = "./data",
    *,
    image_size: int = 224,
    synthetic_size: int = 512,
    num_classes: int = 1000,
) -> Dataset:
    """ImageNet validation split only (see load_imagenet)."""
    _, test = load_imagenet(
        data_dir,
        image_size=image_size,
        synthetic_test_size=synthetic_size,
        num_classes=num_classes,
    )
    return test
