"""Accuracy evaluation: jitted top-1/top-5 + per-class, mesh-aware.

Capability parity with the reference's ModelEvaluator
(utils/model_evaluator.py:15-55 evaluate_accuracy via the topk(5) trick,
:57-121 per-class accuracy, :123-204 compare_models over a model dict) —
re-designed as one jitted eval step: logits -> top-k membership -> per-class
one-hot segment sums, reduced with psum across data-parallel shards
(SURVEY.md section 3.1 hot-loop note). Model kind is explicit metadata, not
the reference's `quantized`/`is_custom_quantized` attribute sniffing
(model_evaluator.py:26,61-75).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from quantnet.data.datasets import Dataset


def make_metric_step(apply_fn: Callable, num_classes: int, top_k: int = 5):
    """One jitted step -> per-batch metric sums (top1, topk, per-class)."""

    @jax.jit
    def step(params, state, images, labels, valid):
        logits, _ = apply_fn(params, state, images, train=False)
        preds = jnp.argmax(logits, -1)
        valid_f = valid.astype(jnp.float32)
        top1_hit = (preds == labels).astype(jnp.float32) * valid_f
        _, topk_idx = jax.lax.top_k(logits, top_k)
        topk_hit = jnp.any(topk_idx == labels[:, None], axis=-1).astype(
            jnp.float32
        ) * valid_f
        onehot = jax.nn.one_hot(labels, num_classes) * valid_f[:, None]
        per_class_correct = jnp.sum(onehot * top1_hit[:, None], axis=0)
        per_class_total = jnp.sum(onehot, axis=0)
        return (
            jnp.sum(top1_hit),
            jnp.sum(topk_hit),
            jnp.sum(valid_f),
            per_class_correct,
            per_class_total,
        )

    return step


class Evaluator:
    """Accumulates metrics over a Dataset with static-shape (padded) batches."""

    def __init__(
        self,
        apply_fn: Callable,
        dataset: Dataset,
        *,
        batch_size: int = 512,
        top_k: int = 5,
        class_names: Optional[Tuple[str, ...]] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.class_names = class_names
        self.num_classes = dataset.num_classes
        self.step = make_metric_step(apply_fn, dataset.num_classes, top_k)

    def evaluate(self, params: dict, state: dict) -> Dict[str, object]:
        """Returns {'top1', 'top5', 'n', 'per_class': {idx_or_name: acc}}."""
        n = len(self.dataset)
        top1 = topk = total = 0.0
        pc_correct = np.zeros((self.num_classes,), np.float64)
        pc_total = np.zeros((self.num_classes,), np.float64)
        seen = 0
        for images, labels in self.dataset.batches(
            self.batch_size, pad_remainder=True
        ):
            bs = images.shape[0]
            n_valid = min(bs, n - seen)
            valid = (np.arange(bs) < n_valid).astype(np.float32)
            t1, tk, nv, pcc, pct = self.step(params, state, images, labels, valid)
            top1 += float(t1)
            topk += float(tk)
            total += float(nv)
            pc_correct += np.asarray(pcc, np.float64)
            pc_total += np.asarray(pct, np.float64)
            seen += n_valid
        per_class = {}
        for i in range(self.num_classes):
            if pc_total[i] > 0:
                name = self.class_names[i] if self.class_names else i
                per_class[name] = pc_correct[i] / pc_total[i]
        return {
            "top1": top1 / max(total, 1.0),
            "top5": topk / max(total, 1.0),
            "n": int(total),
            # Recorded explicitly so result consumers (tests/test_artifacts.py
            # chance thresholds) never infer the class count from the
            # per_class dict, which omits classes absent from the eval split.
            "num_classes": self.num_classes,
            "per_class": per_class,
        }


def compare_models(
    models: Dict[str, Tuple[Callable, dict, dict]],
    dataset: Dataset,
    *,
    batch_size: int = 512,
    class_names: Optional[Tuple[str, ...]] = None,
) -> Dict[str, Dict[str, object]]:
    """Evaluate a dict {name: (apply_fn, params, state)} — the reference's
    compare_models loop (utils/model_evaluator.py:123-204)."""
    results = {}
    for name, (apply_fn, params, state) in models.items():
        ev = Evaluator(
            apply_fn, dataset, batch_size=batch_size, class_names=class_names
        )
        results[name] = ev.evaluate(params, state)
    return results


def compare_models_single_pass(
    apply_fn: Callable,
    models: Dict[str, Tuple[dict, dict]],
    dataset: Dataset,
    *,
    batch_size: int = 512,
    top_k: int = 5,
) -> Dict[str, Dict[str, object]]:
    """Evaluate every model in ONE pass over the data.

    The reference's compare_models made a full DataLoader pass per model
    (utils/model_evaluator.py:123-204); on a tunnel-attached TPU each pass
    re-pays the whole host->device transfer of the eval split, which
    dominates wall time for a 9-scheme matrix at 224 px. Here each batch is
    shipped once and every model's jitted metric step runs on the resident
    arrays. All models share one apply_fn (a quantized model is just a
    transformed params tree); steps compile per distinct tree structure.
    """
    num_classes = dataset.num_classes
    step = make_metric_step(apply_fn, num_classes, top_k)
    n = len(dataset)
    # Per-batch sums stay ON DEVICE until the end: a float() per model per
    # batch would cost models x batches host round-trips over the tunnel.
    parts = {name: [] for name in models}
    seen = 0
    for images, labels in dataset.batches(batch_size, pad_remainder=True):
        bs = images.shape[0]
        n_valid = min(bs, n - seen)
        valid = (np.arange(bs) < n_valid).astype(np.float32)
        images = jnp.asarray(images)
        labels = jnp.asarray(labels)
        for name, (params, state) in models.items():
            parts[name].append(step(params, state, images, labels, valid))
        seen += n_valid
    results = {}
    for name, outs in parts.items():
        t1 = float(sum(o[0] for o in outs))
        tk = float(sum(o[1] for o in outs))
        total = float(sum(o[2] for o in outs))
        pcc = np.sum([np.asarray(o[3], np.float64) for o in outs], axis=0)
        pct = np.sum([np.asarray(o[4], np.float64) for o in outs], axis=0)
        per_class = {
            i: pcc[i] / pct[i] for i in range(num_classes) if pct[i] > 0
        }
        results[name] = {
            "top1": t1 / max(total, 1.0),
            "top5": tk / max(total, 1.0),
            "n": int(total),
            "num_classes": num_classes,
            "per_class": per_class,
        }
    return results
