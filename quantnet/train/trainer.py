"""FP32 training: jitted train step, optax optimizers, best-checkpoint logic.

Capability parity with both reference trainers, collapsed into one (SURVEY.md
component 8/9 recommendation):
  - "sgd_cosine": SGD(momentum 0.9, weight decay 5e-4) + cosine annealing over
    `epochs` — reference model_trainer.py:26-44 (the run_experiment.py trainer);
  - "adam_plateau": Adam + reduce-on-plateau (factor 0.5, patience 2) stepped on
    test loss — reference train_model.py:30-31,83.

TPU-native design: the whole epoch's inner loop is one jitted, donated
train_step (loss -> grads -> optimizer update) over device-resident batches;
data augmentation (random crop + flip, the device-executable subset of the
reference transform at utils/dataset_manager.py:31-38) runs inside the same jit.
Best-accuracy checkpointing keeps the {params, opt_state, epoch, best_accuracy}
contract of model_trainer.py:93-99 via orbax, and reloads the best checkpoint at
the end (model_trainer.py:104-106).
"""
from __future__ import annotations

import json
import os
import time
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from quantnet.core.config import TrainConfig
from quantnet.data.datasets import Dataset


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    clip = (
        [optax.clip_by_global_norm(cfg.grad_clip_norm)]
        if getattr(cfg, "grad_clip_norm", 0.0) > 0
        else []
    )
    if cfg.optimizer == "sgd_cosine":
        warmup_steps = int(
            getattr(cfg, "warmup_epochs", 0) * steps_per_epoch
        )
        total = max(cfg.epochs * steps_per_epoch, 1)
        if warmup_steps > 0:
            # Linear warmup into the cosine (standard from-scratch ResNet
            # recipe; avoids the flat-at-chance cold start of lr=0.1 on deep
            # nets with batch norm).
            schedule = optax.warmup_cosine_decay_schedule(
                init_value=cfg.lr / max(warmup_steps, 1),
                peak_value=cfg.lr,
                warmup_steps=warmup_steps,
                decay_steps=total,
            )
        else:
            schedule = optax.cosine_decay_schedule(cfg.lr, decay_steps=total)
        tx = optax.chain(
            *clip,
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(schedule, momentum=cfg.momentum),
        )
        return tx, None
    if cfg.optimizer == "adam_plateau":
        # plateau factor applied outside jit via a scale state (reference
        # train_model.py ReduceLROnPlateau semantics)
        tx = optax.chain(
            *clip,
            optax.scale_by_adam(),
            optax.inject_hyperparams(lambda lr: optax.scale(-lr))(lr=cfg.lr),
        )
        return tx, {"patience": 2, "factor": 0.5, "best": np.inf, "bad": 0}
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")


def augment_batch(rng, images, *, rotation_deg: float = 0.0, color_jitter: float = 0.0):
    """On-device train-transform, vectorized over the batch.

    Always: random crop (4px reflect pad) + horizontal flip. Flag-gated
    parity with the rest of the reference transform
    (utils/dataset_manager.py:31-38):
      - rotation_deg > 0: per-sample random rotation in
        [-rotation_deg, +rotation_deg] (reference RandomRotation(15)),
        bilinear resample, out-of-frame pixels fill with 0 — which in this
        pipeline's normalized space is the dataset mean color;
      - color_jitter > 0: brightness/saturation/contrast each scaled by a
        per-sample factor in [1-j, 1+j] (reference ColorJitter(.2,.2,.2)).
        Applied in normalized space — for contrast/saturation (affine about a
        mean) this matches the pre-normalization op up to the normalization
        affine; for brightness it additionally shifts by (b-1)*mean/std,
        a faithful-strength approximation rather than bit-parity with PIL.
    """
    n, h, w, c = images.shape
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    padded = jnp.pad(images, ((0, 0), (4, 4), (4, 4), (0, 0)), mode="reflect")
    ys = jax.random.randint(k1, (n,), 0, 9)
    xs = jax.random.randint(k2, (n,), 0, 9)

    def crop(img, y, x):
        return jax.lax.dynamic_slice(img, (y, x, 0), (h, w, c))

    images = jax.vmap(crop)(padded, ys, xs)
    flip = jax.random.bernoulli(k3, 0.5, (n,))
    images = jnp.where(flip[:, None, None, None], images[:, :, ::-1, :], images)
    if rotation_deg:
        rad = jnp.deg2rad(
            jax.random.uniform(k4, (n,), minval=-rotation_deg, maxval=rotation_deg)
        )
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        yy, xx = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32),
            jnp.arange(w, dtype=jnp.float32),
            indexing="ij",
        )

        def rot(img, a):
            # inverse mapping: sample the source at the back-rotated grid
            cos_a, sin_a = jnp.cos(a), jnp.sin(a)
            sy = cos_a * (yy - cy) - sin_a * (xx - cx) + cy
            sx = sin_a * (yy - cy) + cos_a * (xx - cx) + cx
            return jax.vmap(
                lambda ch: jax.scipy.ndimage.map_coordinates(
                    ch, [sy, sx], order=1, mode="constant", cval=0.0
                ),
                in_axes=-1,
                out_axes=-1,
            )(img)

        images = jax.vmap(rot)(images, rad)
    if color_jitter:
        kb, ks, kc = jax.random.split(k5, 3)
        j = color_jitter
        b = jax.random.uniform(kb, (n, 1, 1, 1), minval=1 - j, maxval=1 + j)
        s = jax.random.uniform(ks, (n, 1, 1, 1), minval=1 - j, maxval=1 + j)
        cf = jax.random.uniform(kc, (n, 1, 1, 1), minval=1 - j, maxval=1 + j)
        images = images * b  # brightness
        if c == 3:
            wgt = jnp.asarray([0.299, 0.587, 0.114], images.dtype)
            lum = jnp.sum(images * wgt, axis=-1, keepdims=True)
        else:
            lum = jnp.mean(images, axis=-1, keepdims=True)
        images = lum + (images - lum) * s  # saturation
        mean = jnp.mean(images, axis=(1, 2, 3), keepdims=True)
        images = mean + (images - mean) * cf  # contrast
    return images


def cross_entropy(logits, labels, label_smoothing: float = 0.0):
    nc = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, nc)
    if label_smoothing > 0:
        onehot = onehot * (1 - label_smoothing) + label_smoothing / nc
    return -jnp.mean(jnp.sum(onehot * jax.nn.log_softmax(logits), axis=-1))


def make_train_step(
    apply_fn: Callable,
    tx,
    label_smoothing: float = 0.0,
    augment: bool = True,
    *,
    rotation_deg: float = 0.0,
    color_jitter: float = 0.0,
):
    """Returns jitted step((params, state, opt_state), rng, images, labels)."""

    def loss_fn(params, state, rng, images, labels):
        logits, new_state = apply_fn(params, state, images, train=True, rng=rng)
        loss = cross_entropy(logits, labels, label_smoothing)
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        return loss, (new_state, acc)

    @partial(jax.jit, donate_argnums=(0,))
    def step(carry, rng, images, labels):
        params, state, opt_state = carry
        r_aug, r_drop = jax.random.split(rng)
        if augment:
            images = augment_batch(
                r_aug, images,
                rotation_deg=rotation_deg, color_jitter=color_jitter,
            )
        (loss, (new_state, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state, r_drop, images, labels
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, new_state, opt_state), loss, acc

    return step


def make_eval_step(apply_fn: Callable):
    @jax.jit
    def step(params, state, images, labels, valid):
        logits, _ = apply_fn(params, state, images, train=False)
        onehot = jax.nn.one_hot(labels, logits.shape[-1])
        per_example = -jnp.sum(onehot * jax.nn.log_softmax(logits), axis=-1)
        vf = valid.astype(jnp.float32)
        loss_sum = jnp.sum(per_example * vf)
        top1 = jnp.sum((jnp.argmax(logits, -1) == labels) * vf)
        return loss_sum, top1

    return step


def _gather_normalize(dimages, sel, mean, std):
    """Device-side batch assembly for device-resident datasets: gather rows,
    normalize u8 storage to the same f32 the host pipeline produces."""
    images = jnp.take(dimages, sel, axis=0)
    if mean is not None:
        images = (images.astype(jnp.float32) / 255.0 - mean) / std
    return images


def make_train_step_gather(
    apply_fn: Callable,
    tx,
    label_smoothing: float = 0.0,
    augment: bool = True,
    *,
    rotation_deg: float = 0.0,
    color_jitter: float = 0.0,
):
    """Device-resident-data variant of make_train_step: the batch is selected
    ON DEVICE from the resident split by a tiny int32 index vector
    (Dataset.device_arrays) — the per-step host->device transfer drops from
    the full batch (e.g. 77 MB at 224px bs128) to ~512 bytes.
    step(carry, rng, dimages, dlabels, mean, std, sel)."""

    def loss_fn(params, state, rng, images, labels):
        logits, new_state = apply_fn(params, state, images, train=True, rng=rng)
        loss = cross_entropy(logits, labels, label_smoothing)
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        return loss, (new_state, acc)

    @partial(jax.jit, donate_argnums=(0,))
    def step(carry, rng, dimages, dlabels, mean, std, sel):
        params, state, opt_state = carry
        images = _gather_normalize(dimages, sel, mean, std)
        labels = jnp.take(dlabels, sel, axis=0)
        r_aug, r_drop = jax.random.split(rng)
        if augment:
            images = augment_batch(
                r_aug, images,
                rotation_deg=rotation_deg, color_jitter=color_jitter,
            )
        (loss, (new_state, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state, r_drop, images, labels
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, new_state, opt_state), loss, acc

    return step


def make_eval_step_gather(apply_fn: Callable):
    @jax.jit
    def step(params, state, dimages, dlabels, mean, std, sel, valid):
        images = _gather_normalize(dimages, sel, mean, std)
        labels = jnp.take(dlabels, sel, axis=0)
        logits, _ = apply_fn(params, state, images, train=False)
        onehot = jax.nn.one_hot(labels, logits.shape[-1])
        per_example = -jnp.sum(onehot * jax.nn.log_softmax(logits), axis=-1)
        vf = valid.astype(jnp.float32)
        return jnp.sum(per_example * vf), jnp.sum(
            (jnp.argmax(logits, -1) == labels) * vf
        )

    return step


class Trainer:
    """Orchestrates epochs, eval, LR plateau logic and best-checkpointing."""

    def __init__(
        self,
        apply_fn: Callable,
        params: dict,
        state: dict,
        cfg: TrainConfig,
        train_data: Dataset,
        test_data: Dataset,
        *,
        augment: bool = True,
        log: Optional[Callable[[str], None]] = print,
        device_data: bool = False,
        mesh=None,
    ):
        """device_data=True keeps both splits resident in device memory and
        selects each batch on device by index — use when the splits fit in
        HBM and per-batch host->device streaming is the bottleneck (or
        leaks: tunnel-attached chips, docs/PERF.md round 4).

        Single-process: the whole split rides the default device
        (Dataset.device_arrays). Multi-process (round 5, VERDICT round-4
        weak #5): pass a (data x model) `mesh` — each process ships only ITS
        contiguous slice (parallel.mesh.resident_split) and batches gather
        LOCAL indices inside each shard (shard_map, no collective touches
        the image bytes). A mesh also works single-process (the same sharded
        steps on a local mesh). Per-shard shuffling replaces the global
        permutation: each device block shuffles its own resident rows, the
        standard shard-local-shuffle input discipline."""
        self.apply_fn = apply_fn
        self.cfg = cfg
        self.train_data = train_data
        self.test_data = test_data
        self.device_data = device_data
        self.mesh = mesh if device_data else None
        if device_data and jax.process_count() > 1 and mesh is None:
            raise ValueError(
                "multi-process device_data needs a mesh "
                "(Trainer(..., device_data=True, mesh=make_mesh(...)))"
            )
        if log is print and jax.process_index() != 0:
            log = None  # host-0-only logging on multi-host runs
        self.log = log or (lambda s: None)
        steps_per_epoch = max(len(train_data) // cfg.batch_size, 1)
        self.tx, self.plateau = make_optimizer(cfg, steps_per_epoch)
        if self.mesh is not None:
            from quantnet.parallel import mesh as meshlib
            from quantnet.parallel.steps import (
                make_parallel_eval_step_gather,
                make_parallel_train_step_gather,
            )

            if cfg.batch_size % self.mesh.shape["data"]:
                raise ValueError(
                    f"batch_size {cfg.batch_size} must divide across the "
                    f"data axis ({self.mesh.shape['data']})"
                )
            self._normalize = train_data.raw_u8 is not None
            # shard_params replicates onto the mesh with fresh buffers (the
            # donation-safety copy) — params replicated, batch sharded.
            params = meshlib.shard_params(self.mesh, params)
            state = meshlib.shard_params(self.mesh, state)
            self.opt_state = self.tx.init(params)
            self.carry = (params, state, self.opt_state)
            self.train_step = make_parallel_train_step_gather(
                apply_fn, self.tx, self.mesh,
                label_smoothing=cfg.label_smoothing, augment=augment,
                rotation_deg=getattr(cfg, "aug_rotation_deg", 0.0),
                color_jitter=getattr(cfg, "aug_color_jitter", 0.0),
                normalize=self._normalize,
            )
            self.eval_step = make_parallel_eval_step_gather(
                apply_fn, self.mesh, train_data.num_classes,
                normalize=self._normalize,
            )
            self.best_accuracy = 0.0
            self.best = None
            self.history = []
            return
        # Copy caller-owned trees: the jitted step donates its carry, which
        # would otherwise delete the caller's arrays after the first step.
        params = jax.tree_util.tree_map(jnp.copy, params)
        state = jax.tree_util.tree_map(jnp.copy, state)
        self.opt_state = self.tx.init(params)
        self.carry = (params, state, self.opt_state)
        if device_data:
            self.train_step = make_train_step_gather(
                apply_fn, self.tx, cfg.label_smoothing, augment,
                rotation_deg=getattr(cfg, "aug_rotation_deg", 0.0),
                color_jitter=getattr(cfg, "aug_color_jitter", 0.0),
            )
            self.eval_step = make_eval_step_gather(apply_fn)
        else:
            self.train_step = make_train_step(
                apply_fn, self.tx, cfg.label_smoothing, augment,
                rotation_deg=getattr(cfg, "aug_rotation_deg", 0.0),
                color_jitter=getattr(cfg, "aug_color_jitter", 0.0),
            )
            self.eval_step = make_eval_step(apply_fn)
        self.best_accuracy = 0.0
        self.best = None  # (params, state)
        self.history = []

    @property
    def params(self):
        return self.carry[0]

    @property
    def state(self):
        return self.carry[1]

    def _resident(self, dataset):
        """Per-mesh resident-split cache (the analog of
        Dataset.device_arrays' cache for the sharded mode)."""
        from quantnet.parallel import mesh as meshlib

        cache = getattr(dataset, "_dev_mesh", None)
        if cache is None or cache[0] is not self.mesh:
            dataset._dev_mesh = (
                self.mesh, meshlib.resident_split(self.mesh, dataset)
            )
        return dataset._dev_mesh[1]

    def _place_vec(self, vec: np.ndarray):
        """Shard a [global_bs] host vector along `data`; each process
        contributes its own slice in the multi-process world."""
        from quantnet.parallel.mesh import shard_batch

        pc, pi = jax.process_count(), jax.process_index()
        if pc > 1:
            lbs = vec.shape[0] // pc
            vec = vec[pi * lbs:(pi + 1) * lbs]
        return shard_batch(self.mesh, np.ascontiguousarray(vec))

    def evaluate(self) -> Tuple[float, float]:
        """Returns (test_loss, top1 accuracy) over the full test split.

        Tail batches are padded to the full batch size (pad_remainder) with a
        validity mask, so a non-divisible test split evaluates with ONE
        compiled program instead of recompiling on the tail shape."""
        params, state, _ = self.carry
        if self.mesh is not None:
            dimages, dlabels, mean, std, rows = self._resident(self.test_data)
            ndata = self.mesh.shape["data"]
            n = len(self.test_data)
            lbs = self.cfg.batch_size // ndata
            total_loss = total_top1 = seen = 0.0
            for start in range(0, rows, lbs):
                local = (start + np.arange(lbs)) % rows  # pad by wrapping
                in_range = (start + np.arange(lbs)) < rows
                sel = np.tile(local, ndata).astype(np.int32)
                # a padded-global row (d*rows + r >= n) duplicates an early
                # row (resident_split wraps); mask it out of the metrics
                valid = np.concatenate([
                    in_range & ((d * rows + local) < n) for d in range(ndata)
                ]).astype(np.float32)
                args = (dimages, dlabels)
                if self._normalize:
                    args += (mean, std)
                args += (self._place_vec(sel), self._place_vec(valid))
                loss, top1, _t5, nv = self.eval_step(params, state, *args)
                total_loss += float(loss)
                total_top1 += float(top1)
                seen += float(nv)
            return total_loss / max(seen, 1), total_top1 / max(seen, 1)
        total_loss, total_top1 = 0.0, 0.0
        n = len(self.test_data)
        seen = 0
        bs = self.cfg.batch_size
        if self.device_data:
            dimages, dlabels, mean, std = self.test_data.device_arrays()
            for start in range(0, n, bs):
                n_valid = min(bs, n - start)
                sel = (start + np.arange(bs)) % n  # pad by wrapping
                valid = (np.arange(bs) < n_valid).astype(np.float32)
                loss, top1 = self.eval_step(
                    params, state, dimages, dlabels, mean, std,
                    jnp.asarray(sel, jnp.int32), valid,
                )
                total_loss += float(loss)
                total_top1 += float(top1)
                seen += n_valid
            return total_loss / max(seen, 1), total_top1 / max(seen, 1)
        for images, labels in self.test_data.batches(bs, pad_remainder=True):
            bsz = images.shape[0]
            n_valid = min(bsz, n - seen)
            valid = (np.arange(bsz) < n_valid).astype(np.float32)
            loss, top1 = self.eval_step(params, state, images, labels, valid)
            total_loss += float(loss)
            total_top1 += float(top1)
            seen += n_valid
        return total_loss / max(seen, 1), total_top1 / max(seen, 1)

    def resume(self, path: str) -> int:
        """Restore {params, state, opt_state, epoch, best_accuracy} from an
        orbax checkpoint (the reference's --skip_training resume semantics,
        run_experiment.py:24,56, extended to mid-training restarts — the
        failure-recovery story of SURVEY.md section 5). Returns the epoch to
        continue from."""
        from quantnet.train import checkpoint as ckpt

        params, state, opt_state = self.carry
        target = {
            "params": params,
            "state": state,
            "opt_state": opt_state,
            "epoch": 0,
            "best_accuracy": 0.0,
        }
        restored = ckpt.restore(path, target=target)
        self.carry = (restored["params"], restored["state"], restored["opt_state"])
        self.best_accuracy = float(restored["best_accuracy"])
        self.best = (
            jax.tree_util.tree_map(jnp.copy, restored["params"]),
            jax.tree_util.tree_map(jnp.copy, restored["state"]),
        )
        return int(restored["epoch"]) + 1

    def train(
        self, save_path: Optional[str] = None, *, resume: bool = False,
        reload_best: bool = True,
    ) -> Tuple[dict, dict]:
        """reload_best keeps the reference's semantics (return the best-
        accuracy checkpoint, model_trainer.py:104-106). Pass False to return
        the raw end-of-training carry instead — epoch-at-a-time callers that
        probe the actual SGD trajectory (scripts/tpu_collapse_hunt.py) need
        the carry NOT silently reset to an older best checkpoint between
        calls."""
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed)
        start_epoch = 0
        if resume and save_path and os.path.exists(save_path):
            start_epoch = self.resume(save_path)
            self.log(f"resumed from {save_path} at epoch {start_epoch}")
        for epoch in range(start_epoch, cfg.epochs):
            t0 = time.time()
            # Loss/acc stay on device until epoch end: a float() per step would
            # force a host sync and serialize the dispatch pipeline (the whole
            # point of async dispatch is step i+1's host work overlapping step
            # i's device work).
            losses, accs = [], []
            if self.mesh is not None:
                dimages, dlabels, mean, std, rows = self._resident(
                    self.train_data
                )
                ndata = self.mesh.shape["data"]
                lbs = cfg.batch_size // ndata
                steps = max(rows // lbs, 1)
                # Shard-local shuffle: each device block permutes its own
                # resident rows (deterministic per epoch and shard, so every
                # process computes the identical global index vector).
                perms = [
                    np.resize(
                        np.random.default_rng(
                            (cfg.seed + epoch) * 100003 + d
                        ).permutation(rows),
                        steps * lbs,
                    )
                    for d in range(ndata)
                ]
                for s in range(steps):
                    rng, step_rng = jax.random.split(rng)
                    sel = np.concatenate(
                        [p[s * lbs:(s + 1) * lbs] for p in perms]
                    ).astype(np.int32)
                    args = (dimages, dlabels)
                    if self._normalize:
                        args += (mean, std)
                    args += (self._place_vec(sel),)
                    self.carry, loss, acc = self.train_step(
                        self.carry, step_rng, *args
                    )
                    losses.append(loss)
                    accs.append(acc)
            elif self.device_data:
                # Same seeded permutation the host pipeline uses
                # (Dataset.batches shuffle), so batch contents are identical;
                # only the assembly moves on device.
                dimages, dlabels, mean, std = self.train_data.device_arrays()
                n = len(self.train_data)
                if self.train_data.raw_u8 is not None:
                    # u8 host epochs shuffle via the native C++ PRNG; use the
                    # same source so batch contents match the host path.
                    perm = self.train_data._batcher().shuffled_indices(
                        cfg.seed + epoch
                    )
                else:
                    perm = np.random.default_rng(cfg.seed + epoch).permutation(n)
                for start in range(0, n - (n % cfg.batch_size), cfg.batch_size):
                    rng, step_rng = jax.random.split(rng)
                    sel = jnp.asarray(
                        perm[start:start + cfg.batch_size], jnp.int32
                    )
                    self.carry, loss, acc = self.train_step(
                        self.carry, step_rng, dimages, dlabels, mean, std, sel
                    )
                    losses.append(loss)
                    accs.append(acc)
            else:
                for images, labels in self.train_data.batches(
                    cfg.batch_size, shuffle=True, seed=cfg.seed + epoch,
                    drop_remainder=True,
                ):
                    rng, step_rng = jax.random.split(rng)
                    self.carry, loss, acc = self.train_step(
                        self.carry, step_rng, images, labels
                    )
                    losses.append(loss)
                    accs.append(acc)
            n_steps = len(losses)
            ep_loss = float(jnp.sum(jnp.stack(losses))) if losses else 0.0
            ep_acc = float(jnp.sum(jnp.stack(accs))) if accs else 0.0
            test_loss, test_acc = self.evaluate()
            self._plateau_update(test_loss)
            dt = time.time() - t0
            rec = {
                "epoch": epoch,
                "train_loss": ep_loss / max(n_steps, 1),
                "train_acc": ep_acc / max(n_steps, 1),
                "test_loss": test_loss,
                "test_acc": test_acc,
                "seconds": dt,
            }
            self.history.append(rec)
            self.log(
                f"epoch {epoch}: train_loss={rec['train_loss']:.4f} "
                f"train_acc={rec['train_acc']:.4f} test_acc={test_acc:.4f} ({dt:.1f}s)"
            )
            if test_acc > self.best_accuracy:
                self.best_accuracy = test_acc
                params, state, _ = self.carry
                self.best = (jax.tree_util.tree_map(jnp.copy, params),
                             jax.tree_util.tree_map(jnp.copy, state))
                if save_path:
                    self.save_checkpoint(save_path, epoch)
        # reload best (reference model_trainer.py:104-106). COPY, don't
        # alias: the next train() call donates the carry into the jitted
        # step, and an aliased reload would hand self.best's buffers to the
        # donor — deleting the best checkpoint (and the caller's returned
        # arrays) on any backend that honors donation. Repeated train()
        # calls (epoch-at-a-time loops, resumed finetunes) hit this as a
        # dead-buffer TPU runtime error.
        if reload_best and self.best is not None:
            params, state = self.best
            self.carry = (
                jax.tree_util.tree_map(jnp.copy, params),
                jax.tree_util.tree_map(jnp.copy, state),
                self.carry[2],
            )
        return self.carry[0], self.carry[1]

    def _plateau_update(self, test_loss: float):
        if self.plateau is None:
            return
        p = self.plateau
        if test_loss < p["best"] - 1e-6:
            p["best"], p["bad"] = test_loss, 0
            return
        p["bad"] += 1
        if p["bad"] > p["patience"]:
            p["bad"] = 0
            params, state, opt_state = self.carry
            # scale the injected lr hyperparam in-place
            hp = opt_state[1].hyperparams
            hp["lr"] = hp["lr"] * p["factor"]
            self.carry = (params, state, opt_state)

    def save_checkpoint(self, path: str, epoch: int):
        from quantnet.train import checkpoint as ckpt

        params, state, opt_state = self.carry
        ckpt.save(
            path,
            {
                "params": params,
                "state": state,
                "opt_state": opt_state,
                "epoch": epoch,
                "best_accuracy": self.best_accuracy,
            },
        )

    def save_history(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            for rec in self.history:
                f.write(json.dumps(rec) + "\n")
