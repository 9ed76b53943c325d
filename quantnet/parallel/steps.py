"""Mesh-parallel train/eval steps: pjit over (data, model) with donation.

The jitted step functions here are the distributed twins of
quantnet/train/trainer.py's single-device steps: same math, with batch sharded
along `data`, params replicated (or fc-sharded along `model`), gradients
all-reduced by XLA from the sharding lattice — no hand-written collectives in
the step body (scaling-book recipe: pick mesh, annotate shardings, let XLA
insert collectives).
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quantnet.parallel.mesh import DATA_AXIS, batch_sharding, replicated
from quantnet.train.trainer import augment_batch, cross_entropy


def make_parallel_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    *,
    augment: bool = True,
    label_smoothing: float = 0.0,
    rotation_deg: float = 0.0,
    color_jitter: float = 0.0,
):
    """Returns step((params, state, opt_state), rng, images, labels) with
    images/labels sharded on `data` and the carry replicated (or model-sharded
    — XLA honors whatever sharding the carry arrays already have)."""
    data_sh = batch_sharding(mesh)
    rep = replicated(mesh)

    def loss_fn(params, state, rng, images, labels):
        logits, new_state = apply_fn(params, state, images, train=True, rng=rng)
        loss = cross_entropy(logits, labels, label_smoothing)
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        return loss, (new_state, acc)

    @partial(
        jax.jit,
        donate_argnums=(0,),
        in_shardings=(None, rep, data_sh, data_sh),
        out_shardings=None,
    )
    def step(carry, rng, images, labels):
        params, state, opt_state = carry
        r_aug, r_drop = jax.random.split(rng)
        if augment:
            images = augment_batch(
                r_aug, images,
                rotation_deg=rotation_deg, color_jitter=color_jitter,
            )
        (loss, (new_state, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, state, r_drop, images, labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, new_state, opt_state), loss, acc

    return step


def _make_shard_gather(mesh: Mesh):
    """Per-shard batch assembly for device-resident splits: every device
    gathers its own batch rows from its OWN resident block (LOCAL indices),
    inside a shard_map — a per-device program, so no collective ever moves
    the image bytes. The step's host->device traffic is the int32 index
    vector alone (~bytes), the multi-host twin of the single-chip
    device_data mode (quantnet/train/trainer.py::make_train_step_gather)."""
    from jax.experimental.shard_map import shard_map

    def blk(img_blk, lab_blk, sel_blk):
        return (
            jnp.take(img_blk, sel_blk, axis=0),
            jnp.take(lab_blk, sel_blk, axis=0),
        )

    return shard_map(
        blk,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
    )


def _normalize(images, mean, std):
    if mean is None:
        return images
    return (images.astype(jnp.float32) / 255.0 - mean) / std


def make_parallel_train_step_gather(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    *,
    augment: bool = True,
    label_smoothing: float = 0.0,
    rotation_deg: float = 0.0,
    color_jitter: float = 0.0,
    normalize: bool = True,
):
    """Device-resident-data twin of make_parallel_train_step.

    step(carry, rng, dimages, dlabels, mean, std, sel): dimages/dlabels are
    the resident split from parallel.mesh.resident_split (sharded on
    `data`); sel is int32[global_bs] sharded on `data`, entries LOCAL to
    each device's block. Pass mean=std=None (and normalize=False at trace
    time) for f32-resident splits."""
    data_sh = batch_sharding(mesh)
    rep = replicated(mesh)
    gather = _make_shard_gather(mesh)

    def loss_fn(params, state, rng, images, labels):
        logits, new_state = apply_fn(params, state, images, train=True, rng=rng)
        loss = cross_entropy(logits, labels, label_smoothing)
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        return loss, (new_state, acc)

    @partial(
        jax.jit,
        donate_argnums=(0,),
        in_shardings=(None, rep, None, None, rep, rep, data_sh)
        if normalize
        else (None, rep, None, None, data_sh),
    )
    def step(carry, rng, dimages, dlabels, *rest):
        if normalize:
            mean, std, sel = rest
        else:
            (sel,) = rest
            mean = std = None
        params, state, opt_state = carry
        images, labels = gather(dimages, dlabels, sel)
        images = _normalize(images, mean, std)
        r_aug, r_drop = jax.random.split(rng)
        if augment:
            images = augment_batch(
                r_aug, images,
                rotation_deg=rotation_deg, color_jitter=color_jitter,
            )
        (loss, (new_state, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, state, r_drop, images, labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, new_state, opt_state), loss, acc

    return step


def make_parallel_eval_step_gather(
    apply_fn: Callable, mesh: Mesh, num_classes: int, *, normalize: bool = True
):
    """Sharded eval over a resident split: gathers LOCAL indices per shard,
    masks pad rows via `valid` (f32[global_bs], sharded like sel) ->
    (loss_sum, top1_sum, top5_sum, n_valid)."""
    data_sh = batch_sharding(mesh)
    rep = replicated(mesh)
    gather = _make_shard_gather(mesh)

    @partial(
        jax.jit,
        in_shardings=(None, None, None, None, rep, rep, data_sh, data_sh)
        if normalize
        else (None, None, None, None, data_sh, data_sh),
    )
    def step(params, state, dimages, dlabels, *rest):
        if normalize:
            mean, std, sel, valid = rest
        else:
            sel, valid = rest
            mean = std = None
        images, labels = gather(dimages, dlabels, sel)
        images = _normalize(images, mean, std)
        logits, _ = apply_fn(params, state, images, train=False)
        preds = jnp.argmax(logits, -1)
        vf = valid.astype(jnp.float32)
        onehot = jax.nn.one_hot(labels, logits.shape[-1])
        per_example = -jnp.sum(onehot * jax.nn.log_softmax(logits), axis=-1)
        loss_sum = jnp.sum(per_example * vf)
        top1 = jnp.sum((preds == labels) * vf)
        _, topk_idx = jax.lax.top_k(logits, min(5, num_classes))
        top5 = jnp.sum(
            jnp.any(topk_idx == labels[:, None], axis=-1) * vf
        )
        return loss_sum, top1, top5, jnp.sum(vf)

    return step


def make_parallel_eval_step(apply_fn: Callable, mesh: Mesh, num_classes: int):
    """Sharded eval step -> (top1_sum, top5_sum, n) scalars (psum'd by XLA)."""
    data_sh = batch_sharding(mesh)

    @partial(jax.jit, in_shardings=(None, None, data_sh, data_sh), out_shardings=None)
    def step(params, state, images, labels):
        logits, _ = apply_fn(params, state, images, train=False)
        preds = jnp.argmax(logits, -1)
        top1 = jnp.sum(preds == labels)
        _, topk_idx = jax.lax.top_k(logits, min(5, num_classes))
        top5 = jnp.sum(jnp.any(topk_idx == labels[:, None], axis=-1))
        return top1, top5, labels.shape[0]

    return step
