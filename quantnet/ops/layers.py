"""Stateless layer helpers: batchnorm (train/infer/fold), pooling, dropout.

BatchNorm is the reference's fusion target (fuse_modules pairs [conv,bn] at
models/dynamic_ptq_model.py:289-299, custom_quantization_model.py:180-190). Here
folding is a pure params transform (quantnet/quantize/fold.py); this module holds
the runtime math for the unfused FP32 training path.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

BN_EPS = 1e-5
BN_MOMENTUM = 0.1  # torch-style: new = (1-m)*running + m*batch


def batchnorm_init(dim: int):
    params = {"gamma": jnp.ones((dim,), jnp.float32), "beta": jnp.zeros((dim,), jnp.float32)}
    state = {"mean": jnp.zeros((dim,), jnp.float32), "var": jnp.ones((dim,), jnp.float32)}
    return params, state


def batchnorm_apply(
    params: dict,
    state: dict,
    x: jax.Array,
    *,
    train: bool,
) -> Tuple[jax.Array, dict]:
    """Normalize over all axes but the last (works for NHWC and NC)."""
    red = tuple(range(x.ndim - 1))
    if train:
        mean = jnp.mean(x, axis=red)
        var = jnp.var(x, axis=red)
        n = x.size // x.shape[-1]
        # unbiased variance for the running estimate (torch semantics)
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - BN_MOMENTUM) * state["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * state["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + BN_EPS)
    y = (x - mean) * inv * params["gamma"] + params["beta"]
    return y, new_state


def fold_batchnorm_into_conv(
    w: jax.Array,
    b: Optional[jax.Array],
    bn_params: dict,
    bn_state: dict,
    *,
    channel_axis: int = -1,
) -> Tuple[jax.Array, jax.Array]:
    """Fold inference-mode BN into the preceding conv/dense weights.

    w' = w * gamma/sqrt(var+eps) (per output channel), b' = (b - mean)*g + beta.
    For HWIO conv weights the output channel is the last axis; for (K, N) dense
    weights it is also the last axis — channel_axis=-1 covers both.
    """
    gamma, beta = bn_params["gamma"], bn_params["beta"]
    mean, var = bn_state["mean"], bn_state["var"]
    factor = gamma * jax.lax.rsqrt(var + BN_EPS)
    shape = [1] * w.ndim
    shape[channel_axis] = w.shape[channel_axis]
    w_f = w * factor.reshape(shape)
    b0 = b if b is not None else jnp.zeros_like(mean)
    b_f = (b0 - mean) * factor + beta
    return w_f, b_f


def maxpool2d(x: jax.Array, window: int = 2, stride: int = 2) -> jax.Array:
    if jnp.issubdtype(x.dtype, jnp.floating):
        lo = -jnp.inf  # literal: keeps reduce_window differentiable
    else:
        lo = jnp.asarray(jnp.iinfo(x.dtype).min, x.dtype)  # int8 handoff path
    return jax.lax.reduce_window(
        x, lo, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1), "VALID"
    )


def avgpool_global(x: jax.Array) -> jax.Array:
    """Global average pool NHWC -> NC."""
    return jnp.mean(x, axis=(1, 2))


def dropout(x: jax.Array, rate: float, rng: Optional[jax.Array], train: bool):
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
