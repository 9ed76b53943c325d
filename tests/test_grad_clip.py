"""Gradient clipping is load-bearing for the QAT finetune (docs/PERF.md
round 3: the BN-folded STE graph diverged on-chip without it). Pin the
wiring so a trainer refactor can't silently drop it:
  - make_optimizer honors TrainConfig.grad_clip_norm with a global-norm clip;
  - the qat CLI defaults to clip 1.0 (the stabilized configuration).
"""
import jax
import jax.numpy as jnp
import optax

from quantnet.cli.main import build_parser
from quantnet.core.config import TrainConfig
from quantnet.train.trainer import make_optimizer


def _global_norm(tree):
    return optax.global_norm(tree)


def test_make_optimizer_clips_global_norm():
    cfg = TrainConfig(epochs=1, batch_size=8, lr=1.0, grad_clip_norm=1.0)
    tx, _ = make_optimizer(cfg, steps_per_epoch=10)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    opt_state = tx.init(params)
    huge = jax.tree_util.tree_map(lambda p: 1e6 * jnp.ones_like(p), params)
    updates, _ = tx.update(huge, opt_state, params)
    # SGD with lr 1.0 and momentum: first-step update magnitude equals the
    # clipped gradient's; a 1e6-norm gradient must arrive bounded by ~lr*1.0.
    assert float(_global_norm(updates)) < 2.0


def test_make_optimizer_no_clip_when_disabled():
    cfg = TrainConfig(epochs=1, batch_size=8, lr=1.0, grad_clip_norm=0.0)
    tx, _ = make_optimizer(cfg, steps_per_epoch=10)
    params = {"w": jnp.ones((4, 4))}
    opt_state = tx.init(params)
    huge = jax.tree_util.tree_map(lambda p: 1e3 * jnp.ones_like(p), params)
    updates, _ = tx.update(huge, opt_state, params)
    assert float(_global_norm(updates)) > 100.0


def test_qat_cli_defaults_to_clip_one():
    args = build_parser().parse_args(["qat"])
    assert args.grad_clip_norm == 1.0
