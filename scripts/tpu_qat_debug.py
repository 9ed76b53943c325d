"""On-chip repro of the CIFAR-track QAT finetune divergence (round 3).

The identical finetune (same artifact, data, seed, lr) converges on CPU but
collapses to chance within epoch 0 on the v5e (runs/r3_cifar/run_log.txt:
qat epoch 0 train_acc=0.2464 -> 0.0945). Suspects are TPU-only behaviors:
default-bf16 matmul/conv precision inside the fake-quant STE graph, or
buffer donation. This script traces per-step loss under (a) default
precision and (b) float32 matmul precision to split the hypothesis.

Run: timeout 1800 python scripts/tpu_qat_debug.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

T0 = time.time()


def log(msg):
    print(f"[+{time.time() - T0:.0f}s] {msg}", flush=True)


def run_variant(tag, clip):
    from quantnet.core.config import TrainConfig
    from quantnet.data.datasets import load_cifar10
    from quantnet.models import convnet
    from quantnet.quantize import qat
    from quantnet.train import checkpoint as ckpt
    from quantnet.train.trainer import make_optimizer, make_train_step

    tree, _ = ckpt.load_artifact("runs/r3_cifar/saved/fp32")
    params, state = tree["params"], tree["state"]
    tr, _te = load_cifar10(
        "./data", synthetic_train_size=12800, synthetic_test_size=1024
    )
    batches = list(tr.batches(128, shuffle=True, seed=0, drop_remainder=True))
    calib = list(itertools.islice(tr.batches(128, drop_remainder=True), 16))
    qp, qs = qat.prepare(
        params, state, convnet.apply, calib,
        observer="histogram", skip_first_layer=True,
    )
    cfg = TrainConfig(epochs=2, batch_size=128, lr=0.01, grad_clip_norm=clip)
    tx, _ = make_optimizer(cfg, steps_per_epoch=len(batches))
    step = make_train_step(convnet.apply, tx)
    carry = (qp, qs, tx.init(qp))
    rng = jax.random.PRNGKey(cfg.seed)

    for i, (xb, yb) in enumerate(batches[:60]):
        rng, sub = jax.random.split(rng)
        carry, loss, acc = step(carry, sub, xb, yb)
        if i % 4 == 0 or i < 8:
            log(f"{tag} step {i}: loss {float(loss):.4f} acc {float(acc):.4f}")


def main():
    log(f"devices: {jax.devices()}")
    # the fq islands now pin HIGHEST precision unconditionally; the two
    # variants isolate the grad-clip contribution on top of that.
    run_variant("precision-fix-only (clip=0)", 0.0)
    run_variant("precision+clip (clip=1)", 1.0)


if __name__ == "__main__":
    main()
