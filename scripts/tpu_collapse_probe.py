"""Probe which static-PTQ config genuinely collapses on the 20-epoch
undertrained ResNet-50 (runs/r3_collapse/saved/fp32, top-1 44.38%).

Round-2's collapse case (min-max observer, −4.25pt) did not reproduce on the
round-3 retrain (+0.03pt — the model trained better this time). The QAT
recovery demo needs an honest collapse, so measure the candidates:
  - per-channel minmax (stage-C result, expected fine)
  - per-tensor minmax (the reference engine's default weight granularity)
  - per-tensor moving_average

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_collapse_probe.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

T0 = time.time()


def log(msg):
    print(f"[+{time.time() - T0:.0f}s] {msg}", flush=True)


def main():
    from quantnet.data.datasets import load_imagenet
    from quantnet.evaluation.evaluator import ModelEvaluator
    from quantnet.models import resnet
    from quantnet.quantize import static
    from quantnet.train import checkpoint as ckpt

    log(f"devices: {jax.devices()}")
    tree, _ = ckpt.load_artifact("runs/r3_collapse/saved/fp32")
    params, state = tree["params"], tree["state"]
    apply_fn = resnet.apply
    tr, te = load_imagenet(
        "./data", image_size=64, num_classes=100,
        synthetic_train_size=25600, synthetic_test_size=2560,
    )
    calib = list(itertools.islice(tr.batches(128, drop_remainder=True), 16))
    ev = ModelEvaluator(apply_fn, te, batch_size=512)

    r = ev.evaluate(params, state)
    log(f"fp32: top1={r['top1']:.4f}")

    for name, kw in [
        ("static pc minmax", dict(observer="minmax", per_channel=True)),
        ("static pt minmax", dict(observer="minmax", per_channel=False)),
        ("static pt moving_average",
         dict(observer="moving_average", per_channel=False)),
    ]:
        qp, qs = static.quantize(params, state, apply_fn, calib, **kw)
        r = ev.evaluate(qp, qs)
        log(f"{name}: top1={r['top1']:.4f}")


if __name__ == "__main__":
    main()
