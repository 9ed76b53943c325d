"""Learned-rounding (AdaRound-style) on-chip measurement — CIFAR track.

The committed round-3 CIFAR artifacts put the sub-byte tiers at
weight_only_int4 −0.86pt / W4A8 −0.98pt vs fp32 (n=10,240,
docs/results_tpu_v5e/NOTE.md) — rounding residual is the dominant loss at
4 bits. This probe refines the EXACT committed artifacts
(runs/r3_cifar/saved/{weight_only_int4,w4a8}) with
quantnet/quantize/adaround.py on the same calibration distribution, then
re-evaluates both at n=10,240, writing before/after rows plus the flipped-
weight fraction to docs/results_tpu_v5e/adaround/accuracy.json (consumed by
tests/test_artifacts.py).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_adaround_probe.py
"""
from __future__ import annotations

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

T0 = time.time()
OUT = "docs/results_tpu_v5e/adaround"
STEPS = int(os.environ.get("ADAROUND_STEPS", "400"))


def log(msg):
    print(f"[+{time.time() - T0:.0f}s] {msg}", flush=True)


def flipped_fraction(before, after):
    from quantnet.core.types import QTensor
    from quantnet.quantize.common import walk_layers

    stats = {"flipped": 0, "total": 0}

    def collect(tree, out):
        def grab(path, layer):
            if isinstance(layer.get("w"), QTensor):
                out[path] = np.asarray(layer["w"].values, np.int32)
            return layer

        walk_layers(tree, grab)

    b, a = {}, {}
    collect(before, b)
    collect(after, a)
    for path in b:
        stats["flipped"] += int(np.sum(b[path] != a[path]))
        stats["total"] += b[path].size
    return stats["flipped"] / max(stats["total"], 1)


def main():
    from quantnet.data.datasets import load_cifar10
    from quantnet.evaluation.evaluator import Evaluator
    from quantnet.models import convnet
    from quantnet.quantize import adaround
    from quantnet.train import checkpoint as ckpt

    log(f"devices: {jax.devices()}")
    tree, _ = ckpt.load_artifact("runs/r3_cifar/saved/fp32")
    params, state = tree["params"], tree["state"]
    tr, te = load_cifar10(
        "./data", synthetic_train_size=12800, synthetic_test_size=10240
    )
    calib = list(itertools.islice(tr.batches(128, drop_remainder=True), 16))
    ev = Evaluator(convnet.apply, te, batch_size=512)

    r_fp32 = ev.evaluate(params, state)
    log(f"fp32: top1={r_fp32['top1']:.4f}")
    rows = {"fp32": {"top1": float(r_fp32["top1"]), "top5": float(r_fp32["top5"])}}

    for tier in ("weight_only_int4", "w4a8"):
        qtree, _ = ckpt.load_artifact(f"runs/r3_cifar/saved/{tier}")
        qp, qs = qtree["params"], qtree["state"]
        base = ev.evaluate(qp, qs)
        log(f"{tier} (nearest rounding): top1={base['top1']:.4f}")
        t1 = time.time()
        rp, rs = adaround.refine(
            qp, qs, params, state, convnet.apply, calib, steps=STEPS
        )
        jax.block_until_ready(jax.tree_util.tree_leaves(rp)[0])
        refine_s = time.time() - t1
        ref = ev.evaluate(rp, rs)
        frac = flipped_fraction(qp, rp)
        log(
            f"{tier} (adaround {STEPS} steps, {refine_s:.0f}s): "
            f"top1={ref['top1']:.4f} flipped={frac:.3%}"
        )
        rows[tier] = {"top1": float(base["top1"]), "top5": float(base["top5"])}
        rows[f"{tier}_adaround"] = {
            "top1": float(ref["top1"]),
            "top5": float(ref["top5"]),
            "flipped_fraction": frac,
            "steps": STEPS,
            "refine_seconds": round(refine_s, 1),
        }
        ckpt.save_artifact(
            f"runs/r3_cifar/saved/{tier}_adaround",
            {"params": rp, "state": rs},
            {"model": "simple_convnet", "scheme": f"{tier}_adaround"},
        )

    rows["_meta"] = {
        "n": 10240,
        "num_classes": 10,
        "calibration": "16 x bs128 synthetic-cifar10 train batches",
        "source_artifacts": "runs/r3_cifar/saved (round-3 committed run)",
    }
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "accuracy.json"), "w") as f:
        json.dump(rows, f, indent=1)
    log(f"wrote {OUT}/accuracy.json")


if __name__ == "__main__":
    main()
