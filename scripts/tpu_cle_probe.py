"""Cross-layer equalization vs the committed PTQ collapse — on chip.

The qat_recovery demo (docs/results_tpu_v5e_resnet50/qat_recovery/)
constructs a function-preserving per-channel rescale on an intra-block
conv1->conv2 pair and shows per-tensor static PTQ collapsing 45.5% -> 4.7%
top-1, with a 2-epoch QAT finetune recovering to 41.1%. That construction
is exactly the failure mode cross-layer equalization (Nagel et al. 2019,
quantnet/quantize/equalize.py) removes analytically — so CLE should repair
the same collapse with NO data pass and NO training.

Measures, from the SAME committed checkpoint (runs/r3_hunt/fp32_collapse)
with the SAME per-tensor min-max config and eval split (n=10,240):
  fp32 / static-collapsed / static-after-CLE
and writes qat_recovery/cle.json alongside the existing artifacts.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_cle_probe.py
"""
from __future__ import annotations

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

T0 = time.time()
OUT = "docs/results_tpu_v5e_resnet50/qat_recovery"


def log(m):
    print(f"[+{time.time() - T0:.0f}s] {m}", flush=True)


def main():
    from quantnet.data.datasets import load_imagenet
    from quantnet.evaluation.evaluator import Evaluator
    from quantnet.models import resnet
    from quantnet.quantize import static
    from quantnet.quantize.equalize import cross_layer_equalize
    from quantnet.train import checkpoint as ckpt

    log(f"devices: {jax.devices()}")
    tree, meta = ckpt.load_artifact("runs/r3_hunt/fp32_collapse")
    params, state = tree["params"], tree["state"]
    tr, te = load_imagenet(
        "./data", image_size=64, num_classes=100,
        synthetic_train_size=25600, synthetic_test_size=10240,
    )
    calib = list(itertools.islice(tr.batches(128, drop_remainder=True), 16))
    ev = Evaluator(resnet.apply, te, batch_size=512)

    r_fp32 = ev.evaluate(params, state)
    log(f"fp32: top1={r_fp32['top1']:.4f}")

    kw = dict(observer="minmax", per_channel=False)  # the collapse config
    qp, qs = static.quantize(params, state, resnet.apply, calib, **kw)
    r_collapsed = ev.evaluate(qp, qs)
    log(f"static per-tensor (collapsed): top1={r_collapsed['top1']:.4f}")

    eq_p, eq_s = cross_layer_equalize(params, state)
    r_eq_fp = ev.evaluate(eq_p, eq_s)
    log(f"fp32 after CLE (function check): top1={r_eq_fp['top1']:.4f}")
    qp2, qs2 = static.quantize(eq_p, eq_s, resnet.apply, calib, **kw)
    r_cle = ev.evaluate(qp2, qs2)
    collapse_pt = (r_fp32["top1"] - r_collapsed["top1"]) * 100
    rec_pt = (r_cle["top1"] - r_collapsed["top1"]) * 100
    log(
        f"static per-tensor after CLE: top1={r_cle['top1']:.4f} "
        f"(recovered {rec_pt:+.2f}pt of the {collapse_pt:.2f}pt collapse, "
        f"zero training)"
    )

    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "cle.json"), "w") as f:
        json.dump(
            {
                "fp32": r_fp32,
                "static_collapsed": r_collapsed,
                "fp32_after_cle": r_eq_fp,
                "static_after_cle": r_cle,
                "config": "per_tensor_minmax (the committed collapse "
                          "config); CLE = cross_layer_equalize defaults "
                          "(2 iterations, auto pairs)",
                "checkpoint": "runs/r3_hunt/fp32_collapse (same as "
                              "accuracy.json)",
            },
            f, indent=1, default=float,
        )
    log(f"wrote {OUT}/cle.json")


if __name__ == "__main__":
    main()
