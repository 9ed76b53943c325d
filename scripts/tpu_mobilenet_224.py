"""MobileNetV2 224-px accuracy track + the CLE headline case, on chip.

Round-5 model-family addition. Same protocol as the ResNet tracks
(scripts/tpu_r18_224.py): train from scratch on the deterministic synthetic
224-px task (20 classes, 12,800 train / 10,240 val — zero-egress), quantize
the full scheme matrix, evaluate everything at n=10,240, and measure
deployment-tier throughput at the same shape.

The family-specific addition is the **CLE A/B at per-tensor weight scales**:
depthwise kernels have per-channel ranges spanning orders of magnitude, so
per-TENSOR weight quantization collapses MobileNets — the exact failure
mode cross-layer equalization was invented for (Nagel et al. 2019; MobileNet
is that paper's headline experiment). Rows `static_per_tensor` vs
`static_per_tensor_cle` measure the collapse and its data-free repair on a
TRAINED model (where the ReLU6 clip regime is the real one, not fresh-init).

Writes docs/results_tpu_v5e_mobilenet_224/{accuracy.json,benchmark.json,NOTE.md}
(consumed by tests/test_artifacts.py TRACKS).

Env knobs: MNV2_CLASSES (20), MNV2_EPOCHS (12), MNV2_TRAIN (12800),
MNV2_BS (128), MNV2_LR (0.1), MNV2_QAT_EPOCHS (1), MNV2_QAT_LR (0.01),
MNV2_ADAROUND (600), MNV2_AR_EXAMPLES (128).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_mobilenet_224.py
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
OUT = os.environ.get("MNV2_OUT", "docs/results_tpu_v5e_mobilenet_224")
RUN = os.environ.get("MNV2_RUN", "runs/r5_mnv2_224")
N_CLASSES = int(os.environ.get("MNV2_CLASSES", "20"))
EPOCHS = int(os.environ.get("MNV2_EPOCHS", "12"))
TRAIN_N = int(os.environ.get("MNV2_TRAIN", "12800"))
QAT_EPOCHS = int(os.environ.get("MNV2_QAT_EPOCHS", "1"))
BS = int(os.environ.get("MNV2_BS", "128"))
LR = float(os.environ.get("MNV2_LR", "0.1"))
QAT_LR = float(os.environ.get("MNV2_QAT_LR", "0.01"))
TEST_N = 10240
IMG = 224


def log(msg):
    print(f"[+{time.time() - T0:.0f}s] {msg}", flush=True)


def load_splits():
    """Disk-cached deterministic synthetic splits (shared cache layout with
    scripts/tpu_r18_224.py — the SAME task both ResNet tracks use, so
    cross-family accuracy rows are comparable)."""
    import numpy as np

    from quantnet.data.datasets import Dataset, make_synthetic

    cache = os.path.join("runs", f"r224_cache_c{N_CLASSES}_n{TRAIN_N}")
    if os.path.exists(cache + ".ok"):
        log("loading cached synthetic splits (mmap)")
        tr = Dataset(
            np.load(cache + "_xtr.npy", mmap_mode="r"),
            np.load(cache + "_ytr.npy"), N_CLASSES,
            "imagenet224-synthetic-train",
        )
        te = Dataset(
            np.load(cache + "_xte.npy", mmap_mode="r"),
            np.load(cache + "_yte.npy"), N_CLASSES,
            "imagenet224-synthetic-test",
        )
        te_small = Dataset(
            np.load(cache + "_xsm.npy", mmap_mode="r"),
            np.load(cache + "_ysm.npy"), N_CLASSES,
            "imagenet224-synthetic-test",
        )
        return tr, te, te_small
    tr, te = make_synthetic(
        N_CLASSES, IMG, TRAIN_N, TEST_N, name="imagenet224-synthetic"
    )
    _, te_small = make_synthetic(
        N_CLASSES, IMG, 1, 1024, name="imagenet224-synthetic"
    )
    os.makedirs("runs", exist_ok=True)
    np.save(cache + "_xtr.npy", tr.images)
    np.save(cache + "_ytr.npy", tr.labels)
    np.save(cache + "_xte.npy", te.images)
    np.save(cache + "_yte.npy", te.labels)
    np.save(cache + "_xsm.npy", te_small.images)
    np.save(cache + "_ysm.npy", te_small.labels)
    open(cache + ".ok", "w").write("ok")
    log("cached synthetic splits to disk")
    return tr, te, te_small


def main():
    from quantnet.core.config import TrainConfig
    from quantnet.evaluation.evaluator import compare_models_single_pass
    from quantnet.models import mobilenet
    from quantnet.quantize import adaround, bf16, dynamic, qat, static, weight_only
    from quantnet.quantize.bias_correct import bias_correct
    from quantnet.quantize.common import first_layer_path
    from quantnet.quantize.equalize import cross_layer_equalize
    from quantnet.quantize.fold import fold_model_jit
    from quantnet.quantize.policy import int4_guard
    from quantnet.train import checkpoint as ckpt
    from quantnet.train.trainer import Trainer

    log(
        f"devices: {jax.devices()} model=mobilenetv2 classes={N_CLASSES} "
        f"epochs={EPOCHS} train_n={TRAIN_N} bs={BS} lr={LR}"
    )
    tr, te, te_small = load_splits()

    os.makedirs(RUN, exist_ok=True)
    fp32_path = os.path.join(RUN, "saved", "fp32")
    if os.path.exists(fp32_path + ".json"):
        tree, _ = ckpt.load_artifact(fp32_path)
        params, state = tree["params"], tree["state"]
        log("resumed fp32 artifact from a previous run")
    else:
        params, state = mobilenet.init(
            jax.random.PRNGKey(0), num_classes=N_CLASSES
        )
        cfg = TrainConfig(
            epochs=EPOCHS, batch_size=BS, lr=LR, optimizer="sgd_cosine",
            seed=0, save_dir=os.path.join(RUN, "ckpt"), warmup_epochs=1.0,
        )
        trainer = Trainer(
            mobilenet.apply, params, state, cfg, tr, te_small,
            device_data=True,
        )
        params, state = trainer.train(
            save_path=os.path.join(RUN, "ckpt", "best"), resume=True
        )
        ckpt.save_artifact(
            fp32_path, {"params": params, "state": state},
            {"model": "mobilenetv2", "image_size": IMG, "classes": N_CLASSES},
        )
        log(f"trained: best small-split top1={trainer.best_accuracy:.4f}")

    tr.release_device()
    te_small.release_device()
    calib = list(itertools.islice(tr.batches(128, drop_remainder=True), 8))

    log("quantizing the full scheme matrix at 224 px")
    schemes = {"fp32": (params, state)}
    schemes["bf16"] = bf16.quantize(params, state)
    schemes["dynamic"] = dynamic.quantize(params, state)
    fparams, fstate = fold_model_jit(params, state)
    act_qparams = static.calibrate(
        mobilenet.apply, fparams, fstate, calib, observer="histogram"
    )
    schemes["static"] = static.bake(
        fparams, fstate, act_qparams, skip_first_layer=True
    )
    schemes["weight_only"] = weight_only.quantize(params, state)

    # --- CLE A/B: the paper's headline case, on the trained model ---
    # Per-TENSOR weight scales share one scale across a depthwise kernel's
    # wildly-spread channels; CLE migrates the spread into the neighbors.
    schemes["static_per_tensor"] = static.bake(
        fparams, fstate, act_qparams, per_channel=False,
        skip_first_layer=True,
    )
    eq_params, eq_state = cross_layer_equalize(params, state)
    eq_aq = static.calibrate(
        mobilenet.apply, eq_params, eq_state, calib, observer="histogram"
    )
    schemes["static_per_tensor_cle"] = static.bake(
        eq_params, eq_state, eq_aq, per_channel=False, skip_first_layer=True
    )
    # CLE function drift on the TRAINED fp32 model (ReLU6 clip regime of a
    # real checkpoint, not fresh init) — evaluated as its own accuracy row.
    schemes["fp32_cle"] = (eq_params, eq_state)

    # Sub-byte tiers: measured guard + layer-local AdaRound + bias
    # correction (the CIFAR-track recipe, quantnet/quantize/*).
    guard = int4_guard(mobilenet.apply, params, state, calib[:2])
    log(f"int4 guard (8-bit weights kept): {sorted(guard)}")
    w4a8_guard = dict(guard)
    w4a8_guard.pop(first_layer_path(fparams), None)
    ar_steps = int(os.environ.get("MNV2_ADAROUND", "600"))
    ar_examples = int(os.environ.get("MNV2_AR_EXAMPLES", "128"))
    ar_bs = 64
    ar_calib = [
        (x[i:i + ar_bs], y[i:i + ar_bs])
        for (x, y) in calib
        for i in range(0, x.shape[0], ar_bs)
    ]
    qp, qs = adaround.refine(
        *weight_only.quantize(
            params, state, bits=4, group_size=128, layer_policy=guard or None
        ),
        params, state, mobilenet.apply, ar_calib, steps=ar_steps,
        max_examples=ar_examples,
    )
    schemes["weight_only_int4"] = bias_correct(
        qp, qs, params, state, mobilenet.apply, ar_calib, max_examples=256
    )
    qp, qs = adaround.refine(
        *static.bake(
            fparams, fstate, act_qparams, skip_first_layer=True,
            weight_bits=4, weight_group_size=128,
            layer_policy=w4a8_guard or None,
        ),
        params, state, mobilenet.apply, ar_calib, steps=ar_steps,
        max_examples=ar_examples,
    )
    schemes["w4a8"] = bias_correct(
        qp, qs, params, state, mobilenet.apply, ar_calib, max_examples=256
    )

    if QAT_EPOCHS > 0:
        log(f"qat finetune ({QAT_EPOCHS} epoch)")
        fq_p, fq_s = qat.prepare(
            params, state, mobilenet.apply, calib, observer="histogram",
            skip_first_layer=True,
        )
        qcfg = TrainConfig(
            epochs=QAT_EPOCHS, batch_size=BS, lr=QAT_LR,
            optimizer="sgd_cosine", seed=0,
            save_dir=os.path.join(RUN, "qat"), grad_clip_norm=1.0,
        )
        qtrainer = Trainer(
            mobilenet.apply, fq_p, fq_s, qcfg, tr, te_small, device_data=True
        )
        fq_p, fq_s = qtrainer.train()
        schemes["qat"] = (qat.bake(fq_p), fq_s)
        tr.release_device()
        te_small.release_device()

    log(f"evaluating {len(schemes)} schemes, n={TEST_N}, single data pass")
    results = compare_models_single_pass(
        mobilenet.apply, schemes, te, batch_size=512
    )
    for name, r in results.items():
        delta = (r["top1"] - results["fp32"]["top1"]) * 100
        log(f"{name}: top1={r['top1']:.4f} ({delta:+.2f}pt) n={r['n']}")
        r["per_class"] = {str(k): v for k, v in r["per_class"].items()}

    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "accuracy.json"), "w") as f:
        json.dump(results, f, indent=1)

    from quantnet.bench.benchmark import InferenceBenchmark
    from quantnet.core.types import tree_nbytes

    bench = InferenceBenchmark(image_size=IMG, warmup=5, iters=50)
    bench_rows = {}
    for name in ("fp32", "static", "w4a8"):
        p, s = schemes[name]
        for bs in (256, 1):
            stats = bench.measure(mobilenet.apply, p, s, bs)
            stats["size_mb"] = tree_nbytes(p) / 1e6
            key = name if bs == 256 else f"{name}_bs1"
            bench_rows[key] = stats
            log(
                f"bench {key}: {stats['p50_ms']:.3f} ms p50 @bs{bs}, "
                f"{stats['images_per_s_p50']:.0f} img/s, "
                f"{stats['size_mb']:.1f} MB"
            )
    with open(os.path.join(OUT, "benchmark.json"), "w") as f:
        json.dump(bench_rows, f, indent=1, default=float)

    fp = results["fp32"]["top1"]
    st = results["static"]["top1"]
    pt = results["static_per_tensor"]["top1"]
    cle = results["static_per_tensor_cle"]["top1"]
    with open(os.path.join(OUT, "NOTE.md"), "w") as f:
        f.write(
            f"""# MobileNetV2 224-px accuracy track (round 5)

The depthwise-separable model family on the same deterministic synthetic
224-px task as the ResNet tracks ({N_CLASSES} classes, {TRAIN_N} train /
{TEST_N} val, zero-egress), trained from scratch for {EPOCHS} epochs
(SGD+cosine lr {LR}, 1-epoch warmup), histogram observer, fp32-stem static
deployment policy.

fp32 top-1 {fp:.4f}; static INT8 (per-channel) {st:.4f}
({(st - fp) * 100:+.2f}pt).

**The CLE headline case** (Nagel et al. 2019 — MobileNet is the paper's
own experiment): per-TENSOR weight scales across depthwise kernels give
{pt:.4f} ({(pt - fp) * 100:+.2f}pt); after data-free cross-layer
equalization the same per-tensor config reaches {cle:.4f}
({(cle - fp) * 100:+.2f}pt) — the repair costs zero training and zero
data. `fp32_cle` is the equalized model evaluated in fp32: its delta vs
`fp32` is the measured ReLU6 clip drift of the rescale on a trained
checkpoint.

Full matrix in `accuracy.json`; deployment-tier throughput at the same
shape (bs 256 and bs 1) in `benchmark.json`. Generated by
`scripts/tpu_mobilenet_224.py` on one TPU v5e chip.
"""
        )
    log(f"wrote {OUT}/")


if __name__ == "__main__":
    main()
