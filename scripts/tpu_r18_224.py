"""224-px accuracy track: a ResNet trained AND quantized at ImageNet shape.

VERDICT round-2 missing #1 / mandate #5: the reference's ImageNet track
evaluates at 224 px (/root/reference/utils/dataset_manager.py:23-28), and
this framework's 224-px story was throughput-only — the ResNet-50 accuracy
table is measured at 64 px. This script closes the shape split: train
a ResNet from scratch at 224 px on the synthetic track (the per-resolution
class patterns make cross-resolution transfer impossible — the generator
draws protos at the target size, quantnet/data/datasets.py::make_synthetic),
then quantize the FULL scheme matrix and evaluate everything at 224 px,
n=10,240.

Round 5: parameterized by model depth (R224_DEPTH) so the FLAGSHIP
ResNet-50 gets the same 224-px accuracy track as resnet18 — the round-4
verdict's missing #1 (the 14,452 img/s throughput claim and the accuracy
matrix described two different shapes). depth=50 writes
docs/results_tpu_v5e_resnet50_224/.

TPU/tunnel-aware evaluation: the 9-model matrix at 224 px moves ~1.5 GB of
eval images; compare_models_single_pass ships each batch once and runs every
scheme on the resident arrays instead of paying the transfer 9 times
(quantnet/evaluation/evaluator.py).

Writes {R224_OUT}/{accuracy.json,benchmark.json,NOTE.md}
(consumed by tests/test_artifacts.py TRACKS).

Env knobs: R224_DEPTH (18), R224_CLASSES (default 20 — reduced-class per
the mandate), R224_EPOCHS (default 12), R224_TRAIN (default 12800),
R224_QAT_EPOCHS (1), R224_BS (128; use 64 for depth 50 — bs128 ResNet-50
training activations at 224 px exceed one v5e's 16 GB HBM next to the
resident splits), R224_LR (0.1, scale with batch), R224_QAT_LR.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_r18_224.py
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
DEPTH = int(os.environ.get("R224_DEPTH", "18"))
OUT = os.environ.get("R224_OUT") or (
    "docs/results_tpu_v5e_resnet50_224"
    if DEPTH == 50
    else f"docs/results_tpu_v5e_r{DEPTH}_224"
)
RUN = os.environ.get("R224_RUN") or (
    "runs/r3_r18_224" if DEPTH == 18 else f"runs/r5_r{DEPTH}_224"
)
N_CLASSES = int(os.environ.get("R224_CLASSES", "20"))
EPOCHS = int(os.environ.get("R224_EPOCHS", "12"))
TRAIN_N = int(os.environ.get("R224_TRAIN", "12800"))
QAT_EPOCHS = int(os.environ.get("R224_QAT_EPOCHS", "1"))
BS = int(os.environ.get("R224_BS", "128"))
LR = float(os.environ.get("R224_LR", "0.1"))
# ResNet-50's QAT finetune needed lr 0.003 on the 64-px track (round 4:
# -0.81pt at lr 0.01 -> -0.01pt at 0.003); default per depth accordingly.
QAT_LR = float(os.environ.get("R224_QAT_LR", "0.01" if DEPTH == 18 else "0.003"))
TEST_N = 10240
IMG = 224


def log(msg):
    print(f"[+{time.time() - T0:.0f}s] {msg}", flush=True)


def main():
    from quantnet.core.config import TrainConfig
    from quantnet.data.datasets import make_synthetic
    from quantnet.evaluation.evaluator import compare_models_single_pass
    from quantnet.models import resnet
    from quantnet.quantize import bf16, dynamic, qat, static, weight_only
    from quantnet.quantize.fold import fold_model_jit
    from quantnet.quantize.policy import quantize_optimized
    from quantnet.train import checkpoint as ckpt
    from quantnet.train.trainer import Trainer

    log(
        f"devices: {jax.devices()} model=resnet{DEPTH} classes={N_CLASSES} "
        f"epochs={EPOCHS} train_n={TRAIN_N} bs={BS} lr={LR}"
    )
    # Disk-cache the deterministic synthetic splits: generation at 224 px is
    # ~15 min of 2-core host CPU per launch, and tunnel stalls make restarts
    # a normal part of a run's life. mmap-load keeps host RSS low; the
    # device upload reads slices (chunked device_put).
    import numpy as np

    cache = os.path.join("runs", f"r224_cache_c{N_CLASSES}_n{TRAIN_N}")
    if os.path.exists(cache + ".ok"):
        log("loading cached synthetic splits (mmap)")
        xtr = np.load(cache + "_xtr.npy", mmap_mode="r")
        ytr = np.load(cache + "_ytr.npy")
        xte = np.load(cache + "_xte.npy", mmap_mode="r")
        yte = np.load(cache + "_yte.npy")
        xsm = np.load(cache + "_xsm.npy", mmap_mode="r")
        ysm = np.load(cache + "_ysm.npy")
        from quantnet.data.datasets import Dataset

        tr = Dataset(xtr, ytr, N_CLASSES, "imagenet224-synthetic-train")
        te = Dataset(xte, yte, N_CLASSES, "imagenet224-synthetic-test")
        te_small = Dataset(xsm, ysm, N_CLASSES, "imagenet224-synthetic-test")
    else:
        tr, te = make_synthetic(
            N_CLASSES, IMG, TRAIN_N, TEST_N, name="imagenet224-synthetic"
        )
        # Small split for per-epoch eval during training (full 10,240 at
        # 224 px per epoch would be transfer-dominated); same distribution,
        # same seed family, differs from the final eval only in sample count.
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

    os.makedirs(RUN, exist_ok=True)
    fp32_path = os.path.join(RUN, "saved", "fp32")
    if os.path.exists(fp32_path + ".json"):
        tree, _ = ckpt.load_artifact(fp32_path)
        params, state = tree["params"], tree["state"]
        log("resumed fp32 artifact from a previous run")
    else:
        params, state = resnet.init(
            jax.random.PRNGKey(0), num_classes=N_CLASSES, depth=DEPTH,
            zero_init_residual=True,
        )
        cfg = TrainConfig(
            epochs=EPOCHS, batch_size=BS, lr=LR, optimizer="sgd_cosine",
            seed=0, save_dir=os.path.join(RUN, "ckpt"), warmup_epochs=1.0,
        )
        # device_data: both splits live in HBM, batches select by index on
        # device. Without it the axon tunnel leaks every shipped batch
        # (~77 MB/step at these shapes) and a 28-epoch run OOM-kills the
        # host at ~epoch 12 (measured round 4, docs/PERF.md).
        trainer = Trainer(
            resnet.apply, params, state, cfg, tr, te_small, device_data=True
        )
        # resume=True: a tunnel stall mid-training (observed round 4: the
        # axon RPC wedged at epoch 5 for 45+ min) costs only the epochs
        # since the last best checkpoint, not the whole run.
        params, state = trainer.train(
            save_path=os.path.join(RUN, "ckpt", "best"), resume=True
        )
        ckpt.save_artifact(
            fp32_path, {"params": params, "state": state},
            {"model": f"resnet{DEPTH}", "image_size": IMG,
             "classes": N_CLASSES},
        )
        log(f"trained: best small-split top1={trainer.best_accuracy:.4f}")

    # Free the resident training split before quantization: AdaRound's
    # activation capture at ResNet-50/224px needs the HBM the split holds
    # (measured round 5: keeping both OOM'd the chip). The QAT stage
    # re-uploads when it needs residency again.
    tr.release_device()
    te_small.release_device()
    calib = list(itertools.islice(tr.batches(128, drop_remainder=True), 8))
    log("quantizing the full scheme matrix at 224 px")
    schemes = {"fp32": (params, state)}
    schemes["bf16"] = bf16.quantize(params, state)
    schemes["dynamic"] = dynamic.quantize(params, state)
    fparams, fstate = fold_model_jit(params, state)
    act_qparams = static.calibrate(
        resnet.apply, fparams, fstate, calib, observer="histogram"
    )
    schemes["static"] = static.bake(
        fparams, fstate, act_qparams, skip_first_layer=True
    )
    schemes["weight_only"] = weight_only.quantize(params, state)
    # Sub-byte deployment config for this track (measured round 4, NOTE.md):
    # per-layer int4 damage is wildly non-uniform at 224px — keep 8-bit
    # weights at the measured outliers (0.4% of bytes), then refine the int4
    # rounding layer-locally. Without both: int4 -5.04pt; with: +0.02pt.
    from quantnet.quantize import adaround
    from quantnet.quantize.common import first_layer_path
    from quantnet.quantize.policy import int4_guard

    guard = int4_guard(resnet.apply, params, state, calib[:2])
    log(f"int4 guard (8-bit weights kept): {sorted(guard)}")
    w4a8_guard = dict(guard)
    w4a8_guard.pop(first_layer_path(fparams), None)
    ar_steps = int(os.environ.get("R224_ADAROUND", "600"))
    # AdaRound keeps every refined layer's (input, target) activations
    # device-resident; at ResNet-50 scale that is ~70 MB/example at 224 px,
    # so the example budget must shrink with depth to fit one chip's HBM
    # next to the resident training splits.
    ar_examples = int(
        os.environ.get("R224_AR_EXAMPLES", "256" if DEPTH <= 18 else "64")
    )
    # max_examples rounds up to whole batches, so deep models also need
    # smaller calibration batches (32) for the capture to respect the cap.
    ar_bs = 128 if DEPTH <= 18 else 32
    ar_calib = [
        (x[i:i + ar_bs], y[i:i + ar_bs])
        for (x, y) in calib
        for i in range(0, x.shape[0], ar_bs)
    ]
    schemes["weight_only_int4"] = adaround.refine(
        *weight_only.quantize(
            params, state, bits=4, group_size=128, layer_policy=guard or None
        ),
        params, state, resnet.apply, ar_calib, steps=ar_steps,
        max_examples=ar_examples,
    )
    schemes["w4a8"] = adaround.refine(
        *static.bake(
            fparams, fstate, act_qparams, skip_first_layer=True,
            weight_bits=4, weight_group_size=128,
            layer_policy=w4a8_guard or None,
        ),
        params, state, resnet.apply, ar_calib, steps=ar_steps,
        max_examples=ar_examples,
    )
    qp, qs, _policy = quantize_optimized(
        params, state, resnet.apply, calib[:2], importance="static_map"
    )
    schemes["optimized"] = (qp, qs)

    log(f"qat finetune ({QAT_EPOCHS} epoch)")
    fq_p, fq_s = qat.prepare(
        params, state, resnet.apply, calib, observer="histogram",
        skip_first_layer=True,
    )
    qcfg = TrainConfig(
        epochs=QAT_EPOCHS, batch_size=BS, lr=QAT_LR, optimizer="sgd_cosine",
        seed=0, save_dir=os.path.join(RUN, "qat"), grad_clip_norm=1.0,
    )
    qtrainer = Trainer(
        resnet.apply, fq_p, fq_s, qcfg, tr, te_small, device_data=True
    )
    fq_p, fq_s = qtrainer.train()
    schemes["qat"] = (qat.bake(fq_p), fq_s)

    log(f"evaluating {len(schemes)} schemes, n={TEST_N}, single data pass")
    results = compare_models_single_pass(
        resnet.apply, schemes, te, batch_size=512 if DEPTH <= 18 else 256
    )
    for name, r in results.items():
        delta = (r["top1"] - results["fp32"]["top1"]) * 100
        log(f"{name}: top1={r['top1']:.4f} ({delta:+.2f}pt) n={r['n']}")
        r["per_class"] = {str(k): v for k, v in r["per_class"].items()}

    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "accuracy.json"), "w") as f:
        json.dump(results, f, indent=1)

    # Throughput at the SAME shape, deployment configs only (every scheme x
    # every batch size would be ~27 cold compiles over the tunnel).
    from quantnet.bench.benchmark import InferenceBenchmark
    from quantnet.core.types import tree_nbytes

    bench = InferenceBenchmark(image_size=IMG, warmup=5, iters=50)
    bench_rows = {}
    for name in ("fp32", "static", "w4a8"):
        p, s = schemes[name]
        # bs=1 rows: the reference's headline metric is SINGLE-IMAGE serving
        # latency (utils/inference_benchmark.py:30-79); bs=1 inference is
        # weight-HBM-bound, the regime where sub-byte weights matter
        # (VERDICT round-4 missing #4).
        for bs in (128, 1):
            stats = bench.measure(resnet.apply, p, s, bs)
            stats["size_mb"] = tree_nbytes(p) / 1e6
            key = name if bs == 128 else f"{name}_bs1"
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
    with open(os.path.join(OUT, "NOTE.md"), "w") as f:
        f.write(
            f"""# 224-px accuracy track (resnet{DEPTH}, round 5)

Accuracy measured AT THE SHAPE the throughput story uses (224 px — the
reference ImageNet track's input size,
/root/reference/utils/dataset_manager.py:23-28), closing the round-2
"flagship accuracy at flagship shapes" gap. Zero-egress, so the task is the
deterministic synthetic track at 224 px, {N_CLASSES} classes (reduced-class
per the round-2 verdict's allowance), {TRAIN_N} train / {TEST_N} val,
resnet{DEPTH} trained from scratch for {EPOCHS} epochs (SGD+cosine lr {LR},
1-epoch warmup, zero-init-residual), histogram observer, fp32-stem static
deployment policy, {QAT_EPOCHS}-epoch QAT finetune (lr {QAT_LR}).

fp32 top-1 {fp:.4f}; static INT8 {st:.4f} ({(st - fp) * 100:+.2f}pt, bound
0.3pt). Full matrix in `accuracy.json`; 224-px throughput for the
deployment tiers in `benchmark.json`. The 9-scheme evaluation ships every
batch once (`compare_models_single_pass`) — at 224 px the eval split is
~1.5 GB and per-scheme passes would be tunnel-transfer-bound.

Generated by `scripts/tpu_r18_224.py` on one TPU v5e chip.
"""
        )
    log(f"wrote {OUT}/")


if __name__ == "__main__":
    main()
