"""224-px accuracy track: resnet18 trained AND quantized at ImageNet shape.

VERDICT round-2 missing #1 / mandate #5: the reference's ImageNet track
evaluates at 224 px (/root/reference/utils/dataset_manager.py:23-28), and
this framework's 224-px story was throughput-only — the ResNet-50 accuracy
table is measured at 64 px. This script closes the shape split: train
resnet18 from scratch at 224 px on the synthetic track (the per-resolution
class patterns make cross-resolution transfer impossible — the generator
draws protos at the target size, quantnet/data/datasets.py::make_synthetic),
then quantize the FULL scheme matrix and evaluate everything at 224 px,
n=10,240.

TPU/tunnel-aware evaluation: the 9-model matrix at 224 px moves ~1.5 GB of
eval images; compare_models_single_pass ships each batch once and runs every
scheme on the resident arrays instead of paying the transfer 9 times
(quantnet/evaluation/evaluator.py).

Writes docs/results_tpu_v5e_r18_224/{accuracy.json,benchmark.json,NOTE.md}
(consumed by tests/test_artifacts.py TRACKS).

Env knobs: R224_CLASSES (default 20 — reduced-class per the mandate),
R224_EPOCHS (default 12), R224_TRAIN (default 12800), R224_QAT_EPOCHS (1).

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
OUT = "docs/results_tpu_v5e_r18_224"
RUN = "runs/r3_r18_224"
N_CLASSES = int(os.environ.get("R224_CLASSES", "20"))
EPOCHS = int(os.environ.get("R224_EPOCHS", "12"))
TRAIN_N = int(os.environ.get("R224_TRAIN", "12800"))
QAT_EPOCHS = int(os.environ.get("R224_QAT_EPOCHS", "1"))
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
        f"devices: {jax.devices()} classes={N_CLASSES} epochs={EPOCHS} "
        f"train_n={TRAIN_N}"
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
            jax.random.PRNGKey(0), num_classes=N_CLASSES, depth=18,
            zero_init_residual=True,
        )
        cfg = TrainConfig(
            epochs=EPOCHS, batch_size=128, lr=0.1, optimizer="sgd_cosine",
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
            {"model": "resnet18", "image_size": IMG, "classes": N_CLASSES},
        )
        log(f"trained: best small-split top1={trainer.best_accuracy:.4f}")

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
    schemes["weight_only_int4"] = adaround.refine(
        *weight_only.quantize(
            params, state, bits=4, group_size=128, layer_policy=guard or None
        ),
        params, state, resnet.apply, calib, steps=ar_steps, max_examples=256,
    )
    schemes["w4a8"] = adaround.refine(
        *static.bake(
            fparams, fstate, act_qparams, skip_first_layer=True,
            weight_bits=4, weight_group_size=128,
            layer_policy=w4a8_guard or None,
        ),
        params, state, resnet.apply, calib, steps=ar_steps, max_examples=256,
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
        epochs=QAT_EPOCHS, batch_size=128, lr=0.01, optimizer="sgd_cosine",
        seed=0, save_dir=os.path.join(RUN, "qat"), grad_clip_norm=1.0,
    )
    qtrainer = Trainer(
        resnet.apply, fq_p, fq_s, qcfg, tr, te_small, device_data=True
    )
    fq_p, fq_s = qtrainer.train()
    schemes["qat"] = (qat.bake(fq_p), fq_s)

    log(f"evaluating {len(schemes)} schemes, n={TEST_N}, single data pass")
    results = compare_models_single_pass(
        resnet.apply, schemes, te, batch_size=512
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
        stats = bench.measure(resnet.apply, p, s, 128)
        stats["size_mb"] = tree_nbytes(p) / 1e6
        bench_rows[name] = stats
        log(
            f"bench {name}: {stats['p50_ms']:.2f} ms p50 @bs128, "
            f"{stats['images_per_s_p50']:.0f} img/s, {stats['size_mb']:.1f} MB"
        )
    with open(os.path.join(OUT, "benchmark.json"), "w") as f:
        json.dump(bench_rows, f, indent=1, default=float)

    fp = results["fp32"]["top1"]
    st = results["static"]["top1"]
    with open(os.path.join(OUT, "NOTE.md"), "w") as f:
        f.write(
            f"""# 224-px accuracy track (resnet18, round 3)

Accuracy measured AT THE SHAPE the throughput story uses (224 px — the
reference ImageNet track's input size,
/root/reference/utils/dataset_manager.py:23-28), closing the round-2
"flagship accuracy at flagship shapes" gap. Zero-egress, so the task is the
deterministic synthetic track at 224 px, {N_CLASSES} classes (reduced-class
per the round-2 verdict's allowance), {TRAIN_N} train / {TEST_N} val,
resnet18 trained from scratch for {EPOCHS} epochs (SGD+cosine lr 0.1,
1-epoch warmup, zero-init-residual), histogram observer, fp32-stem static
deployment policy, {QAT_EPOCHS}-epoch QAT finetune.

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
