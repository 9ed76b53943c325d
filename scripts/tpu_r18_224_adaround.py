"""Refine the 224px track's sub-byte rows with layer-local AdaRound.

The round-4 224px run measured weight_only_int4 at −5.04pt and W4A8 at
−3.28pt vs fp32 (nearest rounding) — far beyond the ≤2pt bound the CIFAR
track's sub-byte tiers hold. At 224px/resnet18 most weight mass is 3×3 conv
kernels quantized per-channel int4, where the rounding residual dominates;
this is precisely the case learned rounding exists for
(quantnet/quantize/adaround.py, layer-local objective). This script rebuilds
both sub-byte trees from the committed fp32 artifact (same deterministic
calibration batches), refines them, re-evaluates at n=10,240, and updates
docs/results_tpu_v5e_r18_224/accuracy.json — refined rows become the tier
rows (the deployed sub-byte config for this track), with the nearest-rounding
originals preserved as `*_nearest`.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_r18_224_adaround.py
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
OUT = "docs/results_tpu_v5e_r18_224"
RUN = "runs/r3_r18_224"
N_CLASSES = int(os.environ.get("R224_CLASSES", "10"))
TRAIN_N = int(os.environ.get("R224_TRAIN", "12800"))
STEPS = int(os.environ.get("ADAROUND_STEPS", "600"))


def log(msg):
    print(f"[+{time.time() - T0:.0f}s] {msg}", flush=True)


def main():
    from quantnet.data.datasets import Dataset
    from quantnet.evaluation.evaluator import compare_models_single_pass
    from quantnet.models import resnet
    from quantnet.quantize import adaround, static, weight_only
    from quantnet.quantize.fold import fold_model_jit
    from quantnet.train import checkpoint as ckpt

    log(f"devices: {jax.devices()}")
    tree, meta = ckpt.load_artifact(os.path.join(RUN, "saved", "fp32"))
    params, state = tree["params"], tree["state"]

    cache = os.path.join("runs", f"r224_cache_c{N_CLASSES}_n{TRAIN_N}")
    assert os.path.exists(cache + ".ok"), "run scripts/tpu_r18_224.py first"
    tr = Dataset(
        np.load(cache + "_xtr.npy", mmap_mode="r"),
        np.load(cache + "_ytr.npy"), N_CLASSES, "r224-train",
    )
    te = Dataset(
        np.load(cache + "_xte.npy", mmap_mode="r"),
        np.load(cache + "_yte.npy"), N_CLASSES, "r224-test",
    )

    # Same deterministic head-of-epoch calibration slice the track used.
    calib = list(itertools.islice(tr.batches(128, drop_remainder=True), 8))

    log("rebuilding sub-byte trees (same deterministic calibration)")
    fparams, fstate = fold_model_jit(params, state)
    act_qparams = static.calibrate(
        resnet.apply, fparams, fstate, calib, observer="histogram"
    )

    # Measured int4 guard: the per-layer int4 damage at this checkpoint is
    # wildly non-uniform (stem 200x median, layer1/0/conv1 560x — together
    # 0.4% of weight bytes); those outliers keep 8-bit weights inside the
    # sub-byte tiers (quantnet/quantize/policy.py::int4_guard).
    from quantnet.quantize.common import first_layer_path
    from quantnet.quantize.policy import int4_guard

    guard = int4_guard(
        resnet.apply, params, state, calib[:2], rel_threshold=50.0
    )
    log(f"int4 guard (8-bit weights kept): {sorted(guard)}")
    w4a8_guard = dict(guard)
    w4a8_guard.pop(first_layer_path(fparams), None)  # stem already fp32-skipped

    schemes = {"fp32": (params, state)}
    q_int4 = weight_only.quantize(
        params, state, bits=4, group_size=128, layer_policy=guard or None
    )
    q_w4a8 = static.bake(
        fparams, fstate, act_qparams, skip_first_layer=True,
        weight_bits=4, weight_group_size=128,
        layer_policy=w4a8_guard or None,
    )

    for name, (qp, qs) in (("weight_only_int4", q_int4), ("w4a8", q_w4a8)):
        t1 = time.time()
        rp, rs = adaround.refine(
            qp, qs, params, state, resnet.apply, calib, steps=STEPS,
            max_examples=256,
        )
        jax.block_until_ready(jax.tree_util.tree_leaves(rp)[0])
        log(f"{name}: refined in {time.time() - t1:.0f}s ({STEPS} steps)")
        schemes[name] = (rp, rs)
        ckpt.save_artifact(
            os.path.join(RUN, "saved", f"{name}_adaround"),
            {"params": rp, "state": rs},
            {"model": "resnet18", "scheme": f"{name}_adaround"},
        )

    log(f"evaluating refined tiers at n={len(te)}")
    results = compare_models_single_pass(resnet.apply, schemes, te, batch_size=512)
    for name, r in results.items():
        delta = (r["top1"] - results["fp32"]["top1"]) * 100
        log(f"{name}: top1={r['top1']:.4f} ({delta:+.2f}pt)")

    with open(os.path.join(OUT, "accuracy.json")) as f:
        acc = json.load(f)
    # fp32 re-eval must reproduce the committed row (same data, same model).
    drift = abs(acc["fp32"]["top1"] - results["fp32"]["top1"])
    assert drift < 1e-6, (acc["fp32"]["top1"], results["fp32"]["top1"])
    for tier in ("weight_only_int4", "w4a8"):
        old = acc[tier]
        new = {
            k: ({str(kk): vv for kk, vv in v.items()} if k == "per_class" else v)
            for k, v in results[tier].items()
        }
        if new["top1"] > old["top1"]:
            # keep the ORIGINAL nearest-rounding row across re-runs
            acc.setdefault(f"{tier}_nearest", old)
            new["adaround_steps"] = STEPS
            new["int4_guard_int8_layers"] = sorted(guard)
            acc[tier] = new
            log(f"{tier}: adaround row shipped "
                f"({old['top1']:.4f} -> {new['top1']:.4f})")
        else:
            acc[f"{tier}_adaround"] = new
            log(f"{tier}: adaround did NOT improve; nearest row kept")
    with open(os.path.join(OUT, "accuracy.json"), "w") as f:
        json.dump(acc, f, indent=1)

    # idempotent NOTE update: drop any prior sub-byte section before appending
    with open(os.path.join(OUT, "NOTE.md")) as f:
        note = f.read()
    cut = note.find("\n## Sub-byte rows:")
    if cut != -1:
        note = note[:cut]
    with open(os.path.join(OUT, "NOTE.md"), "w") as f:
        f.write(note)
    with open(os.path.join(OUT, "NOTE.md"), "a") as f:
        i4o = acc.get("weight_only_int4_nearest", acc["weight_only_int4"])
        f.write(
            f"""
## Sub-byte rows: measured int4 guard + layer-local AdaRound (round 4)

Plain per-channel-int4-everywhere lost {(acc['fp32']['top1'] - i4o['top1']) * 100:.2f}pt
(int4 tier) at this track. The per-layer int4 damage is wildly non-uniform:
the 7x7 stem and layer1/0/conv1 — 0.4% of weight bytes — carry 200-560x the
median damage. The shipped sub-byte rows therefore (a) keep 8-bit weights
at those measured outliers ({sorted(guard)};
quantnet/quantize/policy.py::int4_guard, one compiled sweep) and (b) refine
the remaining int4 rounding with layer-local learned rounding
(quantnet/quantize/adaround.py, {STEPS} steps on the same 8x128 calibration
slice; `scripts/tpu_r18_224_adaround.py`). Nearest-rounding unguarded
originals preserved as `*_nearest` rows.
"""
        )
    log("updated accuracy.json + NOTE.md")


if __name__ == "__main__":
    main()
