"""int4-guard threshold sweep on the committed tracks: evidence, not a constant.

VERDICT round-4 weak #3: the guard's rel_threshold=50 was tuned on one
model's damage profile. This script measures the per-layer int4 damage
distribution ONCE per track (the one-compile ProbeGate sweep) and reports
the guard set at 25x / 50x / 100x median — a 2x range either side of the
default. The claim under test: the profiles are bimodal (outliers hundreds
of x median vs a bulk well under the cut), so the guard set is IDENTICAL
across the range, i.e. the choice of 50 is not load-bearing. Each track's
docs/<track>/guard_sweep.json records the distribution and the verdict;
tests/test_artifacts.py pins stability.

Run (TPU): PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_guard_sweep.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T0 = time.time()


def log(m):
    print(f"[+{time.time() - T0:.0f}s] {m}", flush=True)


def cached_224_batches(n_batches=2, bs=128):
    """Probe batches from the cached 224px synthetic train split (the same
    distribution the committed tracks calibrated on)."""
    xtr = np.load("runs/r224_cache_c10_n12800_xtr.npy", mmap_mode="r")
    return [
        (np.asarray(xtr[i * bs:(i + 1) * bs], np.float32), None)
        for i in range(n_batches)
    ]


def main():
    import jax

    from quantnet.models import convnet, resnet
    from quantnet.quantize.policy import int4_guard_sweep
    from quantnet.train import checkpoint as ckpt

    log(f"devices: {jax.devices()}")
    tracks = []
    if os.path.exists("runs/r3_cifar/saved/fp32.json"):
        import itertools

        from quantnet.data.datasets import make_synthetic

        tr, _ = make_synthetic(10, 32, 12800, 512)
        calib = list(
            itertools.islice(tr.batches(128, drop_remainder=True), 2)
        )
        tracks.append(("results_tpu_v5e", "runs/r3_cifar/saved/fp32",
                       convnet.apply, calib))
    if os.path.exists("runs/r3_r18_224/saved/fp32.json"):
        tracks.append(("results_tpu_v5e_r18_224", "runs/r3_r18_224/saved/fp32",
                       resnet.apply, cached_224_batches()))
    if os.path.exists("runs/r5_r50_224/saved/fp32.json"):
        tracks.append(("results_tpu_v5e_resnet50_224",
                       "runs/r5_r50_224/saved/fp32",
                       resnet.apply, cached_224_batches()))

    for name, path, apply_fn, calib in tracks:
        tree, meta = ckpt.load_artifact(path)
        params, state = tree["params"], tree["state"]
        log(f"{name}: sweeping thresholds 25/50/100 ({meta.get('model')})")
        sweep = int4_guard_sweep(
            apply_fn, params, state, calib, thresholds=(25.0, 50.0, 100.0)
        )
        out = {
            "thresholds": [25.0, 50.0, 100.0],
            "median_damage": sweep["median"],
            "guards": {str(k): v for k, v in sweep["guards"].items()},
            "stable_over_range": sweep["stable_over_range"],
            "rel_damage_top10": dict(sorted(
                sweep["rel_damage"].items(), key=lambda kv: -kv[1]
            )[:10]),
            "n_layers": len(sweep["damage"]),
        }
        os.makedirs(os.path.join("docs", name), exist_ok=True)
        with open(os.path.join("docs", name, "guard_sweep.json"), "w") as f:
            json.dump(out, f, indent=1)
        log(
            f"{name}: guard@50x={out['guards']['50.0']} "
            f"stable_over_range={out['stable_over_range']} "
            f"top_rel={max(sweep['rel_damage'].values()):.0f}x"
        )


if __name__ == "__main__":
    main()
