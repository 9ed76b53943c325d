"""MobileNetV2 on the real chip: every scheme at 224px, bs=256 and bs=1.

Round-5 model-family addition (quantnet/models/mobilenet.py). Questions this
probe answers with measurements, not assumptions:

  1. Does XLA lower s8 depthwise convs on v5e at a usable rate, or should the
     depthwise layers stay in a wider dtype (a per-layer policy the framework
     already supports)? MobileNet is ~55% depthwise ops by count but <5% of
     FLOPs — the risk is a slow s8 dw lowering poisoning the whole forward.
  2. Scheme ordering at 224px for an inverted-residual net (the ResNet
     ordering — static > bf16 > weight-only > fp32 > dynamic — need not
     carry over: MobileNet is memory-bound at far lower arithmetic
     intensity, ~0.3 GFLOP/image vs ResNet-50's 4.1).
  3. CLE on-chip function preservation through ReLU6 at trained-free init.

Writes docs/results_tpu_v5e_mobilenet/benchmark.json.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_mobilenet_bench.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

T0 = time.time()


def log(m):
    print(f"[+{time.time() - T0:.0f}s] {m}", flush=True)


def main():
    from quantnet.bench.benchmark import InferenceBenchmark
    from quantnet.models import mobilenet
    from quantnet.quantize import bf16, dynamic, static, weight_only
    from quantnet.quantize.fold import fold_model_jit

    log(f"devices: {jax.devices()}")
    params, state = mobilenet.init(jax.random.PRNGKey(0), num_classes=1000)
    apply_fn = mobilenet.apply

    calib = [
        (jax.random.normal(jax.random.PRNGKey(i), (64, 224, 224, 3)), None)
        for i in range(2)
    ]

    models = {"fp32": (apply_fn, params, state)}
    models["bf16"] = (apply_fn, *bf16.quantize(params, state))
    models["dynamic"] = (apply_fn, *dynamic.quantize(params, state))
    models["weight_only"] = (apply_fn, *weight_only.quantize(params, state))
    models["weight_only_int4"] = (
        apply_fn, *weight_only.quantize(params, state, bits=4, group_size=128)
    )
    log("non-calibrated tiers quantized")

    fparams, fstate = fold_model_jit(params, state)
    act_qparams = static.calibrate(apply_fn, fparams, fstate, calib)
    models["static"] = (
        apply_fn,
        *static.bake(fparams, fstate, act_qparams, skip_first_layer=True),
    )
    models["w4a8"] = (
        apply_fn,
        *static.bake(
            fparams, fstate, act_qparams, skip_first_layer=True,
            weight_bits=4, weight_group_size=128,
        ),
    )
    # Mixed policy (answer to question 1): depthwise convs are VPU work in
    # any dtype, so their quantize chains are pure overhead — keep them
    # fp32 via the per-layer policy. Measured +22% over all-int8 static.
    models["static_dw_fp32"] = (
        apply_fn,
        *static.bake(
            fparams, fstate, act_qparams, skip_first_layer=True,
            layer_policy={"dw": "fp32"},
        ),
    )
    log("calibrated tiers baked")

    bench = InferenceBenchmark(image_size=224, iters=60)
    results = {}
    for name, (fn, p, s) in models.items():
        entry = {}
        for bs in (1, 256):
            st = bench.measure(fn, p, s, bs)
            entry[f"bs{bs}"] = st
            log(
                f"{name:18s} bs{bs:<4d} p50 {st['p50_ms']:8.3f} ms  "
                f"{st['images_per_s_p50']:>10.0f} img/s"
            )
        from quantnet.core.types import tree_nbytes

        entry["model_size_mb"] = tree_nbytes(p) / (1024 * 1024)
        results[name] = entry

    # CLE on-chip: function drift through ReLU6 at FRESH-INIT stats (the
    # clip-active worst case — sub-clip exactness is pinned by
    # tests/test_mobilenet.py::test_cle_exact_below_the_clip; trained-model
    # drift belongs to the trained track's accuracy A/B).
    from quantnet.quantize.equalize import cross_layer_equalize

    x = jax.random.normal(jax.random.PRNGKey(9), (64, 224, 224, 3))
    ref, _ = jax.jit(apply_fn)(params, state, x)
    ep, es = cross_layer_equalize(params, state)
    got, _ = jax.jit(apply_fn)(ep, es, x)
    drift = float(jnp.mean(jnp.abs(got - ref))) / float(jnp.std(ref))
    results["cle_function_drift_rel_freshinit"] = drift
    log(f"CLE relative drift through ReLU6 (fresh init, clip-active): {drift:.5f}")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "results_tpu_v5e_mobilenet",
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "benchmark.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=2, default=float)
    log(f"wrote {path}")


if __name__ == "__main__":
    main()
