"""Round-3 on-chip sweep: W4A8 tier + convnet deployment-config head-to-head.

1. SimpleConvNet bs1024 @ 32²: static fp32-stem (shipping config) vs dynamic
   bf16-handoff (round-2 PERF.md measured it faster: 1.894 vs 1.995 ms) vs
   W4A8 — decides what bench.py / __graft_entry__ ship (VERDICT round-2 #4).
2. ResNet-50 bs128 @ 224²: static INT8 vs W4A8 vs weight-only int4 — the
   W4A8 done-criterion is within ~5% of static's ms/batch at ~half the
   artifact size (VERDICT round-2 #1).

Run: timeout 3000 python scripts/tpu_r3_sweep.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

T0 = time.time()


def log(msg):
    print(f"[+{time.time() - T0:.0f}s] {msg}", flush=True)


def run(tag, apply_fn, variants, image_size, bs, warmup=8, iters=100):
    from quantnet.bench.benchmark import InferenceBenchmark
    from quantnet.core.types import tree_nbytes

    bench = InferenceBenchmark(image_size=image_size, warmup=warmup, iters=iters)
    for name, (p, s) in variants.items():
        mb = tree_nbytes(p) / 1e6
        stats = bench.measure(apply_fn, p, s, bs)
        log(
            f"{tag} {name} bs={bs}: mean {stats['mean_ms']:.3f} ms / "
            f"p50 {stats['p50_ms']:.3f} ms (p50 {bs / stats['p50_ms'] * 1e3:,.0f} "
            f"img/s), {mb:.2f} MB"
        )


def main():
    from quantnet.models import convnet, resnet
    from quantnet.quantize import dynamic, static, weight_only

    log(f"devices: {jax.devices()}")

    rng = jax.random.PRNGKey(0)
    params, state = convnet.init(rng)
    calib = [(jax.random.normal(jax.random.PRNGKey(1), (256, 32, 32, 3),
                                jnp.float32), None)]
    variants = {
        "static_fp32stem": static.quantize(
            params, state, convnet.apply, calib, skip_first_layer=True
        ),
        "dynamic_bf16": dynamic.quantize(params, state),
        "w4a8_fp32stem": static.quantize(
            params, state, convnet.apply, calib, skip_first_layer=True,
            weight_bits=4, weight_group_size=128,
        ),
    }
    run("convnet", convnet.apply, variants, 32, 1024)

    rp, rs = resnet.init(jax.random.PRNGKey(1), num_classes=1000, depth=50)
    rcalib = [(jax.random.normal(jax.random.PRNGKey(2), (64, 224, 224, 3),
                                 jnp.float32), None)]
    rvariants = {
        "static_fp32stem": static.quantize(
            rp, rs, resnet.apply, rcalib, skip_first_layer=True
        ),
        "w4a8_fp32stem": static.quantize(
            rp, rs, resnet.apply, rcalib, skip_first_layer=True,
            weight_bits=4, weight_group_size=128,
        ),
        "w4_weight_only": weight_only.quantize(rp, rs, bits=4, group_size=128),
    }
    run("resnet50", resnet.apply, rvariants, 224, 128, iters=50)


if __name__ == "__main__":
    main()
