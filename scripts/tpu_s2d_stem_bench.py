"""Measure the space-to-depth stem rewrite on real hardware (PERF.md
headroom #1, VERDICT round-1 #3).

Variants (ResNet-50, bs128, 224^2, static INT8):
  - baseline: stock 7x7/s2 stem, fp32-stem deployment policy
  - s2d device: folded 4x4 stem, space-to-depth relayout on device
  - s2d host: folded 4x4 stem, input pre-transformed on host (the input
    pipeline emits [N,115,115,12] — no device relayout at all)
  - s2d int8-stem: folded stem WITHOUT skip_first_layer (12 input channels
    may make the int8 stem worthwhile where 3 channels did not)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_s2d_stem_bench.py
"""
import time

import jax
import jax.numpy as jnp

from quantnet.bench.benchmark import InferenceBenchmark, time_chained, chained_forward
from quantnet.models import resnet
from quantnet.quantize import static

print("devices:", jax.devices(), flush=True)
BS = 128

params, state = resnet.init(jax.random.PRNGKey(0), num_classes=1000, depth=50)
calib = jax.random.normal(jax.random.PRNGKey(1), (32, 224, 224, 3), jnp.float32)
p_s2d = resnet.fold_stem_s2d(params)

variants = {
    "baseline_fp32stem": (
        static.quantize(params, state, resnet.apply, [(calib, None)],
                        skip_first_layer=True),
        False,
    ),
    "s2d_device_fp32stem": (
        static.quantize(p_s2d, state, resnet.apply, [(calib, None)],
                        skip_first_layer=True),
        False,
    ),
    "s2d_host_fp32stem": (
        static.quantize(p_s2d, state, resnet.apply, [(calib, None)],
                        skip_first_layer=True),
        True,
    ),
    "s2d_device_int8stem": (
        static.quantize(p_s2d, state, resnet.apply, [(calib, None)]),
        False,
    ),
    "s2d_host_int8stem": (
        static.quantize(p_s2d, state, resnet.apply, [(calib, None)]),
        True,
    ),
    "baseline_int8stem": (
        static.quantize(params, state, resnet.apply, [(calib, None)]),
        False,
    ),
}

x_raw = jax.random.normal(jax.random.PRNGKey(2), (BS, 224, 224, 3), jnp.float32)
x_s2d = jax.device_put(resnet.stem_s2d_input(x_raw))

for name, ((p, s), host_prep) in variants.items():
    t0 = time.time()
    x = x_s2d if host_prep else x_raw
    fn = chained_forward(resnet.apply)
    stats = time_chained(fn, (p, s, x), long_iters=30, windows=5)
    img_s = BS / (stats["mean_ms"] / 1e3)
    print(
        f"RESULT {name}: {stats['mean_ms']:.3f} ms/batch {img_s:.0f} img/s "
        f"(+{time.time() - t0:.0f}s)",
        flush=True,
    )
