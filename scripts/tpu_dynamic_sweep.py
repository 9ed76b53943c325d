"""Measure the dynamic-PTQ variants on real hardware (VERDICT round-1 #4).

Round-1 finding: dynamic INT8 ResNet-50 ran 0.82x fp32 — per-batch absmax +
quantize of every f32 activation tensor is pure VPU/HBM overhead. Round-2
fixes measured here:
  - bf16 inter-layer handoff (DynamicActQuant.handoff): halves the
    activation write+read traffic around each requantize;
  - fp32 stem (skip_first_layer), same deployment policy as static.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_dynamic_sweep.py
"""
import time

import jax
import jax.numpy as jnp

from quantnet.bench.benchmark import InferenceBenchmark
from quantnet.models import resnet
from quantnet.quantize import dynamic, static

print("devices:", jax.devices(), flush=True)
BS = 128

params, state = resnet.init(jax.random.PRNGKey(0), num_classes=1000, depth=50)
bench = InferenceBenchmark(image_size=224, warmup=5, iters=30)

variants = {}
variants["fp32"] = (params, state)
variants["dynamic_f32handoff"] = dynamic.quantize(params, state, handoff=None)
variants["dynamic_bf16handoff"] = dynamic.quantize(params, state)
variants["dynamic_bf16_fp32stem"] = dynamic.quantize(
    params, state, skip_first_layer=True
)
calib = jax.random.normal(jax.random.PRNGKey(1), (32, 224, 224, 3), jnp.float32)
variants["static_fp32stem"] = static.quantize(
    params, state, resnet.apply, [(calib, None)], skip_first_layer=True
)

for name, (p, s) in variants.items():
    t0 = time.time()
    stats = bench.measure(resnet.apply, p, s, BS)
    print(
        f"RESULT {name}: {stats['mean_ms']:.3f} ms/batch "
        f"{stats['images_per_s']:.0f} img/s "
        f"tops={stats.get('achieved_tops', float('nan')):.1f} "
        f"mfu={stats.get('mfu', float('nan')):.3f} "
        f"(+{time.time() - t0:.0f}s)",
        flush=True,
    )
