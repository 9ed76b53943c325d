"""Measure ResNet-50 static-INT8 throughput on the real TPU (fresh quantize,
synthetic calibration) — used to validate the block-boundary int8 handoff.

Prints ms/batch + img/s at the given batch sizes. Compare against
docs/PERF.md (pre-boundary-handoff: 11.96 ms @ bs128, 10,700 img/s).
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

T0 = time.time()


def log(msg):
    print(f"[+{time.time() - T0:.0f}s] {msg}", flush=True)


def main():
    from quantnet.bench.benchmark import InferenceBenchmark
    from quantnet.models import resnet
    from quantnet.quantize import static

    log(f"devices: {jax.devices()}")
    rng = jax.random.PRNGKey(0)
    params, state = resnet.init(rng)
    calib = jax.random.normal(jax.random.PRNGKey(1), (32, 224, 224, 3), jnp.float32)
    log("init done; quantizing (static PTQ, 1 synthetic calib batch)")
    qparams, qstate = static.quantize(params, state, resnet.apply, [(calib, None)])
    jax.block_until_ready(qparams)
    log("quantize done; benchmarking")

    bench = InferenceBenchmark(image_size=224, warmup=4, iters=20)
    for bs in [int(a) for a in sys.argv[1:]] or (128,):
        stats = bench.measure(resnet.apply, qparams, qstate, bs)
        log(
            f"static int8 bs={bs}: {stats['mean_ms']:.2f} ms "
            f"({stats['images_per_s']:,.0f} img/s)"
        )


if __name__ == "__main__":
    main()
