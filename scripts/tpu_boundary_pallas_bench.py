"""Measure the Pallas block-boundary kernel vs XLA's boundary fusion on the
real TPU (docs/PERF.md headroom #3 experiment).

Static-INT8 ResNet-50, deployment config (fp32 stem), bs128 @ 224^2 —
chain-differenced timing for both boundary backends in one process.
Usage: python scripts/tpu_boundary_pallas_bench.py [batch sizes...]
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
    from quantnet.core import config as cfg
    from quantnet.models import resnet
    from quantnet.quantize import static

    log(f"devices: {jax.devices()}")
    rng = jax.random.PRNGKey(0)
    params, state = resnet.init(rng)
    calib = jax.random.normal(jax.random.PRNGKey(1), (32, 224, 224, 3), jnp.float32)
    log("init done; quantizing (static PTQ, fp32 stem deployment config)")
    qparams, qstate = static.quantize(
        params, state, resnet.apply, [(calib, None)], skip_first_layer=True
    )
    jax.block_until_ready(qparams)

    bench = InferenceBenchmark(image_size=224, warmup=4, iters=20)
    batches = [int(a) for a in sys.argv[1:]] or [128]
    for backend in ("xla", "pallas"):
        cfg.flags.boundary_backend = backend

        # distinct apply per backend so the chained-program cache doesn't alias
        def apply_fn(p, s, x, *, _b=backend, **kw):
            return resnet.apply(p, s, x, **kw)

        for bs in batches:
            stats = bench.measure(apply_fn, qparams, qstate, bs)
            log(
                f"boundary={backend} bs={bs}: {stats['mean_ms']:.3f} ms "
                f"({stats['images_per_s']:,.0f} img/s)"
            )


if __name__ == "__main__":
    main()
