"""INT4 weight-only tier on the real chip: throughput + size vs int8/fp32.

Measures SimpleConvNet (bs1024, 32²) and ResNet-50 (bs128, 224²) for
fp32 / weight-only INT8 / weight-only INT4 (group 128), and reports the
serialized model sizes. Run: python scripts/tpu_int4_bench.py
"""
from __future__ import annotations

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/quantnet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

T0 = time.time()


def log(msg):
    print(f"[+{time.time() - T0:.0f}s] {msg}", flush=True)


def run(tag, apply_fn, variants, image_size, bs, warmup=4, iters=30):
    from quantnet.bench.benchmark import InferenceBenchmark
    from quantnet.core.types import tree_nbytes

    bench = InferenceBenchmark(image_size=image_size, warmup=warmup, iters=iters)
    for name, (p, s) in variants.items():
        mb = tree_nbytes(p) / 1e6
        stats = bench.measure(apply_fn, p, s, bs)
        log(
            f"{tag} {name} bs={bs}: {stats['mean_ms']:.3f} ms "
            f"({stats['images_per_s']:,.0f} img/s), {mb:.2f} MB"
        )


def main():
    from quantnet.models import convnet, resnet
    from quantnet.quantize import weight_only

    log(f"devices: {jax.devices()}")

    rng = jax.random.PRNGKey(0)
    params, state = convnet.init(rng)
    variants = {
        "fp32": (params, state),
        "w8": weight_only.quantize(params, state),
        "w4g128": weight_only.quantize(params, state, bits=4, group_size=128),
    }
    run("convnet", convnet.apply, variants, 32, 1024)

    rp, rs = resnet.init(jax.random.PRNGKey(1), num_classes=1000, depth=50)
    rvariants = {
        "fp32": (rp, rs),
        "w8": weight_only.quantize(rp, rs),
        "w4g128": weight_only.quantize(rp, rs, bits=4, group_size=128),
    }
    run("resnet50", resnet.apply, rvariants, 224, 128, iters=15)


if __name__ == "__main__":
    main()
