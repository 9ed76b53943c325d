"""ResNet-50 static-INT8 batch-size sweep on the TPU (throughput-optimal bs).

Loads the static artifact saved by a previous `experiment --dataset imagenet`
run. Usage: python scripts/tpu_resnet_bs_sweep.py /tmp/tpu_resnet/saved_models
"""
from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/quantnet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

T0 = time.time()


def log(msg):
    print(f"[+{time.time() - T0:.0f}s] {msg}", flush=True)


def main():
    save_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_resnet/saved_models"
    from quantnet.bench.benchmark import InferenceBenchmark
    from quantnet.models import resnet
    from quantnet.train import checkpoint as ckpt

    tree, meta = ckpt.load_artifact(f"{save_dir}/static")
    log(f"loaded static artifact ({meta})")
    bench = InferenceBenchmark(image_size=224, warmup=4, iters=20)
    for bs in (128, 256):
        stats = bench.measure(resnet.apply, tree["params"], tree["state"], bs)
        log(
            f"static int8 bs={bs}: {stats['mean_ms']:.2f} ms "
            f"({stats['images_per_s']:,.0f} img/s)"
        )


if __name__ == "__main__":
    main()
