"""bs=1 / weight-HBM-bound regime + native-s4 adjudication (round 5).

VERDICT round-4 missing #4: sub-byte compression was disk-only (runtime
payloads int8-wide) and the repo had no ResNet bs=1 latency at all, while
bs=1 single-image serving is the reference's headline metric
(utils/inference_benchmark.py:30-79). This probe measures, on the real
chip:

  1. bs=1 and bs=128 latency for resnet18 (and resnet50 when its 224px
     artifact exists): fp32 / static-INT8 / W4A8 with int8-wide payloads /
     W4A8 with TRUE s4 payloads (quantize/common.py::s4_runtime_tree) /
     weight-only-int4 s8-wide vs s4.
  2. a weight-read microbench: (1,K)x(K,N) matmul with f32 / bf16 / s8 /
     s4-in-HBM weights at fc/1x1-conv shapes — isolates the HBM-bandwidth
     effect from whole-model noise.

The verdict (ship s4 for serving or document why not) goes to docs/PERF.md.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_s4_probe.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

T0 = time.time()


def log(m):
    print(f"[+{time.time() - T0:.0f}s] {m}", flush=True)


def time_fn(fn, *args, warmup=5, iters=50):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    # PER-CALL timing (dispatch + block each iteration): on a
    # tunnel-attached chip this is round-trip-bound, so micro() rows are
    # ADVISORY ONLY — the adjudication rests on model_rows(), which uses
    # the chain-differenced InferenceBenchmark harness (docs/PERF.md
    # methodology).
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3  # p50 ms


def s4_supported() -> bool:
    """Platform check shared with the product CLI (bench --s4-runtime):
    quantnet/quantize/common.py::s4_io_supported, with a log line for the
    probe record."""
    from quantnet.quantize.common import s4_io_supported

    ok = s4_io_supported()
    if not ok:
        log("s4-as-program-input unsupported on this platform "
            "(int4 jit inputs rejected; see docs/PERF.md round 5)")
    return ok


def micro(with_s4: bool):
    """Weight-read microbench: y = (x_s8 @ w) * scale at serving shapes."""
    shapes = [
        (1, 512, 1000),      # resnet fc @ bs1
        (49, 512, 2048),     # 7x7 spatial x 1x1 conv (layer4 bottleneck)
        (196, 256, 1024),    # 14x14 x 1x1 (layer3)
        (1, 4096, 512),      # convnet fc1 @ bs1
    ]
    rng = np.random.default_rng(0)
    for m, k, n in shapes:
        x8 = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        xf = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
        w8 = jnp.asarray(rng.integers(-7, 8, (k, n)), jnp.int8)
        w4 = jax.jit(lambda a: a.astype(jnp.int4))(w8) if with_s4 else None
        wf = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
        wb = wf.astype(jnp.bfloat16)
        scale = jnp.float32(0.01)

        @jax.jit
        def f32(x, w):
            return x @ w

        @jax.jit
        def bf16(x, w):
            return (x.astype(jnp.bfloat16) @ w).astype(jnp.float32)

        @jax.jit
        def s8(x, w):
            return jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * scale

        @jax.jit
        def s4(x, w):
            return jax.lax.dot_general(
                x, w.astype(jnp.int8), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * scale

        rows = {
            "f32": time_fn(f32, xf, wf),
            "bf16": time_fn(bf16, xf, wb),
            "s8": time_fn(s8, x8, w8),
        }
        if with_s4:
            rows["s4"] = time_fn(s4, x8, w4)
        log(
            f"micro ({m},{k})x({k},{n}): "
            + "  ".join(f"{k_}={v * 1e3:.1f}us" for k_, v in rows.items())
        )


def model_rows(name, apply_fn, params, state, size, calib_x, with_s4):
    from quantnet.bench.benchmark import InferenceBenchmark
    from quantnet.core.types import tree_nbytes
    from quantnet.quantize import static, weight_only
    from quantnet.quantize.common import s4_runtime_tree

    variants = {"fp32": (params, state)}
    variants["static"] = static.quantize(
        params, state, apply_fn, [(calib_x, None)], skip_first_layer=True
    )
    w4 = static.quantize(
        params, state, apply_fn, [(calib_x, None)], skip_first_layer=True,
        weight_bits=4, weight_group_size=128,
    )
    variants["w4a8_s8wide"] = w4
    wo4 = weight_only.quantize(params, state, bits=4, group_size=128)
    variants["wo_int4_s8wide"] = wo4
    if with_s4:
        variants["w4a8_s4"] = (s4_runtime_tree(w4[0]), w4[1])
        variants["wo_int4_s4"] = (s4_runtime_tree(wo4[0]), wo4[1])

    for bs in (1, 128):
        bench = InferenceBenchmark(
            image_size=size, warmup=5, iters=100 if bs == 1 else 30
        )
        for vname, (p, s) in variants.items():
            stats = bench.measure(apply_fn, p, s, bs)
            log(
                f"{name} {vname} bs={bs}: p50 {stats['p50_ms']:.3f} ms "
                f"({stats['images_per_s_p50']:.0f} img/s), "
                f"{tree_nbytes(p) / 1e6:.1f} MB"
            )


def main():
    from quantnet.models import resnet
    from quantnet.train import checkpoint as ckpt

    log(f"devices: {jax.devices()}")
    with_s4 = s4_supported()
    micro(with_s4)

    calib = np.load("runs/r224_cache_c10_n12800_xtr.npy", mmap_mode="r")
    calib_x = jnp.asarray(np.asarray(calib[:128], np.float32))
    tree, _ = ckpt.load_artifact("runs/r3_r18_224/saved/fp32")
    model_rows("r18_224", resnet.apply, tree["params"], tree["state"], 224,
               calib_x, with_s4)
    if os.path.exists("runs/r5_r50_224/saved/fp32.json"):
        tree, _ = ckpt.load_artifact("runs/r5_r50_224/saved/fp32")
        model_rows("r50_224", resnet.apply, tree["params"], tree["state"],
                   224, calib_x, with_s4)


if __name__ == "__main__":
    main()
