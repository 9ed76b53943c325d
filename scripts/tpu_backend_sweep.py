"""TPU backend sweep: which int8 lowering is fastest on this chip?

Compares steady-state chained-iteration time of SimpleConvNet bs=1024 across:
  fp32            — baseline
  bf16(weights)   — weight-only-style bf16 compute
  int8-xla        — static PTQ, lax.conv s8xs8->s32
  int8-im2col-xla — static PTQ, im2col + XLA int8 GEMM
  int8-im2col-pl  — static PTQ, im2col + Pallas int8 GEMM

Run on the TPU:  python scripts/tpu_backend_sweep.py [long_iters]
"""
from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/quantnet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from quantnet.core import config as cfg
from quantnet.models import convnet
from quantnet.quantize import static, weight_only

T0 = time.time()


def log(msg):
    print(f"[+{time.time() - T0:.0f}s] {msg}", flush=True)


def chained(apply_fn):
    def run(p, s, x, n):
        def body(_, c):
            y, _s = apply_fn(p, s, c, train=False)
            return c + (jnp.sum(y) * 1e-24).astype(c.dtype)

        xf = jax.lax.fori_loop(0, n, body, x)
        return xf[(0,) * xf.ndim]

    return jax.jit(run)


def measure(name, p, s, x, long_iters):
    fn = chained(convnet.apply)
    n1, nk = jnp.int32(1), jnp.int32(long_iters)
    t0 = time.time()
    float(fn(p, s, x, n1))
    log(f"{name}: compiled in {time.time() - t0:.0f}s")
    base = min(_t(fn, p, s, x, n1) for _ in range(4))
    times = [(_t(fn, p, s, x, nk) - base) / (long_iters - 1) for _ in range(4)]
    per = sorted(times)[len(times) // 2]
    bs = x.shape[0]
    log(f"{name}: {per:.4f} ms/iter -> {bs / per * 1e3:,.0f} img/s")
    return per


def _t(fn, *args):
    t0 = time.perf_counter()
    float(fn(*args))
    return (time.perf_counter() - t0) * 1e3


def main():
    long_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    log(f"start; devices={jax.devices()}")
    rng = jax.random.PRNGKey(0)
    params, state = convnet.init(rng)
    log("model init done")
    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (1024, 32, 32, 3), jnp.float32)
    )
    calib = jax.random.normal(jax.random.PRNGKey(2), (256, 32, 32, 3), jnp.float32)
    log("quantizing")
    sp, ss = static.quantize(params, state, convnet.apply, [(calib, None)])
    wp, ws = weight_only.quantize(params, state)
    jax.block_until_ready((sp, wp))
    log("quantize done")

    # Known from bench.py / earlier runs: fp32=2.678ms, int8-xla=2.358ms.
    results = {}

    cfg.flags.int8_conv_backend = "im2col"
    cfg.flags.int8_matmul_backend = "pallas"
    results["int8_im2col_pallas"] = measure("int8-im2col-pallas", sp, ss, x, long_iters)

    bf_p = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )
    results["bf16"] = measure("bf16", bf_p, state, x.astype(jnp.bfloat16), long_iters)

    results["weight_only_f32act"] = measure("weight_only", wp, ws, x, long_iters)

    cfg.flags.int8_conv_backend = "im2col"
    cfg.flags.int8_matmul_backend = "xla"
    results["int8_im2col_xla"] = measure("int8-im2col-xla", sp, ss, x, long_iters)

    log("summary (ms/iter @ bs1024): " + ", ".join(f"{k}={v:.4f}" for k, v in results.items()))


if __name__ == "__main__":
    main()
