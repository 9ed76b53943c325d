"""Probe: can the Pallas int8 GEMM beat XLA's s8 conv on ResNet's 1x1 convs?

Profiling (docs/PERF.md "where the time goes") shows XLA's 1x1 s8 convs run
at ~78 TOP/s vs the chip's 394 peak — the single largest identified
conv-efficiency gap. A 1x1 stride-1 conv IS a GEMM ([N*H*W, Cin] @ [Cin, Co]),
so the existing tiled Pallas int8 GEMM (quantnet/ops/pallas_matmul.py) is a
drop-in candidate. This measures both lowerings on every distinct 1x1 shape
in ResNet-50 @ bs128 (chain-differenced steady-state timing).

Run on the TPU: PYTHONPATH=. python scripts/tpu_1x1_pallas_probe.py
"""
from __future__ import annotations

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/quantnet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from quantnet.ops.pallas_matmul import int8_matmul_pallas

T0 = time.time()
BS = 128

# (H, Cin, Cout) for every distinct 1x1 stride-1 conv in ResNet-50 @ 224^2
SHAPES = [
    (56, 64, 256),    # stage1 conv3
    (56, 256, 64),    # stage1 conv1 (blocks 2+)
    (28, 512, 128),   # stage2 conv1
    (28, 128, 512),   # stage2 conv3
    (14, 1024, 256),  # stage3 conv1
    (14, 256, 1024),  # stage3 conv3
    (7, 2048, 512),   # stage4 conv1
    (7, 512, 2048),   # stage4 conv3
]


def log(msg):
    print(f"[+{time.time() - T0:.0f}s] {msg}", flush=True)


def chained(step):
    """K chained iterations with a real data dependency (int8 domain)."""

    def run(x, w, n):
        def body(_, c):
            y = step(c, w)
            # data-dependent ~0 perturbation the compiler can't fold away
            eps = (jnp.sum(y).astype(jnp.float32) * 1e-30).astype(jnp.int8)
            return c + eps

        xf = jax.lax.fori_loop(0, n, body, x)
        return xf.reshape(-1)[0].astype(jnp.float32)

    return jax.jit(run)


def _t(fn, *args):
    t0 = time.perf_counter()
    float(fn(*args))
    return (time.perf_counter() - t0) * 1e3


def measure(fn, x, w, long_iters=60):
    n1, nk = jnp.int32(1), jnp.int32(long_iters)
    float(fn(x, w, n1))  # compile
    base = min(_t(fn, x, w, n1) for _ in range(4))
    times = [(_t(fn, x, w, nk) - base) / (long_iters - 1) for _ in range(4)]
    return sorted(times)[len(times) // 2]


def main():
    log(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)

    def conv_step(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    def gemm_step(x, w):
        return int8_matmul_pallas(x, w)

    def gemm_step_small_n(x, w):
        # N=64/128 outputs: narrow N blocks, taller M blocks
        return int8_matmul_pallas(x, w, block_m=512, block_n=128, block_k=256)

    print(f"{'shape':>24} {'xla_ms':>8} {'xla_TOPs':>9} {'pl_ms':>8} {'pl_TOPs':>9} win")
    for h, cin, cout in SHAPES:
        m = BS * h * h
        tops = 2.0 * m * cin * cout / 1e12
        k1, k2 = jax.random.split(jax.random.fold_in(key, h * cin))
        ximg = jax.random.randint(k1, (BS, h, h, cin), -127, 128, jnp.int8)
        w4 = jax.random.randint(k2, (1, 1, cin, cout), -127, 128, jnp.int8)
        x2 = ximg.reshape(m, cin)
        w2 = w4.reshape(cin, cout)

        t_xla = measure(chained(conv_step), ximg, w4)
        t_pl = measure(chained(gemm_step), x2, w2)
        if cout <= 128:
            t_pl = min(t_pl, measure(chained(gemm_step_small_n), x2, w2))
        win = "PALLAS" if t_pl < t_xla else "xla"
        print(
            f"{f'{h}x{h} {cin}->{cout}':>24} {t_xla:8.3f} {tops / t_xla * 1e3:9.1f} "
            f"{t_pl:8.3f} {tops / t_pl * 1e3:9.1f} {win}",
            flush=True,
        )


if __name__ == "__main__":
    main()
