"""Data-parallel scaling-efficiency measurement over a device mesh.

BASELINE.json's north-star metric (>=90% scaling efficiency at 2 hosts) has no
counterpart in the reference — it was single-device (SURVEY.md section 2.4).
Here: weak-scaling throughput of the jitted forward over growing mesh sizes
(per-device batch held constant), timed with the same chain-differenced
methodology as quantnet/bench/benchmark.py. eff(n) = T(n) / (n * T(1)).

Runs identically on a real pod slice and on the virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8) used by tests and the
driver dry-run.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from quantnet.bench.benchmark import scaling_efficiency, time_chained
from quantnet.parallel.mesh import batch_sharding, make_mesh, replicated, shard_params


def _mesh_sizes(n_devices: int) -> Tuple[int, ...]:
    sizes = []
    s = 1
    while s <= n_devices:
        sizes.append(s)
        s *= 2
    if sizes[-1] != n_devices:
        sizes.append(n_devices)
    return tuple(sizes)


def measure_scaling(
    apply_fn: Callable,
    params: dict,
    state: dict,
    *,
    image_size: int = 32,
    channels: int = 3,
    per_device_batch: int = 256,
    mesh_sizes: Optional[Sequence[int]] = None,
    iters: int = 20,
    windows: int = 3,
    seed: int = 0,
) -> Dict[str, Dict[int, float]]:
    """Returns {'throughput': {n: img/s}, 'efficiency': {n: eff}}.

    Weak scaling: global batch = n * per_device_batch, sharded along `data`;
    params replicated on each submesh. XLA inserts any cross-device reduction
    from the sharding lattice — there are none in pure DP inference, so ideal
    efficiency is achievable and deviations measure runtime overhead.
    """
    devices = jax.devices()
    sizes = tuple(mesh_sizes) if mesh_sizes else _mesh_sizes(len(devices))
    throughput: Dict[int, float] = {}
    for n in sizes:
        if n > len(devices):
            continue
        mesh = make_mesh(data_parallel=n, devices=devices[:n])
        p = shard_params(mesh, params)
        s = shard_params(mesh, state)
        batch = n * per_device_batch
        x = jax.device_put(
            jax.random.normal(
                jax.random.PRNGKey(seed), (batch, image_size, image_size, channels),
                jnp.float32,
            ),
            batch_sharding(mesh),
        )

        def run(p, s, x, k):
            def body(_, c):
                y, _s = apply_fn(p, s, c, train=False)
                return c + (jnp.sum(y) * 1e-24).astype(c.dtype)

            xf = jax.lax.fori_loop(0, k, body, x)
            return xf[(0,) * xf.ndim]

        fn = jax.jit(run, out_shardings=replicated(mesh))
        stats = time_chained(
            fn, (p, s, x), long_iters=max(iters, 2), windows=windows
        )
        throughput[n] = batch / (stats["mean_ms"] / 1e3)
    return {
        "throughput": throughput,
        "efficiency": scaling_efficiency(throughput),
    }
