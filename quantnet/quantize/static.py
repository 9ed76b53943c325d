"""Static PTQ: calibrated, frozen per-tensor activation scale/zero-point.

This is the scheme the reference *named* but never implemented — its
StaticPTQModel ignored the calibration loader and fell back to dynamic quant
(reference models/static_ptq_model.py:19-34; SURVEY.md behavior note 3). Here
calibration actually runs: a jitted step captures every quantizable layer's
input activation, updates an observer pytree on device (min-max, moving-average
or histogram — quantnet/core/observers.py), and the resulting frozen affine
params are baked into the quantized tree as ActQuant leaves.

The resulting inference graph is fully-INT8 compute: every conv/matmul runs
int8 x int8 -> int32 on the MXU; the inter-layer dequant->requant chains are
elementwise and fused by XLA into the surrounding ops (they never round-trip
through HBM), which is the TPU equivalent of an explicit int8 tensor handoff.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax

from quantnet.core.observers import make_observer
from quantnet.core.types import ActQuant
from quantnet.quantize.common import (
    first_layer_path,
    last_layer_path,
    quantize_weight,
    resolve_policy,
    walk_layers,
    weight_colsum,
)
from quantnet.quantize.fold import fold_model

# apply_fn contract: apply_fn(params, state, x, capture=dict) -> (logits, state)
ApplyFn = Callable


def calibrate(
    apply_fn: ApplyFn,
    params: dict,
    state: dict,
    batches: Iterable,
    *,
    observer: str = "minmax",
    observer_kwargs: Optional[dict] = None,
    include_output_stats: bool = False,
    cross_process: bool = True,
) -> Dict[str, Tuple[jax.Array, jax.Array]]:
    """Run calibration batches, return {layer_path: (scale, zero_point)}.

    `params` must already be BN-folded (capture hooks live on the folded path).
    The per-batch observer update is a single jitted function over the whole
    observer pytree — one device program per batch, no per-layer host syncs.
    ":out" capture keys (pre-add residual stats) are observed only when
    include_output_stats is set — they exist solely for pre_add_quant.

    Multi-host: when `jax.process_count() > 1` each process observes only its
    own data shard; baking per-process statistics into supposedly-replicated
    params would freeze DIVERGENT scales on different hosts. With
    cross_process=True (default) the finished observer pytree is all-gathered
    once and folded with each observer's `merge_all` — deterministically, in
    process-index order — so every process extracts bit-identical qparams
    that reflect the union of the calibration data. One collective per
    calibration, never per batch.
    """
    observer_kwargs = observer_kwargs or {}

    # Trace once to discover capture keys (uses jax.eval_shape - no FLOPs).
    def _probe(params, state, x):
        cap = {}
        apply_fn(params, state, x, capture=cap)
        return cap

    batches = iter(batches)
    first_batch = next(batches)
    x0 = first_batch[0] if isinstance(first_batch, (tuple, list)) else first_batch
    cap_shapes = jax.eval_shape(_probe, params, state, x0)
    keys = [
        k for k in cap_shapes if include_output_stats or ":out" not in k
    ]
    obs = {k: make_observer(observer, **observer_kwargs) for k in keys}

    @partial(jax.jit, donate_argnums=(0,))
    def step(obs, x):
        cap = {}
        apply_fn(params, state, x, capture=cap)
        return {k: obs[k].update(cap[k]) for k in obs}

    obs = step(obs, x0)
    for batch in batches:
        x = batch[0] if isinstance(batch, (tuple, list)) else batch
        obs = step(obs, x)

    if cross_process and jax.process_count() > 1:
        obs = _merge_observers_across_processes(obs)

    # One jitted extraction over the whole observer pytree (the eager per-layer
    # version pays a host round-trip per scale).
    return jax.jit(lambda obs: {k: o.qparams() for k, o in obs.items()})(obs)


def _merge_observers_across_processes(obs: dict) -> dict:
    """All-gather the finished observer pytree and fold per-process states
    with the observer's merge_all. Every process gathers the same data and
    folds in the same (process-index) order, so the merged observers — and
    therefore the baked ActQuant scales — are bit-identical on every host."""
    from jax.experimental import multihost_utils

    nproc = jax.process_count()
    # leaves come back stacked along a new leading process axis
    gathered = multihost_utils.process_allgather(obs)
    merged = {}
    for key, local in obs.items():
        g = gathered[key]
        states = [
            jax.tree_util.tree_map(lambda a, i=i: jax.numpy.asarray(a)[i], g)
            for i in range(nproc)
        ]
        merged[key] = type(local).merge_all(states)
    return merged


def quantize(
    params: dict,
    state: dict,
    apply_fn: ApplyFn,
    calibration_batches: Iterable,
    *,
    observer: str = "minmax",
    per_channel: bool = True,
    skip_last_layer: bool = False,
    skip_first_layer: bool = False,
    pre_add_quant: bool = False,
    layer_policy: Optional[dict] = None,
    last_layer_name: Optional[str] = None,
    weight_bits: int = 8,
    weight_group_size: Optional[int] = None,
) -> Tuple[dict, dict]:
    """FP32 (params, state) -> statically-quantized (params', {}).

    weight_bits=4 (+ weight_group_size, e.g. 128) is the **W4A8 tier**:
    4-bit weights — group-wise scales on linear reductions, per-channel on
    conv kernels — running inside the SAME int8-activation MXU path as
    plain static PTQ (quantnet/ops/linear.py grouped static branch), so the
    sub-byte size win no longer forfeits static's speedup. Artifacts stay
    nibble-packed on disk (quantnet/train/checkpoint.py). This realizes the
    mixed-precision intent of the reference's optimized scheme
    (models/optimized_custom_quantization.py:105-128) at a level its
    all-identical-qconfig implementation never reached.

    Two device programs total: the BN fold (jitted) and the weight-quant bake
    (jitted), plus one jitted calibration step per batch in between.

    skip_first_layer keeps the stem in fp32 compute (its output still hands
    off int8 to the next static layer) — the standard deployment policy for
    C=3 image stems, faster AND more accurate on TPU (see
    quantnet/quantize/common.py::first_layer_path).

    pre_add_quant quantizes residual-branch outputs before the add wherever
    the model captured ":out" stats (ResNet downsample blocks): the
    reference's own residual semantics (custom_quantization_model.py:95-100
    dequantizes both operands before adding) and a bandwidth win — both
    branch tensors cross HBM as int8 instead of a raw s32/f32 accumulator.
    """
    from quantnet.quantize.fold import fold_model_jit

    params, state = fold_model_jit(params, state)
    act_qparams = calibrate(
        apply_fn, params, state, calibration_batches, observer=observer,
        include_output_stats=pre_add_quant,
    )
    return bake(
        params, state, act_qparams,
        per_channel=per_channel, skip_last_layer=skip_last_layer,
        skip_first_layer=skip_first_layer, pre_add_quant=pre_add_quant,
        layer_policy=layer_policy, last_layer_name=last_layer_name,
        weight_bits=weight_bits, weight_group_size=weight_group_size,
    )


def bake(
    params: dict,
    state: dict,
    act_qparams: Dict[str, Tuple[jax.Array, jax.Array]],
    *,
    per_channel: bool = True,
    skip_last_layer: bool = False,
    skip_first_layer: bool = False,
    pre_add_quant: bool = False,
    layer_policy: Optional[dict] = None,
    last_layer_name: Optional[str] = None,
    weight_bits: int = 8,
    weight_group_size: Optional[int] = None,
) -> Tuple[dict, dict]:
    """Bake a statically-quantized tree from already-calibrated activation
    qparams. `params` must be BN-folded (the same tree calibrate() saw).

    Public so callers can share ONE calibration pass across several weight
    precision tiers — e.g. the experiment pipeline bakes static INT8 and
    W4A8 from the same observer statistics (quantnet/cli/main.py), paying
    the per-batch calibration programs once."""
    if weight_bits not in (8, 4):
        raise ValueError(f"weight_bits must be 8 or 4, got {weight_bits}")
    policy_items = tuple(sorted(layer_policy.items())) if layer_policy else None
    qparams, qstate = _bake(
        params, state, act_qparams, per_channel, skip_last_layer,
        skip_first_layer, pre_add_quant, policy_items, last_layer_name,
        weight_bits, weight_group_size,
    )
    _validate_sibling_domains(qparams)
    return qparams, qstate


def _validate_sibling_domains(qparams: dict) -> None:
    """Enforce the invariant the ResNet raw-int8 downsample fast path relies
    on (quantnet/models/resnet.py, `ds_in = x`): whenever a block has both a
    statically-quantized `conv1` and a statically-quantized `downsample`,
    their input ActQuant domains must be identical — both observers saw the
    same tensor during calibration, so this always holds for trees built
    here, but a hand-edited or externally-calibrated tree that violates it
    would silently misinterpret conv1-domain int8 in downsample's domain.

    One host sync per quantize() call (never in the hot loop)."""
    import numpy as np

    def walk(node):
        if not isinstance(node, dict):
            return
        c1, ds = node.get("conv1"), node.get("downsample")
        if (
            isinstance(c1, dict)
            and isinstance(ds, dict)
            and isinstance(c1.get("aq"), ActQuant)
            and isinstance(ds.get("aq"), ActQuant)
        ):
            ok = np.array_equal(
                np.asarray(c1["aq"].scale), np.asarray(ds["aq"].scale)
            ) and np.array_equal(
                np.asarray(c1["aq"].zero_point), np.asarray(ds["aq"].zero_point)
            )
            if not ok:
                raise ValueError(
                    "static PTQ invariant violated: downsample input ActQuant "
                    "differs from conv1's within one block — the raw-int8 "
                    "downsample handoff requires identical domains"
                )
        for v in node.values():
            if isinstance(v, dict) and "w" not in v:
                walk(v)

    walk(qparams)


@partial(
    jax.jit,
    static_argnames=(
        "per_channel", "skip_last_layer", "skip_first_layer", "pre_add_quant",
        "policy_items", "last_layer_name", "weight_bits", "weight_group_size",
    ),
)
def _bake(params, state, act_qparams, per_channel, skip_last_layer,
          skip_first_layer, pre_add_quant, policy_items, last_layer_name,
          weight_bits=8, weight_group_size=None):
    last = last_layer_name or last_layer_path(params)
    first = first_layer_path(params)
    layer_policy = dict(policy_items) if policy_items else None

    def q(path: str, layer: dict) -> dict:
        action = resolve_policy(path, "static", layer_policy)
        # An explicit per-layer policy entry (exact path or leaf name) wins
        # over the skip_first/last flags — a user writing
        # layer_policy={'conv1': 'static'} means it, even with
        # skip_first_layer=True (most-specific-match, like resolve_policy).
        explicit = bool(layer_policy) and (
            path in layer_policy or path.rsplit("/", 1)[-1] in layer_policy
        )
        if action == "fp32" or (
            not explicit
            and (
                (skip_last_layer and path == last)
                or (skip_first_layer and path == first)
            )
        ):
            return dict(layer)
        out = dict(layer)
        # action "int8": per-layer sub-byte guard (policy.int4_guard) — this
        # layer's weights stay 8-bit inside a weight_bits=4 bake; the int8
        # activation path is identical either way.
        lbits = 8 if action == "int8" else weight_bits
        qw = quantize_weight(
            layer["w"], per_channel, bits=lbits,
            group_size=weight_group_size if lbits == weight_bits else None,
        )
        out["w"] = qw
        scale, zp = act_qparams[path]
        out["aq"] = ActQuant(scale=scale, zero_point=zp)
        out["wsum"] = weight_colsum(qw)
        if pre_add_quant and f"{path}:out" in act_qparams:
            oscale, ozp = act_qparams[f"{path}:out"]
            out["oq"] = ActQuant(scale=oscale, zero_point=ozp)
        return out

    return walk_layers(params, q), state
