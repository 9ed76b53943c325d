"""Core quantization data types.

TPU-native re-design of the quantized-tensor state the reference keeps implicitly
inside PyTorch's quantized modules (reference: models/dynamic_ptq_model.py:302-306
packs INT8 weights via quantize_dynamic; models/custom_quantization_model.py:34-58
wraps per-layer quant islands). Here the quantized state is an explicit, immutable
pytree leaf (`QTensor`) so that quantization is a pure function over a params pytree
and every jitted forward can dispatch on the leaf type at trace time.
"""
from __future__ import annotations

import enum
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct


class QScheme(str, enum.Enum):
    """Which PTQ scheme produced a quantized model.

    Mirrors the reference's three schemes (SURVEY.md section 2.1):
      - DYNAMIC: per-batch activation scales (reference models/dynamic_ptq_model.py)
      - STATIC: calibrated, frozen per-tensor activation scale+zero-point
        (the *intent* of reference models/static_ptq_model.py:19-34, which
        silently fell back to dynamic quant)
      - WEIGHT_ONLY: per-output-channel INT8 weights, fp32/bf16 activations
        (the intent of reference models/custom_quantization_model.py)
    """

    DYNAMIC = "dynamic"
    STATIC = "static"
    WEIGHT_ONLY = "weight_only"


@struct.dataclass
class QTensor:
    """An INT8-quantized tensor with its dequantization parameters.

    values: int8 payload, same shape as the original tensor. Lives packed in HBM.
            Sub-byte quantization (bits=4) keeps the *runtime* payload int8
            (XLA has no s4 compute type worth dispatching to here) with values
            restricted to the narrow range; artifact serialization
            (quantnet/train/checkpoint.py) packs two nibbles per byte on disk.
    scale:  fp32 scale. Scalar () for per-tensor, or shaped to broadcast against
            ``values`` for per-channel (e.g. (1, N) for a (K, N) weight quantized
            along the output-channel axis). Group-wise quantization
            (group_size=g along the reduction axis 0) stores shape
            (K // g, 1, *values.shape[1:]).
    zero_point: optional int32 zero point, same shape rules as scale. None means
            symmetric quantization (zero_point == 0), the common case for weights.
    axis:   static metadata: channel axis for per-channel quantization, or None
            for per-tensor. Not a pytree leaf.
    bits:   static metadata: quantized bit width (8 or 4). Affects the value
            range, the serialized packing, and size accounting.
    group_size: static metadata: group-wise scale granularity along axis 0
            (reduction dim), or None for per-tensor/per-channel.

    Dequantization contract: ``deq(values) = (values - zero_point) * scale``
    (group-wise: scales broadcast over their group's rows).
    """

    values: jax.Array
    scale: jax.Array
    zero_point: Optional[jax.Array] = None
    axis: Optional[int] = struct.field(pytree_node=False, default=None)
    bits: int = struct.field(pytree_node=False, default=8)
    group_size: Optional[int] = struct.field(pytree_node=False, default=None)

    @property
    def shape(self):
        return self.values.shape

    @property
    def dtype(self):
        return self.values.dtype

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        v = self.values.astype(dtype)
        if self.zero_point is not None:
            v = v - self.zero_point.astype(dtype)
        if self.group_size is not None:
            # (K, ...) -> (K//g, g, ...) so the (K//g, 1, ...) scale broadcasts
            # per group; XLA fuses this reshape+mul into the consuming op.
            shape = v.shape
            v = v.reshape(-1, self.group_size, *shape[1:])
            return (v * self.scale.astype(dtype)).reshape(shape)
        return v * self.scale.astype(dtype)

    @property
    def nbytes(self) -> int:
        """Serialized footprint: packed payload (nibble-packed for bits=4,
        matching the on-disk artifact) + quant params."""
        n = -(-self.values.size * self.bits // 8)
        n += self.scale.size * self.scale.dtype.itemsize
        if self.zero_point is not None:
            n += self.zero_point.size * self.zero_point.dtype.itemsize
        return n


@struct.dataclass
class ActQuant:
    """Frozen (static-PTQ) activation quantization parameters for one layer input.

    Produced by calibration (quantnet/core/observers.py) and attached to a layer's
    param dict under key 'aq'. The presence of this leaf switches the layer op to
    the static INT8 path: quantize input with the frozen scale/zero_point, run
    int8 x int8 -> int32 on the MXU, rescale in the epilogue.

    Reference intent: models/static_ptq_model.py:19 (calibration_data_loader arg
    the reference accepted but ignored — here it is actually used).
    """

    scale: jax.Array  # fp32 scalar ()
    zero_point: jax.Array  # int32 scalar ()


class DynamicActQuant:
    """Marker leaf: quantize this layer's input per batch (dynamic PTQ).

    Registered as a pytree node with no array children so it can live inside
    a params tree and survive jit tracing. The layer op computes
    absmax -> scale -> int8 on the fly, fused by XLA into the surrounding graph
    (reference behavior: FBGEMM dynamic linear, SURVEY.md section 3.3).

    handoff: optional narrow inter-layer dtype name ("bfloat16"). Dynamic
    scales are data-dependent, so the static scheme's int8 tensor handoff
    can't apply — but the producer can still write its output at 2 bytes/elem
    instead of 4 before the consumer's absmax+requantize, halving the
    activation HBM traffic that makes naive dynamic PTQ slower than fp32 on
    TPU (docs/PERF.md round-1 scheme sweep). Static metadata (pytree aux), so
    jit re-traces when it changes.
    """

    def __init__(self, handoff: Optional[str] = None):
        self.handoff = handoff

    def __repr__(self):
        return f"DynamicActQuant(handoff={self.handoff!r})"

    def __eq__(self, other):
        return (
            isinstance(other, DynamicActQuant) and self.handoff == other.handoff
        )

    def __hash__(self):
        return hash((DynamicActQuant, self.handoff))


jax.tree_util.register_pytree_node(
    DynamicActQuant,
    lambda node: ((), node.handoff),
    lambda aux, children: DynamicActQuant(aux),
)


class FakeQuant:
    """Static (non-array) fake-quantization marker for QAT training islands.

    Attached to a layer's param dict under key 'fq' by quantnet/quantize/qat.py.
    The layer op then computes with fake-quantized (quantize->dequantize, STE
    gradients) weights and activations, simulating the deployed static-INT8
    graph while staying differentiable — quantization-aware training, the
    capability the reference's "custom quantization" schemes gesture at but
    never train through (its QuantStub/DeQuantStub islands are identity without
    prepare()/convert(), SURVEY.md behavior note 2).

    scale / zero_point are *host* numbers (frozen calibration ranges), carried
    as pytree aux data: no array leaves, so optimizers never touch them, and
    jit re-traces if they change. per_channel records the weight-quant axis
    choice so bake() matches what training simulated.

    Sub-byte QAT (round 5 — the tiers where PTQ actually loses accuracy):
    weight_bits (8 or 4) and weight_group_size select the weight fake-quant
    grid, mirroring quantize_weight's grouped/per-channel rules so bake()
    reproduces exactly what training simulated. act_quant=False trains a
    weight-only island (activations stay fp32, matching the weight_only tier's
    deployed graph); scale/zero_point are then unused.
    """

    def __init__(
        self,
        scale: float,
        zero_point: int,
        per_channel: bool = True,
        weight_bits: int = 8,
        weight_group_size: Optional[int] = None,
        act_quant: bool = True,
    ):
        self.scale = float(scale)
        self.zero_point = int(zero_point)
        self.per_channel = bool(per_channel)
        self.weight_bits = int(weight_bits)
        self.weight_group_size = (
            None if weight_group_size is None else int(weight_group_size)
        )
        self.act_quant = bool(act_quant)

    def _aux(self):
        return (
            self.scale, self.zero_point, self.per_channel,
            self.weight_bits, self.weight_group_size, self.act_quant,
        )

    def __repr__(self):
        return (
            f"FakeQuant(scale={self.scale!r}, zero_point={self.zero_point!r}, "
            f"per_channel={self.per_channel!r}, "
            f"weight_bits={self.weight_bits!r}, "
            f"weight_group_size={self.weight_group_size!r}, "
            f"act_quant={self.act_quant!r})"
        )

    def __eq__(self, other):
        return isinstance(other, FakeQuant) and self._aux() == other._aux()

    def __hash__(self):
        return hash((FakeQuant,) + self._aux())


jax.tree_util.register_pytree_node(
    FakeQuant,
    lambda node: ((), node._aux()),
    lambda aux, children: FakeQuant(*aux),
)


@struct.dataclass
class ProbeGate:
    """Traced selector for the one-program sensitivity sweep.

    Attached to a layer's param dict under key 'probe' by
    quantnet/quantize/policy.py::measure_sensitivity. The layer op computes
    BOTH its plain output and its dynamically-quantized output (via the same
    dispatch the real dynamic scheme takes) and selects by `gate` — a traced
    {0., 1.} scalar — so "which layer is quantized" is runtime data, not
    trace structure. The whole per-layer damage sweep then compiles ONCE
    instead of once per layer (VERDICT round-3 weak #3: ~54 tunnel compiles
    at 30-350 s each for ResNet-50).

    gate:        f32 scalar; 1. = this layer runs quantized this lane.
    per_channel: static — weight-quant axis choice for the quantized lane.
    bits:        static — weight bit width for the quantized lane (8 or 4).
    group_size:  static — group-wise scale granularity (linear layers).
    act_quant:   static — True probes the dynamic-int8 path (weights AND
                 activations, the `optimized` scheme's damage model); False
                 probes weight-only (fp32 activations — the damage model for
                 the sub-byte weight tiers' int4 guard).
    """

    gate: jax.Array
    per_channel: bool = struct.field(pytree_node=False, default=True)
    bits: int = struct.field(pytree_node=False, default=8)
    group_size: Optional[int] = struct.field(pytree_node=False, default=None)
    act_quant: bool = struct.field(pytree_node=False, default=True)


def is_quantized(leaf: Any) -> bool:
    return isinstance(leaf, QTensor)


def tree_nbytes(tree: Any) -> int:
    """Model-size accounting: bytes of all array leaves (QTensor counts packed).

    Equivalent of the reference's get_model_size (models/dynamic_ptq_model.py:310-317,
    which serialized the model to disk and stat'ed it) — here computed directly
    from array payloads, no filesystem round-trip.
    """
    total = 0
    for leaf in jax.tree_util.tree_leaves(
        tree, is_leaf=lambda x: isinstance(x, QTensor)
    ):
        if isinstance(leaf, QTensor):
            total += leaf.nbytes
        elif hasattr(leaf, "nbytes"):
            total += leaf.nbytes
    return total
