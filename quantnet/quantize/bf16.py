"""BF16 inference variant: fold BN, cast float params to bfloat16.

Not a scheme the reference had (its only sub-FP32 story was INT8 via FBGEMM) —
on TPU, bf16 is the native MXU dtype and the natural middle point of the
accuracy/throughput trade (measured on v5e, SimpleConvNet bs=1024: bf16 2.47ms
vs fp32 2.68ms vs static-INT8 2.36ms — scripts/tpu_backend_sweep.py). Halves
model size with ~FP32 accuracy; the ops' narrow-dtype rule (quantnet/ops/
linear.py, conv.py) pulls activations down to bf16 wherever weights are bf16,
with f32 accumulation via preferred_element_type.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from quantnet.quantize.fold import fold_model


@jax.jit
def _transform(params, state):
    params, state = fold_model(params, state)

    def cast(leaf):
        if hasattr(leaf, "dtype") and leaf.dtype == jnp.float32:
            return leaf.astype(jnp.bfloat16)
        return leaf

    return jax.tree_util.tree_map(cast, params), state


def quantize(params: dict, state: dict) -> Tuple[dict, dict]:
    """FP32 (params, state) -> BN-folded bf16 (params', {})."""
    return _transform(params, state)
