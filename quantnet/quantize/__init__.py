"""Quantization schemes as pure transforms over params pytrees."""
from quantnet.quantize import (  # noqa: F401
    adaround, bf16, dynamic, static, weight_only, policy, fold,
)
