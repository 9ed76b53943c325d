"""Quantization schemes as pure transforms over params pytrees."""
from quantnet.quantize import bf16, dynamic, static, weight_only, policy, fold  # noqa: F401
