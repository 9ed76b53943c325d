"""Quantization schemes as pure transforms over params pytrees."""
from quantnet.quantize import dynamic, static, weight_only, policy, fold  # noqa: F401
