"""quantnet: a TPU-native INT8 quantized-inference framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
project his0si/ConvNet-Quantization (see SURVEY.md): FP32 CNN training,
three post-training-quantization schemes (dynamic, static, per-channel
weight-only + mixed-precision policy), evaluation, benchmarking and reporting —
re-designed for TPU (MXU int8 matmuls, fused epilogues, pjit data parallelism)
rather than ported from the reference's PyTorch/FBGEMM structure.
"""

__version__ = "0.1.0"
