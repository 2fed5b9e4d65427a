"""neural-tpu: TPU-native weight-only-quantized LLM inference.

A from-scratch JAX/XLA/Pallas framework with the capabilities of Intel
Neural Speed (reference: /root/reference): N-bit weight-only GEMM, fused
attention with quantized KV-cache, GGUF/HF/GPTQ import, StreamingLLM
shift-RoPE, continuous batching, and GSPMD tensor parallelism.
"""

__version__ = "0.1.0"

from .core import QuantConfig, QTensor, quantize, dequantize, PRESETS
