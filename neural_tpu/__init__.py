"""neural-tpu: TPU-native weight-only-quantized LLM inference.

A from-scratch JAX/XLA/Pallas framework with the capabilities of Intel
Neural Speed (reference: /root/reference): N-bit weight-only GEMM, fused
attention with quantized KV-cache, GGUF/HF/GPTQ import, StreamingLLM
shift-RoPE, continuous batching, and GSPMD tensor parallelism.
"""

__version__ = "0.1.0"

from .utils import axon_compat as _axon_compat

_axon_compat.apply()

from .core import QuantConfig, QTensor, quantize, dequantize, PRESETS
from .api import Model
from .models.config import ModelConfig
from .runtime.sampling import SamplingParams


def __getattr__(name):
    # lazy: serving pulls in threading machinery
    if name == "ModelServer":
        from .serving import ModelServer
        return ModelServer
    if name == "Query":
        from .serving import Query
        return Query
    raise AttributeError(name)
