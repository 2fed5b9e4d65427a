from .dtypes import QuantConfig, PRESETS, NF4_LUT, FP4_LUT, bit_planes
from .qtensor import (
    QTensor,
    quantize,
    dequantize,
    matmul_ref,
    pack_codes,
    unpack_codes,
    pack_plane,
    unpack_plane,
)

__all__ = [
    "QuantConfig", "PRESETS", "NF4_LUT", "FP4_LUT", "bit_planes",
    "QTensor", "quantize", "dequantize", "matmul_ref",
    "pack_codes", "unpack_codes", "pack_plane", "unpack_plane",
]
