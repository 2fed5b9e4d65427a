from .dtypes import QuantConfig, PRESETS, NF4_LUT, FP4_LUT, bit_planes
from .qtensor import (
    QTensor,
    to_native,
    is_native,
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
    "QTensor", "quantize", "dequantize", "matmul_ref", "to_native", "is_native",
    "pack_codes", "unpack_codes", "pack_plane", "unpack_plane",
]
