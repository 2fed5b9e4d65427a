"""Quantized dtype definitions for neural-tpu.

TPU-native analog of the reference's packed dtype encoding
(reference: bestla/bestla/bestla.h:23-100 ``BTLA_DTYPE`` — bits/type/subtype
for S1..S8_CLIP, F4_E2M1, NF4, F8_E4M3/E5M2, BF16) and the quantization
parameter plumbing (reference: neural_speed/models/model_utils/quant_config.h:21-143
``quant_bits/alg/sdtype/comp``).

Instead of a packed integer encoding we use a small frozen dataclass; the
weight *storage* layout (bit-plane packing along K) lives in
:mod:`neural_tpu.core.qtensor`.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Value kinds
# ---------------------------------------------------------------------------
# "int"  : signed integers, 1..8 bits, optional asymmetric zero-point
# "nf4"  : NormalFloat4 lookup table (QLoRA)
# "fp4"  : E2M1 4-bit float lookup table
# "fp8_e4m3" / "fp8_e5m2": native 8-bit floats (stored as ml_dtypes arrays)
KINDS = ("int", "nf4", "fp4", "fp8_e4m3", "fp8_e5m2")

# NF4 lookup table (16 entries), the standard QLoRA codebook.
NF4_LUT = np.array(
    [
        -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
        -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
        0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
        0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
        0.7229568362236023, 1.0,
    ],
    dtype=np.float32,
)

# FP4 E2M1 lookup table. Matches the reference's F4_E2M1 codebook
# (bestla/bestla/kernel_ref.h f4 dequant): sign x {0, .5, 1, 1.5, 2, 3, 4, 6}/6.
FP4_LUT = np.array(
    [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
     -0.0, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0],
    dtype=np.float32,
) / 6.0


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """How a weight tensor is quantized.

    Mirrors the knobs of the reference quantizer
    (neural_speed/models/model_utils/quant_config.h:180-239 per-layer config;
    bestla_quantize neural_speed/models/model_utils/quant_utils.cpp:269-355):

    - ``bits``: 1..8 for kind="int"; fixed 4 for nf4/fp4; 8 for fp8.
    - ``group_size``: K-block size for scales (one of 16/32/64/128/...,
      or -1 for per-output-channel, i.e. one group spanning all of K).
    - ``sym``: symmetric (no zero-point) vs asymmetric (uint zero-point per
      group, like GPTQ asym).
    - ``act_bits``: 16 → bf16 activations (comp_bf16); 8 → dynamic per-row
      int8 activation quantization (comp_int8, reference
      bestla_prologue_a.h:105 ActivationKBlockQuantize).
    """

    bits: int = 4
    kind: str = "int"
    group_size: int = 32
    sym: bool = True
    act_bits: int = 16
    scale_dtype: str = "f32"  # "f32" | "bf16"
    # storage marker: uint8 plane [K/2, N] whose nibbles are CENTERED int4
    # codes in hardware-bitcast order (byte row s = codes 2s | 2s+1 << 4) —
    # the at-rest decode format the Pallas kernels consume via an in-kernel
    # uint8→int4 bitcast (no unpack, no conversion copy). Set by
    # qtensor.to_native_packed; never by the quantizer directly.
    native_pack: bool = False

    def __post_init__(self):
        if self.kind not in KINDS:
            raise ValueError(f"unknown kind {self.kind!r}")
        if self.kind == "int" and not (1 <= self.bits <= 8):
            raise ValueError("int bits must be in 1..8")
        if self.native_pack and (self.kind != "int"
                                 or not 2 <= self.bits <= 4):
            raise ValueError("native_pack stores 2-4 bit int codes")
        if self.kind in ("nf4", "fp4") and self.bits != 4:
            object.__setattr__(self, "bits", 4)
        if self.kind.startswith("fp8") and self.bits != 8:
            object.__setattr__(self, "bits", 8)
        if self.kind != "int" and not self.sym:
            raise ValueError(f"{self.kind} supports only symmetric scales")
        if self.act_bits not in (8, 16):
            raise ValueError("act_bits must be 8 (dynamic int8) or 16 (bf16)")

    @property
    def lut(self) -> Optional[np.ndarray]:
        if self.kind == "nf4":
            return NF4_LUT
        if self.kind == "fp4":
            return FP4_LUT
        return None

    @property
    def scale_jnp(self):
        return jnp.float32 if self.scale_dtype == "f32" else jnp.bfloat16

    def short_name(self) -> str:
        """e.g. q4_sym_g32, nf4_g64, q4_asym_g128_a8."""
        if self.kind == "int":
            s = f"q{self.bits}_{'sym' if self.sym else 'asym'}_g{self.group_size}"
        else:
            s = f"{self.kind}_g{self.group_size}"
        if self.act_bits == 8:
            s += "_a8"
        return s


# Named presets roughly matching the reference CLI precisions
# (tests/model-test/cpp_graph_inference.sh:30 q4_j_i8_g128 / q4_j_i8_g32 / q4_0).
PRESETS = {
    "q4_0": QuantConfig(bits=4, group_size=32, sym=True),
    # the reference's headline CI precision (cpp_graph_inference.sh:427
    # "--weight_dtype int4 --group_size 128 --alg sym"): int4 g128 sym —
    # 4x fewer scale bytes than q4_0, the decode roofline config.
    # act_bits=8 is ADVISORY: decode (M=1) keeps the native-int4 bf16
    # kernel untouched; prefill (M>=256) takes the int8-compute path
    # (199 TF/s measured vs 141 bf16 on v5e — the reference's own
    # headline q4_j_i8 pairs int8 activations with int4 g128 weights,
    # bestla_prologue_a.h:105 ActivationKBlockQuantize). PPL cost is
    # gated in scripts/gate.py ("q4_j" entry scores the a8 numerics).
    "q4_j": QuantConfig(bits=4, group_size=128, sym=True, act_bits=8),
    "q4_1": QuantConfig(bits=4, group_size=32, sym=False),
    "q4_j_g32": QuantConfig(bits=4, group_size=32, sym=False),
    "q4_j_g128": QuantConfig(bits=4, group_size=128, sym=False),
    "q4_j_i8_g32": QuantConfig(bits=4, group_size=32, sym=False, act_bits=8),
    "q4_j_i8_g128": QuantConfig(bits=4, group_size=128, sym=False, act_bits=8),
    "q8_0": QuantConfig(bits=8, group_size=32, sym=True),
    "int8": QuantConfig(bits=8, group_size=-1, sym=True),
    "int5": QuantConfig(bits=5, group_size=32, sym=True),
    "int3": QuantConfig(bits=3, group_size=32, sym=True),
    "int2": QuantConfig(bits=2, group_size=32, sym=True),
    "int1": QuantConfig(bits=1, group_size=32, sym=True),
    "nf4": QuantConfig(kind="nf4", group_size=32),
    "fp4": QuantConfig(kind="fp4", group_size=32),
    "fp8": QuantConfig(kind="fp8_e4m3", group_size=128),
    "fp8_e5m2": QuantConfig(kind="fp8_e5m2", group_size=128),
}


def bit_planes(bits: int) -> tuple[int, ...]:
    """Decompose a bit-width into storage planes from {4, 2, 1}.

    The TPU-native replacement for the reference's bit-serial weight layout
    (bestla_wrapper.h:26-258 ``gemv_nbits::S1..S7`` extract 1/2/4-bit planes
    with shifts+masks): every width 1..8 is a sum of at most one 4-plane, one
    2-plane and one 1-plane, except 8 which is stored as a full byte.
    """
    if bits == 8:
        return (8,)
    planes = []
    for p in (4, 2, 1):
        if bits >= p:
            planes.append(p)
            bits -= p
    if bits:
        raise ValueError("unreachable")
    return tuple(planes)
