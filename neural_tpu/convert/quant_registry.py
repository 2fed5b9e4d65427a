"""Per-tensor quantization config registry (mixed-bit models).

Reference analog: the per-model ``quant_layer_base`` registry that assigns
different quant configs per layer name
(neural_speed/models/model_utils/quant_config.h:180-239) and the published
"llama int2&int4 mixed" recipe (reference core/README.md:252). Here a
registry is an ordered list of (fnmatch pattern → QuantConfig-or-None)
rules; the first match wins, ``None`` keeps the tensor fp.

Patterns match the tensor's short name ("w_down", "lm_head") and its
layer-qualified form ("layers.3.w_down"), so both name-global rules
("*.w_down" / "w_down") and layer-local exceptions ("layers.0.*") work.
A registry whose rules resolve uniformly across layers keeps the stacked
[L, ...] param layout; layer-heterogeneous rules produce the per-layer
tuple layout (same format params_to_native emits — every runtime path
consumes it).

Use anywhere a quant config is accepted: ``Model.init(weight_dtype=
registry)``, ``build_params``, ``params_from_hf_dir``, ``requantize``.
"""
from __future__ import annotations

import fnmatch
from typing import Optional, Sequence, Tuple, Union

from ..core.dtypes import PRESETS, QuantConfig


def _coerce(c) -> Optional[QuantConfig]:
    if c is None or isinstance(c, QuantConfig):
        return c
    return PRESETS[c]


class QuantRegistry:
    """Ordered first-match-wins rules: [(pattern, QuantConfig|preset|None)].
    ``default`` applies when no rule matches (None = keep fp)."""

    def __init__(self, rules: Sequence[Tuple[str, Union[str, QuantConfig,
                                                        None]]],
                 default: Union[str, QuantConfig, None] = None):
        self.rules = [(p, _coerce(c)) for p, c in rules]
        self.default = _coerce(default)

    def resolve(self, name: str, layer: Optional[int] = None
                ) -> Optional[QuantConfig]:
        keys = (name,) if layer is None else (f"layers.{layer}.{name}", name)
        for pat, qc in self.rules:
            if any(fnmatch.fnmatch(k, pat) for k in keys):
                return qc
        return self.default

    def uniform_for(self, name: str, n_layers: int):
        """(True, cfg) if every layer resolves to the same config."""
        cfgs = [self.resolve(name, i) for i in range(n_layers)]
        return all(c == cfgs[0] for c in cfgs), cfgs

    def __repr__(self):
        return f"QuantRegistry({self.rules!r}, default={self.default!r})"


# The mixed int2+int4 llama recipe (reference core/README.md:252 "llama
# int2&int4 mixed"): attention projections int4/g32 sym, gate/up int2/g16
# asym (the bulk of the FLOP-light FFN bytes), the PPL-sensitive w_down
# int4/g32 asym, lm_head int8 — embeddings stay fp via the family map.
MIX_INT2_INT4 = QuantRegistry(
    rules=[
        ("w_down", QuantConfig(bits=4, group_size=32, sym=False)),
        ("w_gate", QuantConfig(bits=2, group_size=16, sym=False)),
        ("w_up", QuantConfig(bits=2, group_size=16, sym=False)),
        ("lm_head", "int8"),
    ],
    default=QuantConfig(bits=4, group_size=32, sym=True),
)

# The DECODE-BYTES recipe (round 5): native-int2 g32 sym on the FFN
# gate/up projections (the bulk of a llama layer's bytes, and the most
# quantization-tolerant — measured gate PPL ratio 1.0871 vs q4_j's
# 1.0455, scripts/exp_sub4_recipes.py), q4_j (int4 g128 sym + a8 prefill)
# everywhere else. ~83 MB/layer streamed on a 7B vs q4_j's ~101 (the
# int2 tensors ride the pltpu.bitcast uint8→int2 hardware-convert kernel
# at 4 codes/byte — unlike int3, whose codes must stream in int4
# containers). The older mix_int2_int4 mirror of the reference recipe
# uses g16 ASYM int2, whose scale+zp metadata cancels the byte win
# (2 + 2·16/16 = 4 b/w); sym g32 keeps 2.5 b/w.
MIX_I2_FFN = QuantRegistry(
    rules=[
        ("w_gate", QuantConfig(bits=2, group_size=32, sym=True)),
        ("w_up", QuantConfig(bits=2, group_size=32, sym=True)),
    ],
    default=QuantConfig(bits=4, group_size=128, sym=True, act_bits=8),
)

MIXED_PRESETS = {"mix_int2_int4": MIX_INT2_INT4,
                 "mix_i2_ffn": MIX_I2_FFN}
