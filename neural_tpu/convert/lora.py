"""LoRA adapter merge at load time.

Reference: model_apply_lora_from_file_internal (model_utils.cpp:1145-1394)
— read adapter tensors, optionally re-read the base model, merge
W += scale · B@A in place before quantization. Here the merge happens on
the fp state dict prior to build_params/quantize (same ordering: merge
then quantize, like the reference requires an fp base).

Adapter naming follows PEFT: ``...<module>.lora_A.weight`` [r, in] and
``...<module>.lora_B.weight`` [out, r]; scale = alpha / r.
"""
from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np

_LORA_RE = re.compile(r"^(?:base_model\.model\.)?(.*)\.lora_A(?:\.default)?"
                      r"\.weight$")


def merge_lora(sd: Dict[str, np.ndarray], lora_sd: Dict[str, np.ndarray],
               alpha: Optional[float] = None) -> Dict[str, np.ndarray]:
    """Return a copy of ``sd`` with every matching LoRA pair merged."""
    sd = dict(sd)
    merged = 0
    for k in list(lora_sd):
        m = _LORA_RE.match(k)
        if not m:
            continue
        base = m.group(1)
        b_key = k.replace("lora_A", "lora_B")
        A = np.asarray(lora_sd[k], np.float32)         # [r, in]
        B = np.asarray(lora_sd[b_key], np.float32)     # [out, r]
        r = A.shape[0]
        scale = (alpha if alpha is not None else float(r)) / r
        target = base + ".weight"
        if target not in sd:
            raise KeyError(f"LoRA targets missing base tensor {target}")
        sd[target] = (np.asarray(sd[target], np.float32)
                      + scale * (B @ A)).astype(np.float32)
        merged += 1
    if merged == 0:
        raise ValueError("no LoRA tensors matched")
    return sd


def from_hf_model_with_lora(model, lora_sd: Dict[str, np.ndarray],
                            alpha: Optional[float] = None,
                            quant=None, dtype=None):
    """HF model + PEFT adapter state dict → merged (params, cfg)."""
    import jax.numpy as jnp
    from .hf import ARCH_MODULES, build_params
    dtype = dtype or jnp.bfloat16
    hf_cfg = model.config
    mod = ARCH_MODULES[hf_cfg.model_type]
    cfg = mod.config_from_hf(hf_cfg)
    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    sd = merge_lora(sd, lora_sd, alpha)
    return build_params(sd, cfg, mod, quant, dtype), cfg
