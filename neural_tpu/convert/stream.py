"""Streamed HF-checkpoint conversion: safetensors shards → params, one
layer at a time, without ever instantiating the torch model.

Reference analog: the converter's LazyTensor machinery
(neural_speed/convert/convert_llama.py:146-520 ``lazy_load`` /
``LazyUnpickler``) and the mmap'd multi-shard loader
(models/model_utils/model_files.h:1432-1620) — the reference never holds
the whole fp model in RAM either. Here each layer's tensors are read from
their shard (safetensors ``safe_open``: a per-tensor read, the file stays
mmap-backed), mapped through the SAME family tensor maps + preprocess
hooks as the in-memory path (convert.hf.build_params), quantized
tensor-by-tensor (multithreaded native codec when available), and the
resulting QTensors live on the accelerator — host peak RSS stays
≈ one layer of fp weights + one shard's touched pages, so a 70B fp16
checkpoint converts on a ~2 GB-per-layer budget instead of ~140 GB.

Output is bit-exact with :func:`convert.hf.from_hf_model` on the same
checkpoint: the per-tensor value path (np.float32 cast → transpose → FFN
pad → RTN quantize) is shared code.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtypes import QuantConfig
from ..models.config import ModelConfig


class ShardedCheckpoint:
    """Per-tensor reader over a safetensors checkpoint directory (single
    ``model.safetensors`` or sharded via ``model.safetensors.index.json``).
    Handles stay open per shard; reads copy only the requested tensor."""

    def __init__(self, path: str):
        from safetensors import safe_open
        self._safe_open = safe_open
        self.dir = path
        self.weight_map: Dict[str, str] = {}
        idx = os.path.join(path, "model.safetensors.index.json")
        if os.path.exists(idx):
            with open(idx) as f:
                self.weight_map = dict(json.load(f)["weight_map"])
        else:
            singles = [f for f in sorted(os.listdir(path))
                       if f.endswith(".safetensors")]
            if not singles:
                raise FileNotFoundError(
                    f"no .safetensors files under {path}")
            for fn in singles:
                with safe_open(os.path.join(path, fn), framework="numpy") \
                        as fh:
                    for k in fh.keys():
                        self.weight_map[k] = fn
        self._handles: Dict[str, Any] = {}

    def names(self) -> List[str]:
        return list(self.weight_map)

    def _handle(self, fn: str):
        h = self._handles.get(fn)
        if h is None:
            h = self._safe_open(os.path.join(self.dir, fn),
                                framework="numpy")
            self._handles[fn] = h
        return h

    def tensor(self, name: str) -> np.ndarray:
        # fp16/bf16 shards come back as numpy/ml_dtypes arrays; the value
        # path casts to float32 in _get, same as the torch state_dict path
        return self._handle(self.weight_map[name]).get_tensor(name)

    def release(self):
        """Drop open shard handles (unmaps their pages — called between
        layers so resident mapped pages stay ≈ one shard, not the whole
        checkpoint)."""
        self._handles.clear()

    close = release


def _layer_prefix(m: Dict[str, Any]) -> str:
    """Longest common prefix of a layer map's HF names — ends with the
    layer index + '.', so startswith() can't cross-match layer 1 vs 11."""
    names = [v[0] for v in m.values()]
    pre = os.path.commonprefix(names)
    # trim to the last '.' so partial component matches can't happen
    return pre[: pre.rfind(".") + 1]


def params_from_hf_dir(path: str,
                       quant: Union[None, str, QuantConfig] = None,
                       dtype=jnp.bfloat16, cfg: Optional[ModelConfig] = None,
                       arch_mod=None):
    """Streamed directory → (params, cfg). Bit-exact with
    ``from_hf_model(AutoModelForCausalLM.from_pretrained(path), quant)``
    but with host RSS bounded by one layer + one shard's pages.

    ``quant`` may be a QuantRegistry (per-tensor mixed-bit configs);
    layer-heterogeneous rules emit the per-layer tuple layout.
    """
    from .hf import (ARCH_MODULES, _add_aux, _get, _pad_nk, _quantize_one,
                     ffn_padded_size, resolve_quant)
    from .quant_registry import QuantRegistry

    if cfg is None or arch_mod is None:
        import transformers
        hf_cfg = transformers.AutoConfig.from_pretrained(path)
        arch_mod = arch_mod or ARCH_MODULES[hf_cfg.model_type]
        cfg = cfg or arch_mod.config_from_hf(hf_cfg)
    mod = arch_mod
    qcfg = resolve_quant(quant)
    reg = qcfg if isinstance(qcfg, QuantRegistry) else None
    quant_names = set(getattr(mod, "QUANT_TENSORS", ()))
    reader = ShardedCheckpoint(path)

    layer_maps = [mod.hf_layer_map(i, cfg) for i in range(cfg.n_layers)]
    names = layer_maps[0].keys()
    plain = [n for n in names if not n.startswith("experts.")]
    expert_subs = sorted({n.split(".", 2)[2] for n in names
                          if n.startswith("experts.")})
    ffn_quant = qcfg is not None and \
        {"w_up", "w_down"} <= (set(plain) & quant_names)
    Ip = ffn_padded_size(cfg.intermediate_size) if ffn_quant else None

    def qc_for(our_name: str, layer: Optional[int]):
        return reg.resolve(our_name, layer) if reg is not None else qcfg

    def one(w: np.ndarray, n: str, layer: Optional[int]):
        """SAME per-tensor pipeline as build_params: pad → quantize/cast."""
        base = n.split(".")[-1]
        if Ip is not None and Ip != cfg.intermediate_size:
            if base in ("w_gate", "w_up") and w.shape[-1] == \
                    cfg.intermediate_size:
                w = _pad_nk(w, n_to=Ip)
            elif base == "w_down" and w.shape[-2] == cfg.intermediate_size:
                w = _pad_nk(w, k_to=Ip)
            elif base in ("b_gate", "b_up") and w.shape[-1] == \
                    cfg.intermediate_size:
                w = np.pad(w, (0, Ip - w.shape[-1]))
        qc = qc_for(base, layer)
        if base in quant_names and qc is not None and w.ndim == 2:
            return _quantize_one(w, qc)
        # non-quantized leaves (norms, biases, fp weights) are stored in
        # ``dtype`` — EXACTLY like build_params' np.stack(ws) → dtype, so
        # the streamed and in-memory paths stay bit-identical
        return jnp.asarray(w, dtype)

    # ---- per-layer streaming
    stacks: Dict[str, list] = {n: [] for n in plain}
    estacks: Dict[str, list] = {s: [] for s in expert_subs}
    all_names = reader.names()
    claimed = set()
    for i in range(cfg.n_layers):
        pre = _layer_prefix(layer_maps[i])
        lnames = [n for n in all_names if n.startswith(pre)]
        claimed.update(lnames)
        lsd = {n: reader.tensor(n) for n in lnames}
        if hasattr(mod, "preprocess_state_dict"):
            lsd = mod.preprocess_state_dict(lsd, cfg)
        m = layer_maps[i]
        for n in plain:
            stacks[n].append(one(_get(lsd, *m[n]), n, i))
        for sub in expert_subs:
            # experts resolve layer-UNqualified (reg.resolve(sub)), same
            # as build_params — layer-scoped registry rules do not apply
            # to experts, keeping the stacked [L, E, ...] layout uniform
            row = [one(_get(lsd, *m[f"experts.{e}.{sub}"]),
                       f"experts.{e}.{sub}", None)
                   for e in range(cfg.n_experts)]
            estacks[sub].append(jax.tree.map(
                lambda *xs: jnp.stack(xs), *row)
                if hasattr(row[0], "planes") else jnp.stack(row))
        del lsd   # free this layer's host copies before the next layer
        reader.release()   # and unmap its shards' touched pages

    hetero = reg is not None and not all(
        reg.uniform_for(n, cfg.n_layers)[0]
        for n in plain if n in quant_names)
    if hetero:
        if expert_subs:
            raise NotImplementedError(
                "layer-heterogeneous quant registries are not supported "
                "for MoE experts; use layer-uniform rules")
        flags = mod.layer_flags(cfg) if hasattr(mod, "layer_flags") else {}
        layers: Any = tuple(
            {**{n: stacks[n][i] for n in plain},
             **{n: jnp.asarray(arr)[i] for n, arr in flags.items()}}
            for i in range(cfg.n_layers))
    else:
        # tree.map-stack covers QTensor pytrees and plain arrays alike
        layers = {n: jax.tree.map(lambda *xs: jnp.stack(xs), *v)
                  for n, v in stacks.items()}
        if expert_subs:
            layers["experts"] = {
                s: jax.tree.map(lambda *xs: jnp.stack(xs), *v)
                for s, v in estacks.items()}
        if hasattr(mod, "layer_flags"):
            for n, arr in mod.layer_flags(cfg).items():
                layers[n] = jnp.asarray(arr)
    params: Dict[str, Any] = {"layers": layers}

    # ---- top-level tensors (tiny; read directly)
    top_sd = {n: reader.tensor(n) for n in all_names if n not in claimed}
    if hasattr(mod, "preprocess_state_dict"):
        top_sd = mod.preprocess_state_dict(top_sd, cfg)
    for n, (hf_name, tr) in mod.hf_top_map(cfg).items():
        w = _get(top_sd, hf_name, tr)
        qc = qc_for(n, None)
        if n == "lm_head" and qc is not None and "lm_head" in quant_names:
            params[n] = _quantize_one(w, qc)
        elif n in ("embed", "pos_embed"):
            params[n] = jnp.asarray(w, dtype)
        else:
            params[n] = jnp.asarray(w, dtype if w.ndim > 1 else jnp.float32)
    _add_aux(params, cfg)
    reader.close()
    return params, cfg
