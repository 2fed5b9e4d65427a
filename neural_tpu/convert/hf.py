"""HuggingFace checkpoint → neural-tpu params.

Analog of the reference converter layer (neural_speed/convert/convert_llama.py
and friends: HF safetensors → NE/GGUF tensor map) — but in-process: a torch
``*ForCausalLM`` (CPU) or a raw state-dict is mapped straight onto the unified
decoder's param pytree, optionally quantizing linear weights on the fly
(reference one-shot path: Model.init → convert + quant, __init__.py:142-214).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtypes import QuantConfig, PRESETS
from ..core.qtensor import quantize
from ..models import llama as llama_mod
from ..models.config import ModelConfig
from ..ops.rope import rope_freqs, alibi_slopes

# arch (HF model_type) → family module providing config_from_hf / maps
ARCH_MODULES: Dict[str, Any] = {}


def register_arch(names, module):
    for n in names:
        ARCH_MODULES[n] = module


from ..models import (gptj, gptneox, opt, bloom, mpt, falcon, starcoder,
                      qwen, phi, gemma, stablelm, baichuan, chatglm, grok)

register_arch(["llama", "mistral", "mixtral", "solar"], llama_mod)
register_arch(["gptj"], gptj)
register_arch(["gpt_neox"], gptneox)
register_arch(["opt"], opt)
register_arch(["bloom"], bloom)
register_arch(["mpt"], mpt)
register_arch(["falcon"], falcon)
register_arch(["gpt_bigcode"], starcoder)
register_arch(["qwen", "qwen2", "qwen3"], qwen)
register_arch(["phi", "phi3"], phi)
register_arch(["gemma", "gemma2"], gemma)
register_arch(["stablelm"], stablelm)
register_arch(["baichuan"], baichuan)
register_arch(["chatglm", "chatglm1"], chatglm)
register_arch(["grok", "grok-1"], grok)


def resolve_quant(quant: Union[None, str, QuantConfig]):
    """Preset name / QuantConfig / QuantRegistry / mixed-preset name →
    QuantConfig or QuantRegistry (or None)."""
    from .quant_registry import MIXED_PRESETS, QuantRegistry
    if quant is None or isinstance(quant, (QuantConfig, QuantRegistry)):
        return quant
    if quant in MIXED_PRESETS:
        return MIXED_PRESETS[quant]
    return PRESETS[quant]


def _get(sd, name, transpose):
    w = sd[name]
    if hasattr(w, "planes"):
        # already-imported QTensor (GPTQ/AWQ path): GPTQ packs along
        # in-features, so the tensor is in our [K, N] orientation
        # regardless of the fp map's transpose flag
        return w
    w = np.asarray(w, np.float32)
    return w.T if transpose else w


def _stack_any(ws, dtype):
    """Stack a list of per-layer tensors (QTensors or numpy) along L."""
    if hasattr(ws[0], "planes"):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *ws)
    return jnp.asarray(np.stack(ws), dtype)


def _quantize_one(w, qcfg: QuantConfig):
    """One [K, N] weight → QTensor; multithreaded C++ codec when available
    (reference analog: BTLAGemmQuantPackB, core/layers/bestla_gemm.cpp)."""
    if qcfg.kind == "int":
        from .. import native
        if native.available():
            return native.quantize_qtensor(np.asarray(w, np.float32), qcfg)
    return quantize(jnp.asarray(w), qcfg)


def requantize(params, qcfg):
    """Re-quantize every QTensor leaf of a params pytree to ``qcfg``
    (dequantize → RTN quantize; the reference quant_model file→file path,
    quant_utils.cpp:269). Stacked [L, ...] QTensors are handled per layer.
    ``qcfg`` may be a QuantRegistry (per-tensor mixed-bit requantization).
    Raises for fp params — quantize those at conversion (Model.init)."""
    from ..core.qtensor import QTensor, dequantize
    from .quant_registry import QuantRegistry

    qcfg = resolve_quant(qcfg)
    if isinstance(qcfg, QuantRegistry):
        return _requantize_registry(params, qcfg)

    found = [False]

    def one(leaf):
        if not isinstance(leaf, QTensor):
            return leaf
        found[0] = True
        if leaf.planes[0].ndim == 2:
            return _quantize_one(np.asarray(dequantize(leaf)), qcfg)
        L = leaf.planes[0].shape[0]
        per = [_quantize_one(
            np.asarray(dequantize(jax.tree.map(lambda a: a[i], leaf))), qcfg)
            for i in range(L)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *per)

    out = jax.tree.map(one, params,
                       is_leaf=lambda l: isinstance(l, QTensor))
    if not found[0]:
        raise ValueError("params hold no quantized tensors; quantize at "
                         "conversion time via Model.init(weight_dtype=...)")
    return out


def _requantize_registry(params, reg):
    """Registry-driven requantization: per-name (and per-layer) configs.
    A rule of None dequantizes the tensor to bf16. Non-MoE layers only;
    stacked inputs restack when the registry is layer-uniform, otherwise
    the result uses the per-layer tuple layout."""
    from ..core.qtensor import QTensor, dequantize

    layers = params["layers"]
    is_tuple = isinstance(layers, (list, tuple))
    if (not is_tuple and "experts" in layers) or \
            (is_tuple and "experts" in layers[0]):
        raise NotImplementedError(
            "registry requantization of MoE experts is unsupported")
    found = [False]

    def req(leaf, name, i):
        if not isinstance(leaf, QTensor):
            return leaf
        found[0] = True
        qc = reg.resolve(name, i)
        w = np.asarray(dequantize(leaf))
        return _quantize_one(w, qc) if qc is not None \
            else jnp.asarray(w, jnp.bfloat16)

    out = dict(params)
    if is_tuple:
        out["layers"] = tuple(
            {k: req(v, k, i) for k, v in lp.items()}
            for i, lp in enumerate(layers))
    else:
        L = jax.tree.leaves(layers)[0].shape[0]
        qnames = [k for k, v in layers.items() if isinstance(v, QTensor)]
        per = [{k: req(jax.tree.map(lambda a: a[i], v), k, i)
                for k, v in layers.items()} for i in range(L)]
        if all(reg.uniform_for(k, L)[0] for k in qnames):
            out["layers"] = {
                k: jax.tree.map(lambda *xs: jnp.stack(xs),
                                *[p[k] for p in per])
                for k in layers}
        else:
            out["layers"] = tuple(per)
    for k, v in params.items():
        if k != "layers" and isinstance(v, QTensor):
            out[k] = req(v, k, None)
    if not found[0]:
        raise ValueError("params hold no quantized tensors; quantize at "
                         "conversion time via Model.init(weight_dtype=...)")
    return out


def _stack_quantize(ws, qcfg: Optional[QuantConfig], dtype):
    """[L(,E),K,N] numpy → stacked QTensor pytree or plain jnp array."""
    if qcfg is None:
        return jnp.asarray(np.stack(ws), dtype)
    qts = [_quantize_one(w, qcfg) for w in ws]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *qts)


def ffn_padded_size(I: int, tile: int = 1024, max_overhead: float = 0.05):
    """Pad the FFN width to a ``tile`` multiple when cheap (≤5% extra):
    the Pallas kernel's lane tile must divide N, and odd widths like
    llama's 11008 (max 128-multiple divisor: 256) cap the matmul at
    ~142 TF/s vs ~176 with tn=1024 (v5e sweep). Zero columns/rows are
    exact: padded gate/up outputs are 0 and the padded w_down K-rows are
    0, so no slicing is needed anywhere."""
    t = -(-I // tile) * tile
    return t if t <= I * (1 + max_overhead) else I


def _pad_nk(w: np.ndarray, n_to: Optional[int] = None,
            k_to: Optional[int] = None) -> np.ndarray:
    pads = [(0, 0)] * w.ndim
    if n_to is not None:
        pads[-1] = (0, n_to - w.shape[-1])
    if k_to is not None:
        pads[-2] = (0, k_to - w.shape[-2])
    return np.pad(w, pads) if any(p != (0, 0) for p in pads) else w


def build_params(sd: Dict[str, np.ndarray], cfg: ModelConfig, mod,
                 quant: Union[None, str, QuantConfig] = None,
                 dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Assemble the param pytree: stacked layers + top-level tensors + rope
    tables. ``quant`` applies to the tensors the family lists in
    QUANT_TENSORS; it may be a :class:`~neural_tpu.convert.quant_registry.
    QuantRegistry` for per-tensor mixed-bit configs (reference
    quant_config.h:180-239) — layer-heterogeneous rules emit the per-layer
    tuple layout instead of stacked [L, ...] arrays."""
    from .quant_registry import QuantRegistry
    qcfg = resolve_quant(quant)
    reg = qcfg if isinstance(qcfg, QuantRegistry) else None
    quant_names = set(getattr(mod, "QUANT_TENSORS", ()))
    if hasattr(mod, "preprocess_state_dict"):
        sd = mod.preprocess_state_dict(dict(sd), cfg)

    # ---- per-layer stacked params
    layer_maps = [mod.hf_layer_map(i, cfg) for i in range(cfg.n_layers)]
    layers: Dict[str, Any] = {}
    names = layer_maps[0].keys()
    # split plain names from expert names ("experts.{e}.{sub}")
    plain = [n for n in names if not n.startswith("experts.")]
    expert_subs = sorted({n.split(".", 2)[2] for n in names
                          if n.startswith("experts.")})
    ffn_quant = qcfg is not None and \
        {"w_up", "w_down"} <= (set(plain) & quant_names)
    Ip = ffn_padded_size(cfg.intermediate_size) if ffn_quant else None
    for n in plain:
        ws = [_get(sd, *layer_maps[i][n]) for i in range(cfg.n_layers)]
        if hasattr(ws[0], "planes"):      # pre-quantized (GPTQ/AWQ) import
            layers[n] = _stack_any(ws, dtype)
            continue
        if Ip is not None and Ip != cfg.intermediate_size:
            if n in ("w_gate", "w_up") and ws[0].shape[-1] == \
                    cfg.intermediate_size:
                ws = [_pad_nk(w, n_to=Ip) for w in ws]
            elif n == "w_down" and ws[0].shape[-2] == \
                    cfg.intermediate_size:
                ws = [_pad_nk(w, k_to=Ip) for w in ws]
            elif n in ("b_gate", "b_up") and ws[0].shape[-1] == \
                    cfg.intermediate_size:
                ws = [np.pad(w, (0, Ip - w.shape[-1])) for w in ws]
        if n in quant_names and qcfg is not None and ws[0].ndim == 2:
            if reg is None:
                layers[n] = _stack_quantize(ws, qcfg, dtype)
            else:
                uni, cfgs = reg.uniform_for(n, cfg.n_layers)
                if uni:
                    layers[n] = _stack_quantize(ws, cfgs[0], dtype)
                else:
                    # mixed bits across layers: per-layer leaves (tuple
                    # layout assembled below)
                    layers[n] = [_quantize_one(w, c) if c is not None
                                 else jnp.asarray(w, dtype)
                                 for w, c in zip(ws, cfgs)]
        else:
            layers[n] = jnp.asarray(np.stack(ws), dtype)
    if expert_subs:
        experts: Dict[str, Any] = {}
        for sub in expert_subs:
            ws = [[_get(sd, *layer_maps[i][f"experts.{e}.{sub}"])
                   for e in range(cfg.n_experts)] for i in range(cfg.n_layers)]
            if hasattr(ws[0][0], "planes"):    # pre-quantized experts
                per_layer = [_stack_any(row, dtype) for row in ws]
                experts[sub] = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *per_layer)
            elif sub in quant_names and qcfg is not None:
                ecfg = reg.resolve(sub) if reg is not None else qcfg
                per_layer = [_stack_quantize(row, ecfg, dtype) for row in ws]
                experts[sub] = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *per_layer)
            else:
                experts[sub] = jnp.asarray(np.stack(ws), dtype)
        layers["experts"] = experts
    if hasattr(mod, "layer_flags"):
        for n, arr in mod.layer_flags(cfg).items():
            layers[n] = jnp.asarray(arr)

    hetero = [n for n, v in layers.items() if isinstance(v, list)]
    if hetero:
        # layer-heterogeneous registry: emit the per-layer tuple layout
        # (the same at-rest format params_to_native produces)
        if expert_subs:
            raise NotImplementedError(
                "layer-heterogeneous quant registries are not supported "
                "for MoE experts; use layer-uniform rules")

        def at(v, i):
            return v[i] if isinstance(v, list) else \
                jax.tree.map(lambda a: a[i], v)
        layers = tuple({k: at(v, i) for k, v in layers.items()}
                       for i in range(cfg.n_layers))

    params: Dict[str, Any] = {"layers": layers}

    # ---- top-level params
    head_cfg = reg.resolve("lm_head") if reg is not None else qcfg
    for n, (hf_name, tr) in mod.hf_top_map(cfg).items():
        w = _get(sd, hf_name, tr)
        if hasattr(w, "planes"):            # pre-quantized (GPTQ) tensor
            params[n] = w
        elif n == "lm_head" and head_cfg is not None \
                and "lm_head" in quant_names:
            params[n] = _quantize_one(w, head_cfg)
        elif n in ("embed", "pos_embed"):
            params[n] = jnp.asarray(w, dtype)
        else:
            params[n] = jnp.asarray(w, dtype if w.ndim > 1 else jnp.float32)

    _add_aux(params, cfg)
    return params


def _add_aux(params: Dict[str, Any], cfg: ModelConfig):
    if cfg.rope_style != "none":
        params["rope_inv_freqs"] = jnp.asarray(
            rope_freqs(cfg.head_dim, cfg.rope_dim, cfg.rope_theta,
                       cfg.rope_scaling_dict, max_seq_len=cfg.max_seq_len))
    if cfg.use_alibi:
        params["alibi_slopes"] = jnp.asarray(alibi_slopes(cfg.n_heads))


def from_hf_model(model, quant: Union[None, str, QuantConfig] = None,
                  dtype=jnp.bfloat16):
    """torch *ForCausalLM (CPU) → (params, cfg)."""
    hf_cfg = model.config
    mod = ARCH_MODULES[hf_cfg.model_type]
    cfg = mod.config_from_hf(hf_cfg)
    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    return build_params(sd, cfg, mod, quant, dtype), cfg


def init_random(cfg: ModelConfig, seed: int = 0,
                quant: Union[None, str, QuantConfig] = None,
                dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Random params for tests/benchmarks without a checkpoint."""
    mod = ARCH_MODULES.get(cfg.arch, llama_mod)
    rng = np.random.default_rng(seed)
    D, I_, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size

    def r(*shape, s=0.02):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    sd: Dict[str, np.ndarray] = {}
    for i in range(cfg.n_layers):
        for ours, (hf, tr) in mod.hf_layer_map(i, cfg).items():
            shape = _shape_for(ours.split(".")[-1], cfg)
            w = r(*shape) if len(shape) > 1 else np.ones(shape, np.float32)
            sd[hf] = w.T if tr else w
    for ours, (hf, tr) in mod.hf_top_map(cfg).items():
        if ours == "embed":
            sd[hf] = r(V, D)
        elif ours == "lm_head":
            sd[hf] = r(D, V).T if tr else r(D, V)
        elif ours == "pos_embed":
            sd[hf] = r(cfg.max_seq_len + cfg.pos_offset, D)
        elif ours == "lm_head_b":
            sd[hf] = np.zeros(V, np.float32)
        else:
            sd[hf] = np.ones(D, np.float32)
    return build_params(sd, cfg, mod, quant, dtype)


def _shape_for(name: str, cfg: ModelConfig):
    D, I_ = cfg.hidden_size, cfg.intermediate_size
    table = {
        "wq": (D, cfg.q_dim), "wk": (D, cfg.kv_dim), "wv": (D, cfg.kv_dim),
        "wo": (cfg.q_dim, D),
        "w_gate": (D, I_), "w_up": (D, I_), "w_down": (I_, D),
        "router": (D, cfg.n_experts),
        "attn_norm_w": (D,), "ffn_norm_w": (D,), "post_attn_norm_w": (D,),
        "attn_norm_b": (D,), "ffn_norm_b": (D,),
        "bq": (cfg.q_dim,), "bk": (cfg.kv_dim,), "bv": (cfg.kv_dim,),
        "bo": (D,), "b_gate": (I_,), "b_up": (I_,), "b_down": (D,),
        "q_norm_w": (cfg.head_dim,), "k_norm_w": (cfg.head_dim,),
        "post_ffn_norm_w": (D,), "post_ffn_norm_b": (D,),
    }
    return table[name]
