"""GGUF checkpoint ↔ neural-tpu params (llama-family tensor map).

Reference: the NE/GGUF loader path (model_files.h:246 gguf_loader →
per-arch tensor maps in <arch>_utils.cpp) and the HF→GGUF converter
(convert/convert-hf-to-gguf.py).

Quantized GGUF tensors re-pack LOSSLESSLY into QTensor (identical 32-block
structure; Q*_1 additive offsets become float zero-points), so a Q4_0 file
produces bit-identical dequantized weights here and in llama.cpp.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtypes import QuantConfig
from ..core.qtensor import QTensor, pack_codes
from ..models.config import ModelConfig
from .gguf import (GGUFReader, GGUFWriter, GGML_F16, GGML_F32, GGML_Q4_0,
                   GGML_Q4_1, GGML_Q5_0, GGML_Q5_1, GGML_Q8_0, GGML_Q2_K,
                   GGML_Q3_K, GGML_Q4_K, GGML_Q5_K, GGML_Q6_K, QK)
from .hf import _add_aux

_QUANT_TYPES = {GGML_Q4_0, GGML_Q4_1, GGML_Q5_0, GGML_Q5_1, GGML_Q8_0,
                GGML_Q2_K, GGML_Q3_K, GGML_Q4_K, GGML_Q5_K, GGML_Q6_K}

# our param name → gguf tensor name (llama family)
_LAYER_MAP = {
    "attn_norm_w": "blk.{i}.attn_norm.weight",
    "wq": "blk.{i}.attn_q.weight",
    "wk": "blk.{i}.attn_k.weight",
    "wv": "blk.{i}.attn_v.weight",
    "wo": "blk.{i}.attn_output.weight",
    "ffn_norm_w": "blk.{i}.ffn_norm.weight",
    "w_gate": "blk.{i}.ffn_gate.weight",
    "w_up": "blk.{i}.ffn_up.weight",
    "w_down": "blk.{i}.ffn_down.weight",
}
_TOP_MAP = {
    "embed": "token_embd.weight",
    "final_norm_w": "output_norm.weight",
    "lm_head": "output.weight",
}


def config_from_gguf(r: GGUFReader) -> ModelConfig:
    kv = r.kv
    arch = kv.get("general.architecture", "llama")
    p = arch  # key prefix
    D = int(kv[f"{p}.embedding_length"])
    H = int(kv[f"{p}.attention.head_count"])
    n_kv = int(kv.get(f"{p}.attention.head_count_kv", H))
    n_vocab = r.tensors["token_embd.weight"].shape[0]
    return ModelConfig(
        arch="llama" if arch in ("llama", "mistral") else arch,
        vocab_size=int(n_vocab), hidden_size=D,
        n_layers=int(kv[f"{p}.block_count"]),
        n_heads=H, n_kv_heads=n_kv, head_dim=D // H,
        intermediate_size=int(kv[f"{p}.feed_forward_length"]),
        norm_eps=float(kv.get(
            f"{p}.attention.layer_norm_rms_epsilon", 1e-5)),
        rope_theta=float(kv.get(f"{p}.rope.freq_base", 10000.0)),
        max_seq_len=int(kv.get(f"{p}.context_length", 4096)),
        bos_token_id=int(kv.get("tokenizer.ggml.bos_token_id", 1)),
        eos_token_id=int(kv.get("tokenizer.ggml.eos_token_id", 2)),
    )


def _qtensor_from_gguf(r: GGUFReader, name: str) -> QTensor:
    """Lossless re-pack of a ggml-quantized [out, in] tensor → QTensor
    ([K=in, N=out] layout with 32-groups along K)."""
    t = r.tensors[name]
    out_f, in_f = t.shape
    codes, d, m, g = r.unpack_quantized(name)
    tt = t.ggml_type
    bits = {GGML_Q4_0: 4, GGML_Q4_1: 4, GGML_Q5_0: 5, GGML_Q5_1: 5,
            GGML_Q8_0: 8, GGML_Q2_K: 2, GGML_Q3_K: 3, GGML_Q4_K: 4,
            GGML_Q5_K: 5, GGML_Q6_K: 6}[tt]
    sym = m is None
    half = 1 << (bits - 1)
    # centered codes (sym) or raw codes (asym) → unsigned storage domain
    ucodes = codes.astype(np.int32) + (half if sym else 0)
    ucodes = ucodes.reshape(out_f, in_f).T                   # [K, N]
    if sym:
        scales = d
        zeros = None
    else:
        # w = q*d + m  ==  (q - (-m/d)) * d  → float zero-point. Groups
        # with d == 0 but m != 0 (constant groups) get a tiny stand-in
        # scale so (q - z)*eps still reproduces m (error ≤ 3·eps).
        scales = np.where(d == 0, 1e-10, d)
        zeros = (-m / scales).reshape(out_f, in_f // g).T.astype(np.float32)
    scales = scales.reshape(out_f, in_f // g).T.astype(np.float32)  # [G, N]
    cfg = QuantConfig(bits=bits, kind="int", group_size=g, sym=sym)
    planes = pack_codes(jnp.asarray(ucodes), bits, g)
    return QTensor(planes, jnp.asarray(scales),
                   None if zeros is None else jnp.asarray(zeros),
                   None, cfg)


def load_gguf(path: str, dtype=jnp.bfloat16) -> Tuple[Dict[str, Any],
                                                      ModelConfig]:
    """GGUF file → (params, cfg). Quantized tensors stay quantized."""
    r = GGUFReader(path)
    cfg = config_from_gguf(r)

    def get(name, quantizable):
        t = r.tensors[name]
        if quantizable and t.ggml_type in _QUANT_TYPES:
            return _qtensor_from_gguf(r, name)
        w = r.dequantize(name)
        if w.ndim == 2:
            w = w.T  # [out, in] → [K, N]
        return jnp.asarray(w, dtype if w.ndim > 1 else jnp.float32)

    layers: Dict[str, list] = {k: [] for k in _LAYER_MAP}
    for i in range(cfg.n_layers):
        for ours, tmpl in _LAYER_MAP.items():
            layers[ours].append(get(tmpl.format(i=i),
                                    quantizable=ours.startswith("w")))
    stacked = {}
    for name, vals in layers.items():
        if isinstance(vals[0], QTensor):
            stacked[name] = jax.tree.map(lambda *xs: jnp.stack(xs), *vals)
        else:
            stacked[name] = jnp.stack(vals)

    params: Dict[str, Any] = {"layers": stacked}
    params["embed"] = jnp.asarray(r.dequantize("token_embd.weight"), dtype)
    params["final_norm_w"] = jnp.asarray(
        r.dequantize("output_norm.weight"), jnp.float32)
    if "output.weight" in r.tensors:
        params["lm_head"] = get("output.weight", quantizable=True)
    else:
        cfg = ModelConfig(**{**cfg.__dict__, "tie_word_embeddings": True})
    _add_aux(params, cfg)
    r.close()
    return params, cfg


def export_gguf(hf_model, path: str, ggml_type: int = GGML_Q4_0,
                tokenizer=None, extra_kv=None):
    """HF llama-family torch model → GGUF file (reference converter path:
    convert_llama.py). Norms/embeddings write as F32, linears as
    ``ggml_type``. ``tokenizer``: an HF tokenizer whose vocab (+BPE merges
    when present) is embedded as tokenizer.ggml.* kvs, like the reference
    converters do; ``extra_kv``: additional raw kvs."""
    from ..models import llama as llama_mod
    cfg = llama_mod.config_from_hf(hf_model.config)
    sd = {k: v.detach().float().numpy()
          for k, v in hf_model.state_dict().items()}

    w = GGUFWriter(path)
    if tokenizer is not None:
        vocab = tokenizer.get_vocab()
        tokens = [""] * (max(vocab.values()) + 1)
        for t, i in vocab.items():
            tokens[i] = t
        w.add_kv("tokenizer.ggml.tokens", tokens)
        ranks = getattr(tokenizer, "bpe_ranks", None)
        if ranks:   # byte-level BPE (slow GPT2-family tokenizer)
            w.add_kv("tokenizer.ggml.model", "gpt2")
            w.add_kv("tokenizer.ggml.merges",
                     [f"{a} {b}" for (a, b), _ in
                      sorted(ranks.items(), key=lambda kv: kv[1])])
        else:       # SPM-style: per-token scores if available
            w.add_kv("tokenizer.ggml.model", "llama")
            sp = getattr(tokenizer, "sp_model", None)
            if sp is not None:
                w.add_kv("tokenizer.ggml.scores",
                         [float(sp.get_score(i)) for i in range(len(tokens))])
    for k, v in (extra_kv or {}).items():
        w.add_kv(k, v)
    w.add_kv("general.architecture", "llama")
    w.add_kv("general.name", "neural-tpu-export")
    w.add_kv("llama.embedding_length", cfg.hidden_size)
    w.add_kv("llama.block_count", cfg.n_layers)
    w.add_kv("llama.attention.head_count", cfg.n_heads)
    w.add_kv("llama.attention.head_count_kv", cfg.n_kv_heads)
    w.add_kv("llama.feed_forward_length", cfg.intermediate_size)
    w.add_kv("llama.context_length", cfg.max_seq_len)
    w.add_kv("llama.rope.freq_base", float(cfg.rope_theta))
    w.add_kv("llama.attention.layer_norm_rms_epsilon", float(cfg.norm_eps))
    w.add_kv("tokenizer.ggml.bos_token_id", cfg.bos_token_id)
    w.add_kv("tokenizer.ggml.eos_token_id", cfg.eos_token_id)

    hf_layer = llama_mod.hf_layer_map
    inv_top = {"embed": "token_embd.weight",
               "final_norm_w": "output_norm.weight",
               "lm_head": "output.weight"}
    for ours, (hf_name, tr) in llama_mod.hf_top_map(cfg).items():
        arr = sd[hf_name]
        ttype = GGML_F32 if arr.ndim == 1 else (
            ggml_type if ours == "lm_head" else GGML_F32)
        if ours == "lm_head":
            arr = arr  # HF stores [out, in] already; gguf wants [out, in]
        w.add_tensor(inv_top[ours], arr, ttype)
    for i in range(cfg.n_layers):
        for ours, (hf_name, tr) in hf_layer(i, cfg).items():
            arr = sd[hf_name]
            tmpl = _LAYER_MAP[ours]
            ttype = GGML_F32 if arr.ndim == 1 else ggml_type
            w.add_tensor(tmpl.format(i=i), arr, ttype)
    w.write()
    return cfg
