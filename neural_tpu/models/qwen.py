"""Qwen family (reference: neural_speed/models/qwen/ — Qwen 1/1.5/2).

qwen2 = llama-style + QKV bias. qwen (v1) = fused c_attn + w1/w2/c_proj
MLP. qwen2_moe adds routed experts + a shared expert.
"""
from __future__ import annotations

import numpy as np

from .config import ModelConfig
from ._defuse import asw, split_concat
from . import llama as llama_mod


def config_from_hf(c) -> ModelConfig:
    mt = getattr(c, "model_type", "qwen2")
    if mt == "qwen":  # v1 (remote-code arch)
        D = c.hidden_size
        return ModelConfig(
            arch="qwen", vocab_size=c.vocab_size, hidden_size=D,
            n_layers=c.num_hidden_layers, n_heads=c.num_attention_heads,
            n_kv_heads=c.num_attention_heads,
            head_dim=D // c.num_attention_heads,
            intermediate_size=c.intermediate_size // 2,
            norm_type="rmsnorm", norm_eps=c.layer_norm_epsilon,
            act="silu", mlp_gated=True, qkv_bias=True,
            rope_style="neox",
            rope_theta=getattr(c, "rotary_emb_base", 10000.0),
            max_seq_len=c.max_position_embeddings,
            eos_token_id=getattr(c, "eos_token_id", 151643) or 151643,
            bos_token_id=getattr(c, "bos_token_id", 151643) or 151643,
        )
    base = llama_mod.config_from_hf(c)
    import dataclasses
    return dataclasses.replace(base, arch=mt, qkv_bias=True)


def preprocess_state_dict(sd, cfg: ModelConfig):
    if cfg.arch != "qwen":
        return sd
    for i in range(cfg.n_layers):
        base = f"transformer.h.{i}.attn.c_attn."
        if base + "weight" not in sd:
            continue
        q, k, v = split_concat(asw(sd.pop(base + "weight")),
                               cfg.q_dim, cfg.kv_dim)
        qb, kb, vb = split_concat(np.asarray(sd.pop(base + "bias")),
                                  cfg.q_dim, cfg.kv_dim)
        sd.update({base + "_q": q, base + "_k": k, base + "_v": v,
                   base + "_qb": qb, base + "_kb": kb, base + "_vb": vb})
    return sd


def hf_layer_map(i: int, cfg: ModelConfig):
    if cfg.arch == "qwen":  # v1
        p = f"transformer.h.{i}."
        a = p + "attn.c_attn."
        return {
            "attn_norm_w": (p + "ln_1.weight", False),
            "wq": (a + "_q", True), "bq": (a + "_qb", False),
            "wk": (a + "_k", True), "bk": (a + "_kb", False),
            "wv": (a + "_v", True), "bv": (a + "_vb", False),
            "wo": (p + "attn.c_proj.weight", True),
            "ffn_norm_w": (p + "ln_2.weight", False),
            "w_gate": (p + "mlp.w2.weight", True),
            "w_up": (p + "mlp.w1.weight", True),
            "w_down": (p + "mlp.c_proj.weight", True),
        }
    m = llama_mod.hf_layer_map(i, cfg)
    p = f"model.layers.{i}.self_attn."
    m.update({"bq": (p + "q_proj.bias", False),
              "bk": (p + "k_proj.bias", False),
              "bv": (p + "v_proj.bias", False)})
    return m


def hf_top_map(cfg: ModelConfig):
    if cfg.arch == "qwen":
        return {
            "embed": ("transformer.wte.weight", False),
            "final_norm_w": ("transformer.ln_f.weight", False),
            "lm_head": ("lm_head.weight", True),
        }
    return llama_mod.hf_top_map(cfg)


QUANT_TENSORS = llama_mod.QUANT_TENSORS
