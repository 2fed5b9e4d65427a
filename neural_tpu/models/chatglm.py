"""ChatGLM2/3 / GLM-4 (reference: neural_speed/models/chatglm/chatglm2.cpp).

RMSNorm, grouped multi-query attention with straight-concat fused QKV
(with bias on QKV only), SwiGLU packed as one [2I, D] dense_h_to_4h
(gate first), interleaved RoPE on HALF the head dim. Checkpoints use
remote code; tensor names below match THUDM's published weights.

ChatGLM v1's distinct graph (prefix-LM bidirectional attention over the
prompt) is not covered by the causal decoder; v2/v3/4 are.
"""
from __future__ import annotations

import numpy as np

from .config import ModelConfig
from ._defuse import split_concat


def config_from_hf(c) -> ModelConfig:
    D = c.hidden_size
    H = c.num_attention_heads
    Dh = D // H
    n_kv = (c.multi_query_group_num
            if getattr(c, "multi_query_attention", False) else H)
    return ModelConfig(
        arch="chatglm", vocab_size=c.padded_vocab_size,
        hidden_size=D, n_layers=c.num_layers, n_heads=H, n_kv_heads=n_kv,
        head_dim=Dh, intermediate_size=c.ffn_hidden_size,
        norm_type="rmsnorm", norm_eps=c.layernorm_epsilon,
        act="silu", mlp_gated=True,
        qkv_bias=bool(getattr(c, "add_qkv_bias", True)),
        rope_style="gptj",           # interleaved pairs
        rope_dim=Dh // 2,            # rotary on half the head dim
        rope_theta=10000.0 * getattr(c, "rope_ratio", 1.0),
        max_seq_len=getattr(c, "seq_length", 8192),
        bos_token_id=1, eos_token_id=2,
    )


def preprocess_state_dict(sd, cfg: ModelConfig):
    for i in range(cfg.n_layers):
        p = f"transformer.encoder.layers.{i}."
        qkv = p + "self_attention.query_key_value."
        if qkv + "weight" in sd:
            q, k, v = split_concat(np.asarray(sd.pop(qkv + "weight")),
                                   cfg.q_dim, cfg.kv_dim)
            sd.update({qkv + "_q": q, qkv + "_k": k, qkv + "_v": v})
            if qkv + "bias" in sd:
                qb, kb, vb = split_concat(np.asarray(sd.pop(qkv + "bias")),
                                          cfg.q_dim, cfg.kv_dim)
                sd.update({qkv + "_qb": qb, qkv + "_kb": kb, qkv + "_vb": vb})
        h4 = p + "mlp.dense_h_to_4h.weight"
        if h4 in sd:
            w = np.asarray(sd.pop(h4))
            sd[p + "mlp._gate"] = w[: cfg.intermediate_size]
            sd[p + "mlp._up"] = w[cfg.intermediate_size:]
    return sd


def hf_layer_map(i: int, cfg: ModelConfig):
    p = f"transformer.encoder.layers.{i}."
    a = p + "self_attention.query_key_value."
    m = {
        "attn_norm_w": (p + "input_layernorm.weight", False),
        "wq": (a + "_q", True),
        "wk": (a + "_k", True),
        "wv": (a + "_v", True),
        "wo": (p + "self_attention.dense.weight", True),
        "ffn_norm_w": (p + "post_attention_layernorm.weight", False),
        "w_gate": (p + "mlp._gate", True),
        "w_up": (p + "mlp._up", True),
        "w_down": (p + "mlp.dense_4h_to_h.weight", True),
    }
    if cfg.qkv_bias:
        m.update({"bq": (a + "_qb", False), "bk": (a + "_kb", False),
                  "bv": (a + "_vb", False)})
    return m


def hf_top_map(cfg: ModelConfig):
    return {
        "embed": ("transformer.embedding.word_embeddings.weight", False),
        "final_norm_w": ("transformer.encoder.final_layernorm.weight", False),
        "lm_head": ("transformer.output_layer.weight", True),
    }


QUANT_TENSORS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
                 "lm_head")
