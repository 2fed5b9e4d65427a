"""Baichuan 7B/13B (reference: neural_speed/models/baichuan/). Llama-like
with fused W_pack QKV; 13B drops RoPE for ALiBi (no HF-native class — the
checkpoints use remote code, but the tensor names below match them)."""
from __future__ import annotations

import numpy as np

from .config import ModelConfig
from ._defuse import asw, split_concat


def config_from_hf(c) -> ModelConfig:
    D = c.hidden_size
    # Baichuan-13B: no rope, alibi; detected by max length / position type
    use_alibi = getattr(c, "position_embedding", "rope") == "alibi" or \
        getattr(c, "model_max_length", 4096) >= 8192 and D == 5120
    return ModelConfig(
        arch="baichuan", vocab_size=c.vocab_size, hidden_size=D,
        n_layers=c.num_hidden_layers, n_heads=c.num_attention_heads,
        n_kv_heads=c.num_attention_heads,
        head_dim=D // c.num_attention_heads,
        intermediate_size=c.intermediate_size,
        norm_type="rmsnorm", norm_eps=c.rms_norm_eps,
        act="silu", mlp_gated=True,
        rope_style="none" if use_alibi else "neox",
        use_alibi=use_alibi,
        max_seq_len=getattr(c, "model_max_length", 4096),
        bos_token_id=getattr(c, "bos_token_id", 1) or 1,
        eos_token_id=getattr(c, "eos_token_id", 2) or 2,
    )


def preprocess_state_dict(sd, cfg: ModelConfig):
    for i in range(cfg.n_layers):
        base = f"model.layers.{i}.self_attn.W_pack."
        if base + "weight" not in sd:
            continue
        q, k, v = split_concat(asw(sd.pop(base + "weight")),
                               cfg.q_dim, cfg.kv_dim)
        sd.update({base + "_q": q, base + "_k": k, base + "_v": v})
    return sd


def hf_layer_map(i: int, cfg: ModelConfig):
    p = f"model.layers.{i}."
    a = p + "self_attn.W_pack."
    return {
        "attn_norm_w": (p + "input_layernorm.weight", False),
        "wq": (a + "_q", True),
        "wk": (a + "_k", True),
        "wv": (a + "_v", True),
        "wo": (p + "self_attn.o_proj.weight", True),
        "ffn_norm_w": (p + "post_attention_layernorm.weight", False),
        "w_gate": (p + "mlp.gate_proj.weight", True),
        "w_up": (p + "mlp.up_proj.weight", True),
        "w_down": (p + "mlp.down_proj.weight", True),
    }


def hf_top_map(cfg: ModelConfig):
    return {
        "embed": ("model.embed_tokens.weight", False),
        "final_norm_w": ("model.norm.weight", False),
        "lm_head": ("lm_head.weight", True),
    }


QUANT_TENSORS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
                 "lm_head")
