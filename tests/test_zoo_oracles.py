"""Goldens for the remote-code archs (no offline HF class): baichuan 7B
(W_pack) & 13B-style (ALiBi), Qwen v1 (c_attn, w1/w2 swap), ChatGLM2/3
(GQA concat QKV, packed SwiGLU, half-dim interleaved RoPE), Grok (MoE +
softcaps + post-norms).

Each test hand-builds a tiny random checkpoint in the arch's NATIVE HF
tensor layout (fused W_pack / c_attn / query_key_value / dense_h_to_4h),
imports it through the family mapping (convert.hf.build_params), and
compares full-sequence logits against an independent numpy oracle that
reads the SAME raw state dict — so both the tensor mapping (splits,
transposes) and the graph configuration (rope style/dims, gating order,
eps, scales) are pinned. Reference graphs: neural_speed/models/
{baichuan,qwen,chatglm,grok}/*.cpp.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from neural_tpu.convert.hf import build_params, ARCH_MODULES
from neural_tpu.runtime import init_cache, model_step

RTOL = ATOL = 2e-2   # forward() runs activations in bf16; oracle is f64


# ---------------------------------------------------------------- numpy core

def rmsnorm(x, w, eps=1e-6):
    return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w


def rope_neox(x, pos, theta=10000.0):
    T, H, Dh = x.shape
    inv = 1.0 / (theta ** (np.arange(0, Dh, 2) / Dh))
    ang = pos[:, None] * inv[None, :]
    c, s = np.cos(ang)[:, None], np.sin(ang)[:, None]
    x1, x2 = x[..., : Dh // 2], x[..., Dh // 2:]
    return np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], -1)


def rope_gptj_half(x, pos, theta=10000.0):
    """Interleaved-pair rotary on the FIRST HALF of the head dim
    (ChatGLM2/3 layout)."""
    T, H, Dh = x.shape
    d = Dh // 2
    inv = 1.0 / (theta ** (np.arange(0, d, 2) / d))
    ang = pos[:, None] * inv[None, :]
    c, s = np.cos(ang)[:, None], np.sin(ang)[:, None]
    xr, xp = x[..., :d], x[..., d:]
    x1, x2 = xr[..., 0::2], xr[..., 1::2]
    r1, r2 = x1 * c - x2 * s, x2 * c + x1 * s
    rot = np.stack([r1, r2], -1).reshape(xr.shape)
    return np.concatenate([rot, xp], -1)


def attn(q, k, v, Hkv, scale, softcap=0.0, slopes=None):
    """q [T, Hq, Dh], k/v [T, Hkv, Dh], causal."""
    T, Hq, Dh = q.shape
    G = Hq // Hkv
    k = np.repeat(k, G, axis=1)
    v = np.repeat(v, G, axis=1)
    s = np.einsum("thd,shd->hts", q, k) * scale
    if softcap:
        s = softcap * np.tanh(s / softcap)
    if slopes is not None:
        dist = (np.arange(T)[None, :] - np.arange(T)[:, None])
        s = s + slopes[:, None, None] * dist[None]
    mask = np.arange(T)[None, :] <= np.arange(T)[:, None]
    s = np.where(mask[None], s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("hts,shd->thd", p, v).reshape(T, Hq * Dh)


def silu(x):
    return x / (1 + np.exp(-x))


def gelu_tanh(x):
    return 0.5 * x * (1 + np.tanh(0.7978845608028654 *
                                  x * (1 + 0.044715 * x * x)))


def run_ours(sd, hf_cfg, tokens):
    mod = ARCH_MODULES[hf_cfg.model_type]
    cfg = mod.config_from_hf(hf_cfg)
    params = build_params(dict(sd), cfg, mod, quant=None, dtype=jnp.float32)
    cache = init_cache(cfg, 1, 32)
    logits, _ = model_step(params, jnp.asarray([tokens], jnp.int32),
                           jnp.zeros((1,), jnp.int32), cache, cfg)
    return np.asarray(logits[0]), cfg


class Obj:
    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __getattr__(self, k):   # missing attrs behave like getattr default
        raise AttributeError(k)


def rsd(shapes, seed):
    rng = np.random.default_rng(seed)
    return {k: (rng.standard_normal(v) * 0.05).astype(np.float32)
            if isinstance(v, tuple) else np.ones(v[0], np.float32)
            for k, v in shapes.items()}


# ----------------------------------------------------------------- baichuan

def _baichuan_sd(L, D, H, V, I, seed=0):
    shapes = {"model.embed_tokens.weight": (V, D),
              "model.norm.weight": [(D,)], "lm_head.weight": (V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        shapes.update({
            p + "self_attn.W_pack.weight": (3 * D, D),
            p + "self_attn.o_proj.weight": (D, D),
            p + "mlp.gate_proj.weight": (I, D),
            p + "mlp.up_proj.weight": (I, D),
            p + "mlp.down_proj.weight": (D, I),
            p + "input_layernorm.weight": [(D,)],
            p + "post_attention_layernorm.weight": [(D,)],
        })
    return rsd(shapes, seed)


def _baichuan_oracle(sd, L, D, H, V, tokens, use_alibi):
    from neural_tpu.ops.rope import alibi_slopes
    g = lambda k: np.asarray(sd[k], np.float64)
    Dh = D // H
    T = len(tokens)
    x = g("model.embed_tokens.weight")[tokens]
    pos = np.arange(T)
    slopes = alibi_slopes(H).astype(np.float64) if use_alibi else None
    for i in range(L):
        p = f"model.layers.{i}."
        h = rmsnorm(x, g(p + "input_layernorm.weight"))
        wp = g(p + "self_attn.W_pack.weight")
        q = (h @ wp[:D].T).reshape(T, H, Dh)
        k = (h @ wp[D:2 * D].T).reshape(T, H, Dh)
        v = (h @ wp[2 * D:].T).reshape(T, H, Dh)
        if not use_alibi:
            q, k = rope_neox(q, pos), rope_neox(k, pos)
        ctx = attn(q, k, v, H, Dh ** -0.5, slopes=slopes)
        x = x + ctx @ g(p + "self_attn.o_proj.weight").T
        h2 = rmsnorm(x, g(p + "post_attention_layernorm.weight"))
        m = silu(h2 @ g(p + "mlp.gate_proj.weight").T) * (
            h2 @ g(p + "mlp.up_proj.weight").T)
        x = x + m @ g(p + "mlp.down_proj.weight").T
    x = rmsnorm(x, g("model.norm.weight"))
    return x @ g("lm_head.weight").T


@pytest.mark.parametrize("alibi", [False, True], ids=["7b_rope", "13b_alibi"])
def test_baichuan_wpack_golden(alibi):
    L, D, H, V, I = 2, 64, 4, 96, 128
    sd = _baichuan_sd(L, D, H, V, I)
    hf_cfg = Obj(model_type="baichuan", vocab_size=V, hidden_size=D,
                 num_hidden_layers=L, num_attention_heads=H,
                 intermediate_size=I, rms_norm_eps=1e-6,
                 position_embedding="alibi" if alibi else "rope",
                 model_max_length=4096, bos_token_id=1, eos_token_id=2)
    toks = [3, 9, 1, 55, 20, 7]
    got, cfg = run_ours(sd, hf_cfg, toks)
    assert cfg.use_alibi == alibi
    ref = _baichuan_oracle(sd, L, D, H, V, toks, alibi)
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


# ------------------------------------------------------------------- qwen v1

def test_qwen_v1_golden():
    L, D, H, V, I = 2, 64, 4, 96, 128
    Dh = D // H
    shapes = {"transformer.wte.weight": (V, D),
              "transformer.ln_f.weight": [(D,)], "lm_head.weight": (V, D)}
    for i in range(L):
        p = f"transformer.h.{i}."
        shapes.update({
            p + "attn.c_attn.weight": (3 * D, D),
            p + "attn.c_attn.bias": (3 * D,),
            p + "attn.c_proj.weight": (D, D),
            p + "mlp.w1.weight": (I, D),      # up
            p + "mlp.w2.weight": (I, D),      # gate
            p + "mlp.c_proj.weight": (D, I),
            p + "ln_1.weight": [(D,)], p + "ln_2.weight": [(D,)],
        })
    sd = rsd(shapes, 7)
    hf_cfg = Obj(model_type="qwen", vocab_size=V, hidden_size=D,
                 num_hidden_layers=L, num_attention_heads=H,
                 intermediate_size=2 * I, layer_norm_epsilon=1e-6,
                 rotary_emb_base=10000.0, max_position_embeddings=2048,
                 eos_token_id=2, bos_token_id=1)
    toks = [5, 2, 88, 17, 4]
    got, cfg = run_ours(sd, hf_cfg, toks)
    assert cfg.intermediate_size == I

    g = lambda k: np.asarray(sd[k], np.float64)
    T = len(toks)
    x = g("transformer.wte.weight")[toks]
    pos = np.arange(T)
    for i in range(L):
        p = f"transformer.h.{i}."
        h = rmsnorm(x, g(p + "ln_1.weight"))
        w = g(p + "attn.c_attn.weight")
        b = g(p + "attn.c_attn.bias")
        q = (h @ w[:D].T + b[:D]).reshape(T, H, Dh)
        k = (h @ w[D:2 * D].T + b[D:2 * D]).reshape(T, H, Dh)
        v = (h @ w[2 * D:].T + b[2 * D:]).reshape(T, H, Dh)
        q, k = rope_neox(q, pos), rope_neox(k, pos)
        ctx = attn(q, k, v, H, Dh ** -0.5)
        x = x + ctx @ g(p + "attn.c_proj.weight").T
        h2 = rmsnorm(x, g(p + "ln_2.weight"))
        m = silu(h2 @ g(p + "mlp.w2.weight").T) * (
            h2 @ g(p + "mlp.w1.weight").T)
        x = x + m @ g(p + "mlp.c_proj.weight").T
    ref = rmsnorm(x, g("transformer.ln_f.weight")) @ g("lm_head.weight").T
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------- chatglm2/3

def test_chatglm2_golden():
    L, D, H, Hkv, V, I = 2, 64, 4, 2, 96, 80
    Dh = D // H
    qd, kvd = D, Hkv * Dh
    shapes = {"transformer.embedding.word_embeddings.weight": (V, D),
              "transformer.encoder.final_layernorm.weight": [(D,)],
              "transformer.output_layer.weight": (V, D)}
    for i in range(L):
        p = f"transformer.encoder.layers.{i}."
        shapes.update({
            p + "self_attention.query_key_value.weight": (qd + 2 * kvd, D),
            p + "self_attention.query_key_value.bias": (qd + 2 * kvd,),
            p + "self_attention.dense.weight": (D, D),
            p + "mlp.dense_h_to_4h.weight": (2 * I, D),   # [gate; up]
            p + "mlp.dense_4h_to_h.weight": (D, I),
            p + "input_layernorm.weight": [(D,)],
            p + "post_attention_layernorm.weight": [(D,)],
        })
    sd = rsd(shapes, 11)
    hf_cfg = Obj(model_type="chatglm", padded_vocab_size=V, hidden_size=D,
                 num_layers=L, num_attention_heads=H,
                 multi_query_attention=True, multi_query_group_num=Hkv,
                 ffn_hidden_size=I, layernorm_epsilon=1e-6,
                 add_qkv_bias=True, seq_length=2048)
    toks = [9, 3, 71, 12, 6]
    got, cfg = run_ours(sd, hf_cfg, toks)
    assert cfg.n_kv_heads == Hkv and cfg.rope_dim == Dh // 2

    g = lambda k: np.asarray(sd[k], np.float64)
    T = len(toks)
    x = g("transformer.embedding.word_embeddings.weight")[toks]
    pos = np.arange(T)
    for i in range(L):
        p = f"transformer.encoder.layers.{i}."
        h = rmsnorm(x, g(p + "input_layernorm.weight"))
        w = g(p + "self_attention.query_key_value.weight")
        b = g(p + "self_attention.query_key_value.bias")
        q = (h @ w[:qd].T + b[:qd]).reshape(T, H, Dh)
        k = (h @ w[qd:qd + kvd].T + b[qd:qd + kvd]).reshape(T, Hkv, Dh)
        v = (h @ w[qd + kvd:].T + b[qd + kvd:]).reshape(T, Hkv, Dh)
        q, k = rope_gptj_half(q, pos), rope_gptj_half(k, pos)
        ctx = attn(q, k, v, Hkv, Dh ** -0.5)
        x = x + ctx @ g(p + "self_attention.dense.weight").T
        h2 = rmsnorm(x, g(p + "post_attention_layernorm.weight"))
        gu = h2 @ g(p + "mlp.dense_h_to_4h.weight").T
        m = silu(gu[:, :I]) * gu[:, I:]
        x = x + m @ g(p + "mlp.dense_4h_to_h.weight").T
    ref = rmsnorm(x, g("transformer.encoder.final_layernorm.weight")) @ \
        g("transformer.output_layer.weight").T
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


# --------------------------------------------------------------------- grok

def test_grok_moe_golden():
    L, D, H, Hkv, V, I, E, K = 2, 64, 4, 2, 96, 80, 4, 2
    Dh = D // H
    mult = 0.08838834764831845                # attn_output_multiplier
    shapes = {"model.embed_tokens.weight": (V, D),
              "model.norm.weight": [(D,)], "lm_head.weight": (V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        shapes.update({
            p + "attn.q_proj.weight": (H * Dh, D),
            p + "attn.k_proj.weight": (Hkv * Dh, D),
            p + "attn.v_proj.weight": (Hkv * Dh, D),
            p + "attn.o_proj.weight": (D, H * Dh),
            p + "moe_block.gate.weight": (E, D),
            p + "pre_attn_norm.weight": [(D,)],
            p + "post_attn_norm.weight": [(D,)],
            p + "pre_moe_norm.weight": [(D,)],
            p + "post_moe_norm.weight": [(D,)],
        })
        for e in range(E):
            ep = p + f"moe_block.experts.{e}."
            shapes.update({ep + "linear.weight": (I, D),      # gate
                           ep + "linear_v.weight": (I, D),    # up
                           ep + "linear_1.weight": (D, I)})
    sd = rsd(shapes, 13)
    hf_cfg = Obj(model_type="grok-1", vocab_size=V, hidden_size=D,
                 num_hidden_layers=L, num_attention_heads=H,
                 num_key_value_heads=Hkv, intermediate_size=I,
                 rms_norm_eps=1e-6, num_experts=E, num_experts_per_tok=K,
                 attn_output_multiplier=mult,
                 embedding_multiplier_scale=78.38367176906169,
                 max_position_embeddings=2048)
    toks = [4, 61, 2, 19, 8]
    got, cfg = run_ours(sd, hf_cfg, toks)
    assert cfg.n_experts == E and cfg.attn_scale == mult

    g = lambda k: np.asarray(sd[k], np.float64)
    T = len(toks)
    x = g("model.embed_tokens.weight")[toks] * 78.38367176906169
    pos = np.arange(T)
    for i in range(L):
        p = f"model.layers.{i}."
        h = rmsnorm(x, g(p + "pre_attn_norm.weight"))
        q = rope_neox((h @ g(p + "attn.q_proj.weight").T
                       ).reshape(T, H, Dh), pos)
        k = rope_neox((h @ g(p + "attn.k_proj.weight").T
                       ).reshape(T, Hkv, Dh), pos)
        v = (h @ g(p + "attn.v_proj.weight").T).reshape(T, Hkv, Dh)
        ctx = attn(q, k, v, Hkv, mult, softcap=30.0)
        a = ctx @ g(p + "attn.o_proj.weight").T
        x = x + rmsnorm(a, g(p + "post_attn_norm.weight"))
        h2 = rmsnorm(x, g(p + "pre_moe_norm.weight"))
        logits = h2 @ g(p + "moe_block.gate.weight").T        # [T, E]
        top = np.argsort(-logits, axis=-1)[:, :K]
        moe = np.zeros_like(h2)
        for t in range(T):
            lg = logits[t, top[t]]
            wts = np.exp(lg - lg.max())
            wts = wts / wts.sum()
            for j, e in enumerate(top[t]):
                ep = p + f"moe_block.experts.{e}."
                m = gelu_tanh(h2[t] @ g(ep + "linear.weight").T) * (
                    h2[t] @ g(ep + "linear_v.weight").T)
                moe[t] += wts[j] * (m @ g(ep + "linear_1.weight").T)
        x = x + rmsnorm(moe, g(p + "post_moe_norm.weight"))
    xf = rmsnorm(x, g("model.norm.weight"))
    ref = xf @ g("lm_head.weight").T
    ref = 30.0 * np.tanh(ref / 30.0)                          # logit softcap
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)
