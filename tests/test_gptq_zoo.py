"""Arch-generic GPTQ import: synthetic GPTQ checkpoints for non-llama
families (incl. fused QKV/gate-up layouts and quantized-MoE experts)
import through the ordinary family tensor maps and match an independent
fp oracle end-to-end (reference: one convert_quantized_<family>.py per
family — convert/convert_quantized_{qwen,phi,falcon,baichuan,mixtral}.py)."""
import numpy as np
import pytest

import jax.numpy as jnp

from neural_tpu.convert.gptq import (gptq_reference_dequant,
                                     params_from_gptq_state_dict)
from neural_tpu.convert.hf import ARCH_MODULES, build_params
from neural_tpu.models.config import ModelConfig
from neural_tpu.runtime.generate import batch_logits

from test_gptq import synth

D, DH, NH, NKV, I, V, L = 64, 16, 4, 2, 96, 128, 2


def _linear(sd, fp_sd, base, K, N, seed, act_order=False, g_idx=None):
    """Emit one GPTQ-packed linear into ``sd`` and its exact fp twin (HF
    [out, in] layout) into ``fp_sd``."""
    qw, qz, sc, gi = synth(K=K, N=N, seed=seed, act_order=act_order)
    if g_idx is not None:
        gi = g_idx
    sd[base + ".qweight"], sd[base + ".qzeros"] = qw, qz
    sd[base + ".scales"] = sc
    if gi is not None:
        sd[base + ".g_idx"] = gi
    fp_sd[base + ".weight"] = gptq_reference_dequant(qw, qz, sc, gi).T
    return gi


def _vec(sd, fp_sd, name, n, rng, kind="ones"):
    v = (np.ones(n, np.float32) if kind == "ones"
         else rng.standard_normal(n).astype(np.float32) * 0.02)
    sd[name] = v
    fp_sd[name] = v


def _embed(sd, fp_sd, name, rng, rows=V, cols=D):
    w = rng.standard_normal((rows, cols)).astype(np.float32) * 0.02
    sd[name] = w
    fp_sd[name] = w


def _compare(sd, fp_sd, cfg, atol=3e-2):
    params_q = params_from_gptq_state_dict(sd, cfg, dtype=jnp.float32)
    mod = ARCH_MODULES[cfg.arch]
    params_fp = build_params(fp_sd, cfg, mod, quant=None, dtype=jnp.float32)
    ids = np.asarray([[3, 7, 11, 2, 9]], np.int32)
    lq = np.asarray(batch_logits(params_q, cfg, ids))
    lf = np.asarray(batch_logits(params_fp, cfg, ids))
    assert np.isfinite(lq).all()
    np.testing.assert_allclose(lq, lf, atol=atol, rtol=3e-2)
    return params_q


def test_gptq_qwen2():
    """llama-like + QKV bias (reference convert_quantized_qwen.py)."""
    cfg = ModelConfig(arch="qwen2", vocab_size=V, hidden_size=D,
                      n_layers=L, n_heads=NH, n_kv_heads=NKV, head_dim=DH,
                      intermediate_size=I, qkv_bias=True, max_seq_len=64,
                      eos_token_id=999)
    rng = np.random.default_rng(0)
    sd, fp = {}, {}
    s = 0
    for i in range(L):
        p = f"model.layers.{i}."
        for nm, K, N in [("self_attn.q_proj", D, cfg.q_dim),
                         ("self_attn.k_proj", D, cfg.kv_dim),
                         ("self_attn.v_proj", D, cfg.kv_dim),
                         ("self_attn.o_proj", cfg.q_dim, D),
                         ("mlp.gate_proj", D, I), ("mlp.up_proj", D, I),
                         ("mlp.down_proj", I, D)]:
            s += 1
            _linear(sd, fp, p + nm, K, N, seed=s)
        for bn, n in [("self_attn.q_proj.bias", cfg.q_dim),
                      ("self_attn.k_proj.bias", cfg.kv_dim),
                      ("self_attn.v_proj.bias", cfg.kv_dim)]:
            _vec(sd, fp, p + bn, n, rng, kind="randn")
        _vec(sd, fp, p + "input_layernorm.weight", D, rng)
        _vec(sd, fp, p + "post_attention_layernorm.weight", D, rng)
    _embed(sd, fp, "model.embed_tokens.weight", rng)
    _vec(sd, fp, "model.norm.weight", D, rng)
    _embed(sd, fp, "lm_head.weight", rng)
    _compare(sd, fp, cfg)


def test_gptq_phi3_fused():
    """Fused qkv_proj + gate_up_proj split on the packed tensors
    (reference convert_quantized_phi.py)."""
    cfg = ModelConfig(arch="phi3", vocab_size=V, hidden_size=D,
                      n_layers=L, n_heads=NH, n_kv_heads=NKV, head_dim=DH,
                      intermediate_size=I, max_seq_len=64, eos_token_id=999)
    rng = np.random.default_rng(1)
    sd, fp = {}, {}
    s = 100
    for i in range(L):
        p = f"model.layers.{i}."
        for nm, K, N in [("self_attn.qkv_proj", D,
                          cfg.q_dim + 2 * cfg.kv_dim),
                         ("self_attn.o_proj", cfg.q_dim, D),
                         ("mlp.gate_up_proj", D, 2 * I),
                         ("mlp.down_proj", I, D)]:
            s += 1
            _linear(sd, fp, p + nm, K, N, seed=s)
        _vec(sd, fp, p + "input_layernorm.weight", D, rng)
        _vec(sd, fp, p + "post_attention_layernorm.weight", D, rng)
    _embed(sd, fp, "model.embed_tokens.weight", rng)
    _vec(sd, fp, "model.norm.weight", D, rng)
    _embed(sd, fp, "lm_head.weight", rng)
    _compare(sd, fp, cfg)


def test_gptq_falcon_fused_gqa():
    """Falcon new-arch grouped query_key_value split + ln_attn/ln_mlp
    renaming on a quantized checkpoint (reference
    convert_quantized_falcon.py)."""
    cfg = ModelConfig(arch="falcon", vocab_size=V, hidden_size=D,
                      n_layers=L, n_heads=NH, n_kv_heads=NKV, head_dim=DH,
                      intermediate_size=I, norm_type="layernorm",
                      act="gelu", mlp_gated=False, parallel_residual=True,
                      tie_word_embeddings=True, max_seq_len=64,
                      eos_token_id=999)
    rng = np.random.default_rng(2)
    sd, fp = {}, {}
    s = 200
    fused_n = NKV * (NH // NKV + 2) * DH
    for i in range(L):
        p = f"transformer.h.{i}."
        for nm, K, N in [("self_attention.query_key_value", D, fused_n),
                         ("self_attention.dense", cfg.q_dim, D),
                         ("mlp.dense_h_to_4h", D, I),
                         ("mlp.dense_4h_to_h", I, D)]:
            s += 1
            _linear(sd, fp, p + nm, K, N, seed=s)
        for nm in ("ln_attn", "ln_mlp"):
            _vec(sd, fp, p + nm + ".weight", D, rng)
            _vec(sd, fp, p + nm + ".bias", D, rng, kind="randn")
    _embed(sd, fp, "transformer.word_embeddings.weight", rng)
    _vec(sd, fp, "transformer.ln_f.weight", D, rng)
    _vec(sd, fp, "transformer.ln_f.bias", D, rng, kind="randn")
    _compare(sd, fp, cfg)


def test_gptq_baichuan_wpack():
    """Fused W_pack QKV (reference convert_quantized_baichuan.py)."""
    cfg = ModelConfig(arch="baichuan", vocab_size=V, hidden_size=D,
                      n_layers=L, n_heads=NH, n_kv_heads=NH, head_dim=DH,
                      intermediate_size=I, max_seq_len=64, eos_token_id=999)
    rng = np.random.default_rng(3)
    sd, fp = {}, {}
    s = 300
    for i in range(L):
        p = f"model.layers.{i}."
        for nm, K, N in [("self_attn.W_pack", D, 3 * D),
                         ("self_attn.o_proj", D, D),
                         ("mlp.gate_proj", D, I), ("mlp.up_proj", D, I),
                         ("mlp.down_proj", I, D)]:
            s += 1
            _linear(sd, fp, p + nm, K, N, seed=s)
        _vec(sd, fp, p + "input_layernorm.weight", D, rng)
        _vec(sd, fp, p + "post_attention_layernorm.weight", D, rng)
    _embed(sd, fp, "model.embed_tokens.weight", rng)
    _vec(sd, fp, "model.norm.weight", D, rng)
    _embed(sd, fp, "lm_head.weight", rng)
    _compare(sd, fp, cfg)


def test_gptq_gptj_bias_mlp():
    """Non-gated biased MLP + biased lm_head (reference
    convert_quantized_gptj.py)."""
    cfg = ModelConfig(arch="gptj", vocab_size=V, hidden_size=D,
                      n_layers=L, n_heads=NH, n_kv_heads=NH, head_dim=DH,
                      intermediate_size=I, norm_type="layernorm",
                      act="gelu_tanh", mlp_gated=False, mlp_bias=True,
                      rope_style="gptj", rope_dim=8, parallel_residual=True,
                      max_seq_len=64, eos_token_id=999)
    rng = np.random.default_rng(4)
    sd, fp = {}, {}
    s = 400
    for i in range(L):
        p = f"transformer.h.{i}."
        for nm, K, N in [("attn.q_proj", D, D), ("attn.k_proj", D, D),
                         ("attn.v_proj", D, D), ("attn.out_proj", D, D),
                         ("mlp.fc_in", D, I), ("mlp.fc_out", I, D)]:
            s += 1
            _linear(sd, fp, p + nm, K, N, seed=s)
        _vec(sd, fp, p + "ln_1.weight", D, rng)
        _vec(sd, fp, p + "ln_1.bias", D, rng, kind="randn")
        _vec(sd, fp, p + "mlp.fc_in.bias", I, rng, kind="randn")
        _vec(sd, fp, p + "mlp.fc_out.bias", D, rng, kind="randn")
    _embed(sd, fp, "transformer.wte.weight", rng)
    _vec(sd, fp, "transformer.ln_f.weight", D, rng)
    _vec(sd, fp, "transformer.ln_f.bias", D, rng, kind="randn")
    _embed(sd, fp, "lm_head.weight", rng)
    _vec(sd, fp, "lm_head.bias", V, rng, kind="randn")
    _compare(sd, fp, cfg)


def test_gptq_mixtral_moe_experts():
    """Quantized MoE experts + fp router (reference
    convert_quantized_mixtral.py)."""
    E = 4
    cfg = ModelConfig(arch="mixtral", vocab_size=V, hidden_size=D,
                      n_layers=L, n_heads=NH, n_kv_heads=NKV, head_dim=DH,
                      intermediate_size=I, n_experts=E, n_experts_active=2,
                      max_seq_len=64, eos_token_id=999)
    rng = np.random.default_rng(5)
    sd, fp = {}, {}
    s = 500
    for i in range(L):
        p = f"model.layers.{i}."
        for nm, K, N in [("self_attn.q_proj", D, cfg.q_dim),
                         ("self_attn.k_proj", D, cfg.kv_dim),
                         ("self_attn.v_proj", D, cfg.kv_dim),
                         ("self_attn.o_proj", cfg.q_dim, D)]:
            s += 1
            _linear(sd, fp, p + nm, K, N, seed=s)
        for e in range(E):
            ep = p + f"block_sparse_moe.experts.{e}."
            for nm, K, N in [("w1", D, I), ("w3", D, I), ("w2", I, D)]:
                s += 1
                _linear(sd, fp, ep + nm, K, N, seed=s)
        router = rng.standard_normal((E, D)).astype(np.float32) * 0.1
        sd[p + "block_sparse_moe.gate.weight"] = router
        fp[p + "block_sparse_moe.gate.weight"] = router
        _vec(sd, fp, p + "input_layernorm.weight", D, rng)
        _vec(sd, fp, p + "post_attention_layernorm.weight", D, rng)
    _embed(sd, fp, "model.embed_tokens.weight", rng)
    _vec(sd, fp, "model.norm.weight", D, rng)
    _embed(sd, fp, "lm_head.weight", rng)
    params_q = _compare(sd, fp, cfg)
    # the experts really are QTensors (not silently dequantized)
    from neural_tpu.core.qtensor import QTensor
    ex = params_q["layers"]["experts"]
    assert all(isinstance(ex[k], QTensor)
               for k in ("w_gate", "w_up", "w_down"))


def test_gptq_qwen2_act_order_folds_and_fuses():
    """Act-order on a non-llama family: shared g_idx per producer group →
    w_down's perm folds into gate/up columns; qkv fuse with ONE gather."""
    cfg = ModelConfig(arch="qwen2", vocab_size=V, hidden_size=D,
                      n_layers=1, n_heads=NH, n_kv_heads=NKV, head_dim=DH,
                      intermediate_size=I, qkv_bias=True, max_seq_len=64,
                      eos_token_id=999)
    rng = np.random.default_rng(6)
    # same-Hessian groups share one g_idx (as AutoGPTQ produces)
    gD = np.empty(D, np.int32)
    gD[rng.permutation(D)] = np.arange(D) // 32
    gI = np.empty(I, np.int32)
    gI[rng.permutation(I)] = np.arange(I) // 32
    sd, fp = {}, {}
    s = 600
    p = "model.layers.0."
    for nm, K, N, gi in [("self_attn.q_proj", D, cfg.q_dim, gD),
                         ("self_attn.k_proj", D, cfg.kv_dim, gD),
                         ("self_attn.v_proj", D, cfg.kv_dim, gD),
                         ("self_attn.o_proj", cfg.q_dim, D, None),
                         ("mlp.gate_proj", D, I, None),
                         ("mlp.up_proj", D, I, None),
                         ("mlp.down_proj", I, D, gI)]:
        s += 1
        _linear(sd, fp, p + nm, K, N, seed=s,
                act_order=gi is not None, g_idx=gi)
    for bn, n in [("self_attn.q_proj.bias", cfg.q_dim),
                  ("self_attn.k_proj.bias", cfg.kv_dim),
                  ("self_attn.v_proj.bias", cfg.kv_dim)]:
        _vec(sd, fp, p + bn, n, rng, kind="randn")
    _vec(sd, fp, p + "input_layernorm.weight", D, rng)
    _vec(sd, fp, p + "post_attention_layernorm.weight", D, rng)
    _embed(sd, fp, "model.embed_tokens.weight", rng)
    _vec(sd, fp, "model.norm.weight", D, rng)
    _embed(sd, fp, "lm_head.weight", rng)
    params_q = _compare(sd, fp, cfg)
    lp = params_q["layers"]
    from neural_tpu.core.qtensor import QTensor
    assert "wqkv" in lp and isinstance(lp["wqkv"], QTensor)
    assert lp["wqkv"].perm is not None          # one shared runtime gather
    assert lp["w_down"].perm is None            # folded into gate/up cols
