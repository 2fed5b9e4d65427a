"""ChatGLM v1 prefix-LM graph vs an independent numpy oracle.

The oracle implements the GLM graph exactly as the reference builds it
(neural_speed/models/chatglm/chatglm.cpp:100-265): LayerNorm, per-head
fused QKV, 2-D GLM RoPE (ne_layers.c:9324 ``is_glm``), bidirectional
prompt attention with only the last prompt token's key masked
(chatglm.cpp:205-216), DeepNorm alpha residuals, GELU(tanh) MLP.
THUDM v1 checkpoints need remote code (unavailable offline), so the
oracle — written independently from the reference's math — is the golden.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_tpu.models.config import ModelConfig
from neural_tpu.convert import init_random
from neural_tpu.runtime import init_cache, model_step


def mk_cfg(L=2, D=64, H=4, V=96):
    Dh = D // H
    return ModelConfig(
        arch="chatglm1", vocab_size=V, hidden_size=D, n_layers=L,
        n_heads=H, n_kv_heads=H, head_dim=Dh, intermediate_size=2 * D,
        norm_type="layernorm", act="gelu_tanh", mlp_gated=False,
        mlp_bias=True, qkv_bias=True, o_bias=True,
        rope_style="glm1", rope_dim=Dh // 2, prefix_lm=True,
        residual_alpha=float(np.sqrt(2.0 * L)), max_seq_len=64)


def _ln(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _gelu_tanh(x):
    return 0.5 * x * (1.0 + np.tanh(
        0.7978845608028654 * x * (1.0 + 0.044715 * x * x)))


def _glm_rope(x, positions, P, Dh):
    """2-D GLM rope on [T, H, Dh]: NeoX halves of each Dh/2 half, first
    with clamped position ids, second with block ids."""
    d = Dh // 2
    nd2 = d // 2
    inv = 1.0 / (10000.0 ** (np.arange(0, d, 2) / d))      # [d/2]
    pos = np.minimum(positions, max(P - 2, 0)).astype(np.float64)
    blk = np.maximum(positions - (P - 2), 0).astype(np.float64)
    out = x.copy()
    for name, half, theta in (("a", 0, pos), ("b", d, blk)):
        ang = theta[:, None] * inv[None, :]                # [T, d/2]
        c, s = np.cos(ang), np.sin(ang)
        x1 = x[..., half:half + nd2]                       # [T, H, d/2]
        x2 = x[..., half + nd2:half + d]
        out[..., half:half + nd2] = x1 * c[:, None] - x2 * s[:, None]
        out[..., half + nd2:half + d] = x2 * c[:, None] + x1 * s[:, None]
    return out


def oracle_forward(params, cfg, tokens, P):
    """Full-sequence GLM forward in numpy (no cache). tokens: [T] ids;
    P: prompt length (tokens[:P] is the prompt). Returns logits [T, V]."""
    g = lambda a: np.asarray(a, np.float64)
    lay = params["layers"]
    T = len(tokens)
    D, H, Dh = cfg.hidden_size, cfg.n_heads, cfg.head_dim
    alpha = cfg.residual_alpha
    x = g(params["embed"])[tokens]                         # [T, D]
    positions = np.arange(T)

    # prefix-LM mask: key j visible to query i iff j <= i or j < P-1
    mask = (np.arange(T)[None, :] <= np.arange(T)[:, None]) | \
           (np.arange(T)[None, :] < P - 1)

    for l in range(cfg.n_layers):
        h = _ln(x, g(lay["attn_norm_w"][l]), g(lay["attn_norm_b"][l]),
                cfg.norm_eps)
        q = h @ g(lay["wq"][l]) + g(lay["bq"][l])
        k = h @ g(lay["wk"][l]) + g(lay["bk"][l])
        v = h @ g(lay["wv"][l]) + g(lay["bv"][l])
        q = _glm_rope(q.reshape(T, H, Dh), positions, P, Dh)
        k = _glm_rope(k.reshape(T, H, Dh), positions, P, Dh)
        v = v.reshape(T, H, Dh)
        scores = np.einsum("thd,shd->hts", q, k) / np.sqrt(Dh)
        scores = np.where(mask[None], scores, -1e30)
        p = np.exp(scores - scores.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        ctx = np.einsum("hts,shd->thd", p, v).reshape(T, D)
        attn_out = ctx @ g(lay["wo"][l]) + g(lay["bo"][l])
        x = alpha * h + attn_out
        h2 = _ln(x, g(lay["ffn_norm_w"][l]), g(lay["ffn_norm_b"][l]),
                 cfg.norm_eps)
        up = _gelu_tanh(h2 @ g(lay["w_up"][l]) + g(lay["b_up"][l]))
        mlp_out = up @ g(lay["w_down"][l]) + g(lay["b_down"][l])
        x = alpha * h2 + mlp_out
    x = _ln(x, g(params["final_norm_w"]), g(params["final_norm_b"]),
            cfg.norm_eps)
    return x @ g(params["lm_head"])


def test_chatglm1_prefill_matches_oracle():
    cfg = mk_cfg()
    params = init_random(cfg, dtype=jnp.float32)
    toks = [3, 11, 25, 7, 40, 1, 9]                        # P = 7 prompt
    P = len(toks)
    ref = oracle_forward(params, cfg, toks, P)

    cache = init_cache(cfg, 1, 32)
    logits, _ = model_step(params, jnp.asarray([toks], jnp.int32),
                           jnp.zeros((1,), jnp.int32), cache, cfg)
    got = np.asarray(logits[0])
    # activations run in bf16 inside forward(); the f64 oracle differs by
    # accumulated rounding (alpha≈2 residuals amplify it)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
    assert (np.argmax(got, -1) == np.argmax(ref, -1)).all()


def test_chatglm1_decode_matches_oracle():
    """Decode steps (cached, block positions advancing) must equal the
    oracle's full-sequence recompute at each length."""
    from neural_tpu.models.transformer import forward
    cfg = mk_cfg()
    params = init_random(cfg, seed=3, dtype=jnp.float32)
    prompt = [5, 2, 33, 17, 8]
    P = len(prompt)
    cache = init_cache(cfg, 1, 32)
    plen = jnp.asarray([P], jnp.int32)
    logits, cache = forward(params, jnp.asarray([prompt], jnp.int32),
                            jnp.zeros((1,), jnp.int32), cache, cfg,
                            prompt_len=plen)
    seq = list(prompt)
    for step in range(3):
        ref = oracle_forward(params, cfg, seq, P)
        np.testing.assert_allclose(np.asarray(logits[0, -1]), ref[-1],
                                   rtol=2e-2, atol=2e-2)
        nxt = int(np.argmax(ref[-1]))
        logits, cache = forward(
            params, jnp.asarray([[nxt]], jnp.int32),
            jnp.asarray([len(seq)], jnp.int32), cache, cfg,
            prompt_len=plen)
        seq.append(nxt)


def test_chatglm1_prefix_mask_bidirectional():
    """Sanity: changing a FUTURE prompt token must change an EARLIER
    position's logits (bidirectional prefix), unlike a causal model."""
    cfg = mk_cfg()
    params = init_random(cfg, seed=1, dtype=jnp.float32)
    t1 = [4, 9, 2, 30, 6, 1]
    t2 = list(t1)
    t2[3] = 21                                             # mutate future
    l1 = oracle_forward(params, cfg, t1, len(t1))
    l2 = oracle_forward(params, cfg, t2, len(t2))
    assert np.abs(l1[1] - l2[1]).max() > 1e-6

    cache = init_cache(cfg, 1, 32)
    g1, _ = model_step(params, jnp.asarray([t1], jnp.int32),
                       jnp.zeros((1,), jnp.int32), cache, cfg)
    cache = init_cache(cfg, 1, 32)
    g2, _ = model_step(params, jnp.asarray([t2], jnp.int32),
                       jnp.zeros((1,), jnp.int32), cache, cfg)
    assert np.abs(np.asarray(g1[0, 1]) - np.asarray(g2[0, 1])).max() > 1e-6


def test_chatglm1_flash_prefill_prefix():
    """The Pallas prefill kernel's prefix mask (interpret mode) vs the XLA
    oracle at kernel-legal shapes."""
    from neural_tpu.ops.attention import flash_prefill, attend_xla
    B, Hq, Dh, S, T, P = 1, 8, 128, 512, 128, 96
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, Hq, Dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, Hq, S, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, Hq, S, Dh)), jnp.bfloat16)
    positions = jnp.arange(T)[None, :].astype(jnp.int32)
    cfg = ModelConfig(arch="chatglm1", n_heads=Hq, n_kv_heads=Hq,
                      head_dim=Dh, hidden_size=Hq * Dh, prefix_lm=True)
    pl_ = jnp.full((B,), P, jnp.int32)
    ref = attend_xla(q, k, v, None, None, positions, cfg, prefix_len=pl_)
    out = flash_prefill(q, k, v, starts=jnp.zeros((B,), jnp.int32),
                        blk_t=128, blk_s=256, prefix_len=pl_,
                        interpret=True)
    np.testing.assert_allclose(
        np.asarray(out).reshape(ref.shape), np.asarray(ref),
        atol=3e-2, rtol=3e-2)


def test_chatglm1_production_decode_paths_pass_prompt_len():
    """The PRODUCTION decode paths (greedy_generate / generate /
    decode_loop / Model.generate batched / scheduler) must anchor the 2-D
    GLM RoPE at the prompt boundary — regression for the bug where
    forward's start+T default made generated tokens' block ids stick at 1.
    Oracle: manual forward loop passing prompt_len explicitly."""
    from neural_tpu.models.transformer import forward
    from neural_tpu.runtime.generate import greedy_generate, decode_loop
    cfg = mk_cfg()
    params = init_random(cfg, seed=5, dtype=jnp.float32)
    prompt = [5, 2, 33, 17, 8]
    P = len(prompt)
    n_new = 6

    # reference loop: explicit prompt_len (pinned correct by
    # test_chatglm1_decode_matches_oracle)
    cache = init_cache(cfg, 1, 32)
    plen = jnp.asarray([P], jnp.int32)
    logits, cache = forward(params, jnp.asarray([prompt], jnp.int32),
                            jnp.zeros((1,), jnp.int32), cache, cfg,
                            prompt_len=plen)
    want = list(prompt)
    pos = P
    for _ in range(n_new):
        nxt = int(np.argmax(np.asarray(logits[0, -1])))
        want.append(nxt)
        logits, cache = forward(params, jnp.asarray([[nxt]], jnp.int32),
                                jnp.asarray([pos], jnp.int32), cache, cfg,
                                prompt_len=plen)
        pos += 1

    got = greedy_generate(params, cfg, prompt, max_new_tokens=n_new + 1,
                          max_len=32, stop_at_eos=False)
    assert got[:P + n_new] == want, (got, want)

    # on-device decode_loop path
    cache = init_cache(cfg, 1, 32)
    logits, cache = forward(params, jnp.asarray([prompt], jnp.int32),
                            jnp.zeros((1,), jnp.int32), cache, cfg,
                            prompt_len=plen)
    tok0 = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
    toks, _ = decode_loop(params, tok0, jnp.asarray([P], jnp.int32),
                          cache, cfg, n_new - 1, prompt_len=plen)
    assert [int(want[P])] + [int(t) for t in np.asarray(toks)[:, 0]] \
        == want[P:], (toks, want[P:])

    # scheduler path (single-shot prefill — prefix-LM forces chunk=None)
    from neural_tpu.serving import Scheduler
    from neural_tpu.runtime import SamplingParams
    sched = Scheduler(params, cfg, max_batch=2, max_len=32,
                      prefill_buckets=(8, 16),
                      sampling=SamplingParams(greedy=True,
                                              repeat_penalty=1.0))
    sched.add_request("a", prompt, max_new_tokens=n_new)
    done = sched.run_to_completion()
    assert done[0].output_ids == want[P:P + n_new], \
        (done[0].output_ids, want[P:])
