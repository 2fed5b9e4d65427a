"""StreamingLLM shift-RoPE tests.

Exact golden check: after compact-and-shift, the cache must be
indistinguishable from one freshly built at the shifted positions —
rope(x, p)·R(-Δ) == rope(x, p-Δ) — so the next-token logits must match a
from-scratch forward over [sinks + kept tokens] (reference semantics of
docs/infinite_inference.md).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_tpu.convert import init_random
from neural_tpu.models.config import ModelConfig
from neural_tpu.runtime import init_cache, model_step
from neural_tpu.runtime.streaming import shift_cache, stream_generate


def tiny_cfg(rope_style="neox", **kw):
    base = dict(arch="llama", vocab_size=128, hidden_size=64, n_layers=2,
                n_heads=4, n_kv_heads=2, head_dim=16, intermediate_size=128,
                max_seq_len=256, rope_style=rope_style, eos_token_id=999)
    base.update(kw)
    return ModelConfig(**base)


@pytest.mark.parametrize("rope_style", ["neox", "gptj"])
@pytest.mark.parametrize("kv_dtype", ["bf16", "int8"])
def test_shift_matches_recompute(rope_style, kv_dtype):
    # single layer: K/V of kept tokens depend only on their own embeddings,
    # so the shift must match a from-scratch recompute EXACTLY. (With more
    # layers the kept tokens' deeper K/V were computed attending to the
    # dropped tokens — the inherent StreamingLLM approximation.)
    cfg = tiny_cfg(rope_style, n_layers=1)
    params = init_random(cfg, dtype=jnp.float32)
    S, n_keep, n_discard = 16, 4, 6
    rng = np.random.default_rng(0)
    toks = list(map(int, rng.integers(1, 128, S)))

    dt = jnp.bfloat16 if kv_dtype == "bf16" else "int8"
    cache = init_cache(cfg, 1, S, dt)
    logits, cache = model_step(params, jnp.asarray([toks], jnp.int32),
                               jnp.zeros((1,), jnp.int32), cache, cfg)
    shifted = shift_cache(cache, params["rope_inv_freqs"], cfg,
                          n_keep, n_discard)

    # reference: from-scratch on [sink + kept] tokens at contiguous positions
    kept = toks[:n_keep] + toks[n_keep + n_discard:]
    ref_cache = init_cache(cfg, 1, S, dt)
    ref_logits, ref_cache = model_step(
        params, jnp.asarray([kept], jnp.int32),
        jnp.zeros((1,), jnp.int32), ref_cache, cfg)

    # continue one decode step from both caches: logits must agree
    nxt = jnp.asarray([[42]], jnp.int32)
    pos = jnp.asarray([S - n_discard], jnp.int32)
    l1, _ = model_step(params, nxt, pos, shifted, cfg)
    l2, _ = model_step(params, nxt, pos, ref_cache, cfg)
    atol = 2e-2 if kv_dtype == "bf16" else 2e-1
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               atol=atol, rtol=0.05)


def test_shift_multi_layer_close():
    """Multi-layer: shifted-cache logits correlate strongly with recompute
    (StreamingLLM approximation, not exact)."""
    cfg = tiny_cfg()
    params = init_random(cfg, dtype=jnp.float32)
    S, n_keep, n_discard = 16, 4, 6
    toks = list(map(int, np.random.default_rng(0).integers(1, 128, S)))
    cache = init_cache(cfg, 1, S)
    _, cache = model_step(params, jnp.asarray([toks], jnp.int32),
                          jnp.zeros((1,), jnp.int32), cache, cfg)
    shifted = shift_cache(cache, params["rope_inv_freqs"], cfg,
                          n_keep, n_discard)
    kept = toks[:n_keep] + toks[n_keep + n_discard:]
    ref_cache = init_cache(cfg, 1, S)
    _, ref_cache = model_step(params, jnp.asarray([kept], jnp.int32),
                              jnp.zeros((1,), jnp.int32), ref_cache, cfg)
    nxt = jnp.asarray([[42]], jnp.int32)
    pos = jnp.asarray([S - n_discard], jnp.int32)
    l1, _ = model_step(params, nxt, pos, shifted, cfg)
    l2, _ = model_step(params, nxt, pos, ref_cache, cfg)
    a, b = np.asarray(l1).ravel(), np.asarray(l2).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99, cos


def test_stream_generate_beyond_cache():
    cfg = tiny_cfg()
    params = init_random(cfg, dtype=jnp.float32)
    out = stream_generate(params, cfg, [1, 2, 3, 4, 5], max_new_tokens=40,
                          max_len=16, n_keep=4, n_discard=6)
    assert len(out) == 45
    assert all(0 <= t < 128 for t in out)


def test_stream_equals_plain_before_overflow():
    """Until the cache fills, streaming == plain greedy."""
    from neural_tpu.runtime import greedy_generate
    cfg = tiny_cfg()
    params = init_random(cfg, dtype=jnp.float32)
    plain = greedy_generate(params, cfg, [1, 2, 3], max_new_tokens=8,
                            max_len=32, stop_at_eos=False)
    stream = stream_generate(params, cfg, [1, 2, 3], max_new_tokens=8,
                             max_len=32, n_keep=4)
    assert plain == stream
