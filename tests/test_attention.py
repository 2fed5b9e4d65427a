"""Fused attention kernel vs the jnp oracle; int8 KV accuracy.

Models the reference's mha_dense_tests.cpp (fused attention vs
bestla_fusion_attn_forward_ref).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_tpu.models.config import ModelConfig
from neural_tpu.ops.attention import (
    attend_xla, flash_decode, quantize_kv, attend)


def mk_case(B=2, Hq=8, Hkv=4, Dh=128, S=512, length=300, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, Dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32))
    positions = jnp.full((B, 1), length - 1, jnp.int32)
    return q, k, v, positions


def cfg_for(Hq=8, Hkv=4, Dh=128, **kw):
    return ModelConfig(arch="llama", n_heads=Hq, n_kv_heads=Hkv, head_dim=Dh,
                       hidden_size=Hq * Dh, **kw)


@pytest.mark.parametrize("Hkv,G_name", [(8, "mha"), (4, "gqa"), (1, "mqa")])
def test_flash_decode_matches_oracle(Hkv, G_name):
    q, k, v, pos = mk_case(Hkv=Hkv)
    cfg = cfg_for(Hkv=Hkv)
    ref = attend_xla(q, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                     None, None, pos, cfg)
    out = flash_decode(q[:, 0], k.astype(jnp.bfloat16),
                       v.astype(jnp.bfloat16), None, None,
                       lengths=pos[:, 0] + 1, interpret=True)
    np.testing.assert_allclose(np.asarray(out).reshape(ref.shape),
                               np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_flash_decode_int8_kv():
    q, k, v, pos = mk_case()
    cfg = cfg_for()
    ref = attend_xla(q, k, v, None, None, pos, cfg)   # fp oracle

    kq, ks = quantize_kv(k)                           # [B,Hkv,S]
    vq, vs = quantize_kv(v)

    # int8 oracle and int8 kernel must agree tightly
    ref8 = attend_xla(q, kq, vq, ks, vs, pos, cfg)
    out = flash_decode(q[:, 0], kq, vq, ks, vs, lengths=pos[:, 0] + 1,
                       interpret=True)
    np.testing.assert_allclose(np.asarray(out).reshape(ref8.shape),
                               np.asarray(ref8), atol=2e-2, rtol=2e-2)
    # and int8 vs fp within quantization noise
    rel = np.abs(np.asarray(ref8) - np.asarray(ref)) / (
        np.abs(np.asarray(ref)).mean() + 1e-6)
    assert np.median(rel) < 0.03


def test_flash_decode_short_length():
    """length smaller than one block — masking correctness."""
    q, k, v, pos = mk_case(S=512, length=17)
    cfg = cfg_for()
    ref = attend_xla(q, k, v, None, None, pos, cfg)
    out = flash_decode(q[:, 0], k, v, None, None, lengths=pos[:, 0] + 1,
                       blk_s=512, interpret=True)
    np.testing.assert_allclose(np.asarray(out).reshape(ref.shape),
                               np.asarray(ref), atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("blk_s,hb", [(128, 8), (128, 16), (256, 8)])
def test_flash_decode_small_blocks(blk_s, hb):
    """fill-hinted small S-blocks (decode_blk_s path) vs oracle."""
    q, k, v, pos = mk_case(Hkv=8, S=512, length=300)
    cfg = cfg_for(Hkv=8)
    ref = attend_xla(q, k, v, None, None, pos, cfg)
    out = flash_decode(q[:, 0], k, v, None, None, lengths=pos[:, 0] + 1,
                       blk_s=blk_s, hb=hb, interpret=True)
    np.testing.assert_allclose(np.asarray(out).reshape(ref.shape),
                               np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_flash_decode_window():
    q, k, v, pos = mk_case(length=400)
    cfg = cfg_for(sliding_window=128)
    ref = attend_xla(q, k, v, None, None, pos, cfg)
    out = flash_decode(q[:, 0], k, v, None, None, lengths=pos[:, 0] + 1,
                       window=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out).reshape(ref.shape),
                               np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_flash_decode_softcap():
    q, k, v, pos = mk_case()
    cfg = cfg_for(attn_softcap=30.0)
    ref = attend_xla(q, k, v, None, None, pos, cfg)
    out = flash_decode(q[:, 0], k, v, None, None, lengths=pos[:, 0] + 1,
                       softcap=30.0, interpret=True)
    np.testing.assert_allclose(np.asarray(out).reshape(ref.shape),
                               np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_int8_cache_end_to_end():
    """Full model with int8 KV cache: logits close to bf16-cache logits."""
    from neural_tpu.convert import init_random
    from neural_tpu.runtime import init_cache, model_step
    cfg = ModelConfig(arch="llama", vocab_size=128, hidden_size=128,
                      n_layers=2, n_heads=8, n_kv_heads=4, head_dim=16,
                      intermediate_size=256, max_seq_len=64)
    params = init_random(cfg, dtype=jnp.float32)
    toks = jnp.asarray([[5, 9, 2, 7, 33, 1, 8, 20]], jnp.int32)
    start = jnp.zeros((1,), jnp.int32)

    l16, _ = model_step(params, toks, start, init_cache(cfg, 1, 32), cfg)
    l8, c8 = model_step(params, toks, start,
                        init_cache(cfg, 1, 32, "int8"), cfg)
    assert c8.k.dtype == jnp.int8 and c8.k_scale is not None
    cos = np.sum(np.asarray(l16) * np.asarray(l8), -1) / (
        np.linalg.norm(np.asarray(l16), axis=-1)
        * np.linalg.norm(np.asarray(l8), axis=-1) + 1e-9)
    assert cos.min() > 0.999, cos.min()


@pytest.mark.parametrize("Hkv", [8, 4, 1])
def test_flash_prefill_matches_oracle(Hkv):
    from neural_tpu.ops.attention import flash_prefill
    B, Hq, Dh, S, T, start = 2, 8, 128, 512, 128, 37
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, Hq, Dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, Dh)), jnp.bfloat16)
    positions = start + jnp.arange(T)[None, :].astype(jnp.int32) \
        * jnp.ones((B, 1), jnp.int32)
    cfg = cfg_for(Hkv=Hkv)
    ref = attend_xla(q, k, v, None, None, positions, cfg)
    out = flash_prefill(q, k, v, starts=jnp.full((B,), start, jnp.int32),
                        blk_t=128, blk_s=256, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out).reshape(ref.shape), np.asarray(ref),
        atol=3e-2, rtol=3e-2)


def test_flash_prefill_window_softcap():
    from neural_tpu.ops.attention import flash_prefill
    B, Hq, Hkv, Dh, S, T = 1, 4, 2, 128, 512, 128
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, T, Hq, Dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, Dh)), jnp.bfloat16)
    positions = jnp.arange(T)[None, :].astype(jnp.int32)
    cfg = cfg_for(Hq=4, Hkv=2, sliding_window=64, attn_softcap=30.0)
    ref = attend_xla(q, k, v, None, None, positions, cfg)
    out = flash_prefill(q, k, v, starts=jnp.zeros((B,), jnp.int32),
                        blk_t=128, blk_s=256, window=64, softcap=30.0,
                        interpret=True)
    np.testing.assert_allclose(
        np.asarray(out).reshape(ref.shape), np.asarray(ref),
        atol=3e-2, rtol=3e-2)


def test_flash_decode_alibi():
    """Fused ALiBi bias in the decode kernel vs oracle (MPT/BLOOM path)."""
    from neural_tpu.ops.rope import alibi_slopes
    q, k, v, pos = mk_case(Hq=8, Hkv=8, length=300)
    slopes = alibi_slopes(8)
    cfg = cfg_for(Hkv=8, use_alibi=True, rope_style="none")
    ref = attend_xla(q, k, v, None, None, pos, cfg, slopes=slopes)
    out = flash_decode(q[:, 0], k, v, None, None, lengths=pos[:, 0] + 1,
                       slopes=slopes, interpret=True)
    np.testing.assert_allclose(np.asarray(out).reshape(ref.shape),
                               np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_flash_decode_alibi_gqa():
    from neural_tpu.ops.rope import alibi_slopes
    q, k, v, pos = mk_case(Hq=8, Hkv=4, length=200)
    slopes = alibi_slopes(8)
    cfg = cfg_for(Hkv=4, use_alibi=True, rope_style="none")
    ref = attend_xla(q, k, v, None, None, pos, cfg, slopes=slopes)
    out = flash_decode(q[:, 0], k, v, None, None, lengths=pos[:, 0] + 1,
                       slopes=slopes, interpret=True)
    np.testing.assert_allclose(np.asarray(out).reshape(ref.shape),
                               np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_flash_decode_dynamic_window():
    """window passed as a TRACED scalar (Gemma-2 per-layer sliding)."""
    q, k, v, pos = mk_case(length=400)
    cfg = cfg_for(sliding_window=128)
    ref = attend_xla(q, k, v, None, None, pos, cfg)

    out = flash_decode(q[:, 0], k, v, None, None, lengths=pos[:, 0] + 1,
                       window=jnp.int32(128), interpret=True)
    np.testing.assert_allclose(np.asarray(out).reshape(ref.shape),
                               np.asarray(ref), atol=2e-2, rtol=2e-2)
    # window=0 (traced) == full-context
    cfg0 = cfg_for()
    ref0 = attend_xla(q, k, v, None, None, pos, cfg0)
    out0 = flash_decode(q[:, 0], k, v, None, None, lengths=pos[:, 0] + 1,
                        window=jnp.int32(0), interpret=True)
    np.testing.assert_allclose(np.asarray(out0).reshape(ref0.shape),
                               np.asarray(ref0), atol=2e-2, rtol=2e-2)


def test_flash_decode_window_int8_kv():
    """sliding window + int8 KV together (DMA-elision clamp interplay)."""
    q, k, v, pos = mk_case(length=400)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    cfg = cfg_for(sliding_window=160)
    ref = attend_xla(q, kq, vq, ks, vs, pos, cfg)
    out = flash_decode(q[:, 0], kq, vq, ks, vs, lengths=pos[:, 0] + 1,
                       window=160, blk_s=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out).reshape(ref.shape),
                               np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_flash_prefill_int8_kv():
    """int8-KV prefill kernel vs the int8 oracle (BASELINE config 2)."""
    from neural_tpu.ops.attention import flash_prefill
    B, Hq, Hkv, Dh, S, T, start = 2, 8, 4, 128, 512, 128, 57
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((B, T, Hq, Dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32))
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    positions = start + jnp.arange(T)[None, :].astype(jnp.int32) \
        * jnp.ones((B, 1), jnp.int32)
    cfg = cfg_for(Hkv=Hkv)
    ref = attend_xla(q, kq, vq, ks, vs, positions, cfg)
    out = flash_prefill(q, kq, vq, ks, vs,
                        starts=jnp.full((B,), start, jnp.int32),
                        blk_t=128, blk_s=256, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out).reshape(ref.shape), np.asarray(ref),
        atol=5e-2, rtol=5e-2)


def test_flash_prefill_alibi():
    from neural_tpu.ops.attention import flash_prefill
    from neural_tpu.ops.rope import alibi_slopes
    B, Hq, Hkv, Dh, S, T = 2, 8, 8, 128, 512, 256
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((B, T, Hq, Dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, Dh)), jnp.bfloat16)
    slopes = alibi_slopes(Hq)
    positions = jnp.arange(T)[None, :].astype(jnp.int32) \
        * jnp.ones((B, 1), jnp.int32)
    cfg = cfg_for(Hkv=Hkv, use_alibi=True, rope_style="none")
    ref = attend_xla(q, k, v, None, None, positions, cfg, slopes=slopes)
    out = flash_prefill(q, k, v, starts=jnp.zeros((B,), jnp.int32),
                        slopes=slopes, blk_t=128, blk_s=256, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out).reshape(ref.shape), np.asarray(ref),
        atol=3e-2, rtol=3e-2)


def test_attend_dispatch_alibi_sliding_pallas():
    """attend() must route ALiBi decode + per-layer traced sliding through
    the Pallas kernel (interpret mode) and match the XLA reference."""
    from neural_tpu.ops.rope import alibi_slopes
    q, k, v, pos = mk_case(Hq=8, Hkv=8, length=300)
    q = q  # [B, 1, Hq, Dh]
    slopes = alibi_slopes(8)
    cfg = cfg_for(Hkv=8, use_alibi=True, rope_style="none")
    ref = attend(q, k, v, None, None, pos, cfg, slopes=slopes, force="xla")
    out = attend(q, k, v, None, None, pos, cfg, slopes=slopes,
                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)

    # per-layer sliding: traced flag True/False vs static equivalents
    for flag in (True, False):
        cfg_s = cfg_for(sliding_window=128)
        sliding = jnp.asarray(flag)
        ref = attend(q, k, v, None, None, pos, cfg_s, sliding=sliding,
                     force="xla")
        out = attend(q, k, v, None, None, pos, cfg_s, sliding=sliding,
                     interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-2, rtol=2e-2)
