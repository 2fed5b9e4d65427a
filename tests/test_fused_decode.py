"""Decode-step elementwise fusion (qmatmul_fused + the _block fast path).

The fused path folds RMS-norm prologues, the gated activation and the
residual adds into the weight-streaming Pallas kernels (reference analog:
the BesTLA prologue/epilogue chain, bestla_prologue_a.h /
bestla_epilogue.h). These tests run the kernels in interpreter mode on CPU
against the standalone-op composition.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_tpu.core import PRESETS, QuantConfig
from neural_tpu.core.qtensor import quantize, to_native
from neural_tpu.ops.qmatmul import qmatmul_fused, qmatmul_xla
from neural_tpu.ops.norms import rms_norm


def _mk(key, K, N, cfg):
    w = jax.random.normal(key, (K, N), jnp.float32) * 0.05
    return to_native(quantize(w, cfg))


def test_fused_rms_matches_composed():
    key = jax.random.PRNGKey(0)
    qt = _mk(key, 256, 128, PRESETS["q4_0"])
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 256), jnp.bfloat16)
    nw = jax.random.normal(jax.random.PRNGKey(2), (256,), jnp.float32)
    got = qmatmul_fused(x, qt, out_dtype=jnp.float32,
                        norm=(nw, 1e-5, 0.0), interpret=True)
    assert got is not None
    h = rms_norm(x, nw, 1e-5)
    want = qmatmul_xla(h.astype(jnp.bfloat16), qt, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_fused_rms_offset_gemma_style():
    qt = _mk(jax.random.PRNGKey(0), 256, 128, PRESETS["q4_0"])
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 256), jnp.bfloat16)
    nw = jnp.full((256,), 0.5, jnp.float32)
    got = qmatmul_fused(x, qt, out_dtype=jnp.float32,
                        norm=(nw, 1e-6, 1.0), interpret=True)
    h = rms_norm(x, nw, 1e-6, offset=1.0)
    want = qmatmul_xla(h.astype(jnp.bfloat16), qt, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_fused_glu_res_matches_composed():
    qt = _mk(jax.random.PRNGKey(0), 256, 128, PRESETS["q4_0"])
    g = jax.random.normal(jax.random.PRNGKey(1), (1, 256), jnp.bfloat16)
    u = jax.random.normal(jax.random.PRNGKey(2), (1, 256), jnp.bfloat16)
    res = jax.random.normal(jax.random.PRNGKey(3), (1, 128), jnp.bfloat16)
    got = qmatmul_fused((g, u), qt, out_dtype=jnp.bfloat16, glu="silu",
                        res=res, interpret=True)
    assert got is not None
    # reference composition with f32 activation math (the kernel's path)
    gf, uf = g.astype(jnp.float32), u.astype(jnp.float32)
    h = (gf * jax.nn.sigmoid(gf) * uf).astype(jnp.bfloat16)
    want = qmatmul_xla(h, qt, jnp.bfloat16) + res
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("K,g", [(1152, 128), (320, 32)])
def test_m1_remainder_groups(K, g):
    """K not divisible by 8*g: the m1 kernel's trailing short chunk
    (llama w_down at group 128 hits this: K=11008, G=86)."""
    cfg = QuantConfig(bits=4, group_size=g, sym=True)
    qt = _mk(jax.random.PRNGKey(0), K, 128, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, K), jnp.bfloat16)
    got = qmatmul_fused(x, qt, out_dtype=jnp.float32, interpret=True)
    assert got is not None
    want = qmatmul_xla(x, qt, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_fused_batch_rows():
    """M>1 (batched serving decode) goes through the grouped-partial path
    with the same fusions."""
    qt = _mk(jax.random.PRNGKey(0), 256, 128, PRESETS["q4_0"])
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 256), jnp.bfloat16)
    nw = jnp.ones((256,), jnp.float32)
    res = jax.random.normal(jax.random.PRNGKey(2), (4, 128), jnp.bfloat16)
    got = qmatmul_fused(x, qt, out_dtype=jnp.bfloat16,
                        norm=(nw, 1e-5, 0.0), res=res, interpret=True)
    assert got is not None
    h = rms_norm(x, nw, 1e-5).astype(jnp.bfloat16)
    want = (qmatmul_xla(h, qt, jnp.bfloat16) + res)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=5e-2, atol=5e-2)


def test_fused_rejects_asym_and_perm():
    qt = _mk(jax.random.PRNGKey(0), 256, 128, PRESETS["q4_1"])  # asym
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 256), jnp.bfloat16)
    assert qmatmul_fused(x, qt, interpret=True) is None


def test_block_fused_matches_general(monkeypatch):
    """Whole-model decode step: fused fast path vs the general graph."""
    from neural_tpu.models.config import ModelConfig
    from neural_tpu.models.transformer import forward
    from neural_tpu.runtime import init_cache
    from neural_tpu.convert.hf import _shape_for, _add_aux

    cfg = ModelConfig(arch="llama", vocab_size=256, hidden_size=128,
                      n_layers=2, n_heads=4, n_kv_heads=2, head_dim=32,
                      intermediate_size=256, norm_eps=1e-5,
                      rope_theta=10000.0, max_seq_len=64)
    key = jax.random.PRNGKey(0)
    qcfg = PRESETS["q4_0"]
    layers = {}
    names = ["wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"]
    per = {n: [] for n in names}
    for _ in range(cfg.n_layers):
        for n in names:
            key, k2 = jax.random.split(key)
            K, N = _shape_for(n, cfg)
            per[n].append(to_native(quantize(
                jax.random.normal(k2, (K, N), jnp.float32) * 0.05, qcfg)))
    for n in names:
        layers[n] = jax.tree.map(lambda *xs: jnp.stack(xs), *per[n])
    layers["attn_norm_w"] = jnp.ones((cfg.n_layers, cfg.hidden_size),
                                     jnp.float32)
    layers["ffn_norm_w"] = jnp.ones((cfg.n_layers, cfg.hidden_size),
                                    jnp.float32)
    key, k2, k3 = jax.random.split(key, 3)
    params = {
        "layers": layers,
        "embed": jax.random.normal(k2, (cfg.vocab_size, cfg.hidden_size),
                                   jnp.bfloat16) * 0.1,
        "final_norm_w": jnp.ones((cfg.hidden_size,), jnp.float32),
        "lm_head": to_native(quantize(
            jax.random.normal(k3, (cfg.hidden_size, cfg.vocab_size),
                              jnp.float32) * 0.05, qcfg)),
    }
    _add_aux(params, cfg)

    tok = jnp.array([[7]], jnp.int32)
    pos = jnp.array([5], jnp.int32)

    def run():
        cache = init_cache(cfg, 1, 64, jnp.bfloat16)
        logits, _ = forward(params, tok, pos, cache, cfg)
        return np.asarray(logits)

    monkeypatch.setenv("NTPU_FUSED_DECODE", "0")
    want = run()
    monkeypatch.setenv("NTPU_FUSED_DECODE", "interpret")
    got = run()
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)
    assert int(np.argmax(got)) == int(np.argmax(want))
