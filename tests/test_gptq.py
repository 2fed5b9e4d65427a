"""GPTQ/AWQ import tests: synthetic checkpoints packed per the published
conventions, imported and compared against an independent dequant oracle
(reference analog: convert_quantized_llama.py unpack-repack)."""
import numpy as np
import pytest

import jax.numpy as jnp

from neural_tpu.convert.gptq import (
    gptq_layer_to_qtensor, gptq_reference_dequant, unpack_int32_nibbles,
    AWQ_ORDER, params_from_gptq_state_dict)
from neural_tpu.core.qtensor import dequantize
from neural_tpu.core import matmul_ref
from neural_tpu.ops import qmatmul


def pack_nibbles(codes: np.ndarray, axis: int,
                 order: np.ndarray = None) -> np.ndarray:
    """Inverse of unpack_int32_nibbles (test-side packer)."""
    c = np.moveaxis(codes.astype(np.uint32), axis, 0)
    A = c.shape[0]
    c = c.reshape(A // 8, 8, *c.shape[1:])
    shifts = np.arange(8, dtype=np.uint32) * 4
    if order is not None:
        shifts = shifts[np.argsort(order)]
    word = np.zeros((A // 8, *c.shape[2:]), np.uint32)
    for j in range(8):
        word |= c[:, j] << shifts[j]
    return np.moveaxis(word, 0, axis).view(np.int32)


def synth(K=128, N=64, g=32, seed=0, act_order=False, fmt="gptq"):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 16, (K, N)).astype(np.uint8)
    G = K // g
    scales = (rng.random((G, N)).astype(np.float32) * 0.05 + 0.01)
    zeros = rng.integers(1, 15, (G, N)).astype(np.uint8)
    g_idx = None
    if act_order:
        perm_inv = rng.permutation(K)
        g_idx = (perm_inv // g).astype(np.int32)
        rng.shuffle(g_idx)  # arbitrary assignment with equal-size groups?
        # ensure equal group sizes: construct from a permutation properly
        g_idx = np.empty(K, np.int32)
        g_idx[rng.permutation(K)] = np.arange(K) // g
    if fmt == "gptq":
        qweight = pack_nibbles(codes, axis=0)
        qzeros = pack_nibbles((zeros.astype(np.int32) - 1).astype(np.uint8),
                              axis=1)
    else:
        qweight = pack_nibbles(codes, axis=1, order=AWQ_ORDER)
        qzeros = pack_nibbles(zeros, axis=1, order=AWQ_ORDER)
    return qweight, qzeros, scales, g_idx


@pytest.mark.parametrize("axis", [0, 1])
def test_nibble_roundtrip(axis):
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 16, (64, 32)).astype(np.uint8)
    w = pack_nibbles(codes, axis=axis)
    out = unpack_int32_nibbles(w, axis=axis)
    np.testing.assert_array_equal(out, codes)


def test_awq_order_roundtrip():
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 16, (16, 64)).astype(np.uint8)
    w = pack_nibbles(codes, axis=1, order=AWQ_ORDER)
    out = unpack_int32_nibbles(w, axis=1, order=AWQ_ORDER)
    np.testing.assert_array_equal(out, codes)


@pytest.mark.parametrize("fmt", ["gptq", "awq"])
def test_import_matches_oracle(fmt):
    qw, qz, sc, gi = synth(fmt=fmt)
    qt = gptq_layer_to_qtensor(qw, qz, sc, gi, fmt=fmt,
                               zero_plus_one=(fmt == "gptq"))
    ref = gptq_reference_dequant(qw, qz, sc, gi, fmt=fmt,
                                 zero_plus_one=(fmt == "gptq"))
    got = np.asarray(dequantize(qt))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_act_order_import():
    qw, qz, sc, gi = synth(act_order=True)
    qt = gptq_layer_to_qtensor(qw, qz, sc, gi)
    assert qt.perm is not None
    ref = gptq_reference_dequant(qw, qz, sc, gi)
    got = np.asarray(dequantize(qt))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    # matmul path with perm
    x = np.random.default_rng(3).standard_normal((4, 128)).astype(np.float32)
    out = np.asarray(qmatmul(jnp.asarray(x), qt, out_dtype=jnp.float32,
                             force="xla"))
    np.testing.assert_allclose(out, x @ ref, rtol=2e-2, atol=2e-2)


def test_full_model_import():
    """Synthetic GPTQ llama checkpoint → params → generation runs."""
    from neural_tpu.models.config import ModelConfig
    from neural_tpu.runtime import greedy_generate
    cfg = ModelConfig(arch="llama", vocab_size=128, hidden_size=64,
                      n_layers=2, n_heads=4, n_kv_heads=4, head_dim=16,
                      intermediate_size=96, max_seq_len=64, eos_token_id=999)
    rng = np.random.default_rng(0)
    sd = {}
    suffix_map = {
        "self_attn.q_proj": "wq", "self_attn.k_proj": "wk",
        "self_attn.v_proj": "wv", "self_attn.o_proj": "wo",
        "mlp.gate_proj": "w_gate", "mlp.up_proj": "w_up",
        "mlp.down_proj": "w_down",
    }
    shapes = {"wq": (64, 64), "wk": (64, 64), "wv": (64, 64), "wo": (64, 64),
              "w_gate": (64, 96), "w_up": (64, 96), "w_down": (96, 64)}
    for i in range(2):
        p = f"model.layers.{i}."
        for suffix, ours in suffix_map.items():
            K, N = shapes[ours]
            qw, qz, sc, _ = synth(K=K, N=N, seed=i * 10 + hash(ours) % 7)
            sd[p + suffix + ".qweight"] = qw
            sd[p + suffix + ".qzeros"] = qz
            sd[p + suffix + ".scales"] = sc
        sd[p + "input_layernorm.weight"] = np.ones(64, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(64, np.float32)
    sd["model.embed_tokens.weight"] = rng.standard_normal(
        (128, 64)).astype(np.float32) * 0.02
    sd["model.norm.weight"] = np.ones(64, np.float32)
    sd["lm_head.weight"] = rng.standard_normal((128, 64)).astype(
        np.float32) * 0.02
    params = params_from_gptq_state_dict(sd, cfg, dtype=jnp.float32)
    out = greedy_generate(params, cfg, [3, 5], max_new_tokens=4,
                          stop_at_eos=False)
    assert len(out) == 6


def test_fold_act_order_exact():
    """Folding w_down's act-order perm into gate/up output columns is an
    exact rewrite of the MLP function (sd-level fold — the production
    path in params_from_gptq_state_dict)."""
    import jax
    from neural_tpu.convert.gptq import _fold_act_order_sd
    from neural_tpu.core import QuantConfig, quantize, matmul_ref
    from neural_tpu.core.qtensor import QTensor
    from neural_tpu.models.config import ModelConfig
    from neural_tpu.models import llama as llama_mod

    rng = np.random.default_rng(0)
    D, I = 64, 128
    cfgq = QuantConfig(bits=4, group_size=32, sym=False)
    wg = rng.standard_normal((D, I)).astype(np.float32) * .1
    wu = rng.standard_normal((D, I)).astype(np.float32) * .1
    wd = rng.standard_normal((I, D)).astype(np.float32) * .1
    perm = rng.permutation(I).astype(np.int32)

    q = lambda w: quantize(jnp.asarray(w), cfgq)
    qd_store = q(wd[perm])          # GPTQ stores rows in act order
    qd = QTensor(qd_store.planes, qd_store.scales, qd_store.zeros,
                 jnp.asarray(perm), qd_store.cfg)
    cfg = ModelConfig(arch="llama", hidden_size=D, intermediate_size=I,
                      n_layers=1)
    m = llama_mod.hf_layer_map(0, cfg)
    qsd = {m["w_gate"][0]: q(wg), m["w_up"][0]: q(wu), m["w_down"][0]: qd}

    x = jnp.asarray(rng.standard_normal((4, D)).astype(np.float32))

    def mlp(sd):
        h = jax.nn.silu(matmul_ref(x, sd[m["w_gate"][0]])) \
            * matmul_ref(x, sd[m["w_up"][0]])
        return np.asarray(matmul_ref(h, sd[m["w_down"][0]]))

    ref = mlp(qsd)
    _fold_act_order_sd(qsd, cfg, llama_mod)
    assert qsd[m["w_down"][0]].perm is None
    np.testing.assert_allclose(mlp(qsd), ref, rtol=1e-5, atol=1e-5)


def test_concat_n_shared_perm():
    """Equal-perm QTensors fuse along N; the fused matmul (one shared
    activation gather) must match the per-tensor results exactly."""
    import jax.numpy as jnp
    from neural_tpu.core.dtypes import PRESETS
    from neural_tpu.core.qtensor import QTensor, quantize, concat_n, matmul_ref
    rng = np.random.default_rng(11)
    K = 256
    perm = jnp.asarray(rng.permutation(K).astype(np.int32))
    qts = []
    for i in range(3):
        w = rng.standard_normal((K, 128)).astype(np.float32)
        qt = quantize(jnp.asarray(w)[perm], PRESETS["q4_0"])
        qts.append(QTensor(qt.planes, qt.scales, qt.zeros, perm, qt.cfg))
    fused = concat_n(qts)
    assert fused.perm is not None and fused.N == 3 * 128
    x = jnp.asarray(rng.standard_normal((4, K)).astype(np.float32))
    got = np.asarray(matmul_ref(x, fused))
    want = np.concatenate([np.asarray(matmul_ref(x, q)) for q in qts], -1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fuse_layer_weights_act_order():
    import jax
    """fuse_layer_weights fuses equal-perm act-order projections and the
    fused forward matches the unfused one."""
    import jax.numpy as jnp
    from neural_tpu.core.dtypes import PRESETS
    from neural_tpu.core.qtensor import QTensor, quantize
    from neural_tpu.models.config import ModelConfig
    from neural_tpu.runtime.generate import fuse_layer_weights
    from neural_tpu.runtime import init_cache, model_step
    from neural_tpu.convert import init_random

    cfg = ModelConfig(arch="llama", vocab_size=64, hidden_size=128,
                      n_layers=2, n_heads=4, n_kv_heads=4, head_dim=32,
                      intermediate_size=256, max_seq_len=64)
    params = init_random(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(5)

    def q_with_perm(w, perm):
        qt = quantize(jnp.asarray(np.asarray(w, np.float32))[perm],
                      PRESETS["q4_1"])
        return QTensor(qt.planes, qt.scales, qt.zeros,
                       jnp.asarray(perm), qt.cfg)

    layers = dict(params["layers"])
    L = layers["wq"].shape[0]
    perm_qkv = np.stack([rng.permutation(128) for _ in range(L)])
    perm_gu = np.stack([rng.permutation(128) for _ in range(L)])
    for name, perms in (("wq", perm_qkv), ("wk", perm_qkv),
                        ("wv", perm_qkv), ("w_gate", perm_gu),
                        ("w_up", perm_gu)):
        per = [q_with_perm(layers[name][l], perms[l]) for l in range(L)]
        layers[name] = jax.tree.map(lambda *xs: jnp.stack(xs), *per)
    params = dict(params, layers=layers)
    fused = fuse_layer_weights(params, cfg)
    assert "wqkv" in fused["layers"] and "w_gateup" in fused["layers"]
    assert fused["layers"]["wqkv"].perm is not None

    toks = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]], jnp.int32)
    start = jnp.zeros((1,), jnp.int32)
    l0, _ = model_step(params, toks, start, init_cache(cfg, 1, 32), cfg)
    l1, _ = model_step(fused, toks, start, init_cache(cfg, 1, 32), cfg)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                               rtol=2e-2, atol=2e-2)


def pack_fields(codes: np.ndarray, bits: int, axis: int) -> np.ndarray:
    """Test-side AutoGPTQ packer for bits in {2, 3, 4, 8} — transcribed
    independently from the published pack() loop (LSB-first words; 3-bit
    straddles two values across word boundaries per 3-word group)."""
    c = np.moveaxis(codes.astype(np.uint32), axis, 0)
    K = c.shape[0]
    if bits in (2, 4, 8):
        per = 32 // bits
        c = c.reshape(K // per, per, *c.shape[1:])
        word = np.zeros((K // per, *c.shape[2:]), np.uint32)
        for j in range(per):
            word |= c[:, j] << (bits * j)
        return np.moveaxis(word, 0, axis).view(np.int32)
    assert bits == 3
    assert K % 32 == 0
    c = c.reshape(K // 32, 32, *c.shape[2:] if c.ndim > 2 else c.shape[1:])
    w = np.zeros((K // 32, 3, *c.shape[2:]), np.uint32)
    for j in range(10):
        w[:, 0] |= c[:, j] << (3 * j)
    w[:, 0] |= (c[:, 10] & 3) << 30
    w[:, 1] |= c[:, 10] >> 2
    for j in range(10):
        w[:, 1] |= c[:, 11 + j] << (3 * j + 1)
    w[:, 1] |= (c[:, 21] & 1) << 31
    w[:, 2] |= c[:, 21] >> 1
    for j in range(10):
        w[:, 2] |= c[:, 22 + j] << (3 * j + 2)
    w = w.reshape(K // 32 * 3, *c.shape[2:])
    return np.moveaxis(w, 0, axis).view(np.int32)


@pytest.mark.parametrize("bits", [2, 3, 8])
@pytest.mark.parametrize("axis", [0, 1])
def test_field_roundtrip_odd_bits(bits, axis):
    from neural_tpu.convert.gptq import unpack_int32_fields
    rng = np.random.default_rng(bits * 10 + axis)
    shape = (96, 64) if axis == 0 else (64, 96)
    codes = rng.integers(0, 1 << bits, shape).astype(np.uint8)
    w = pack_fields(codes, bits, axis=axis)
    out = unpack_int32_fields(w, bits, axis=axis)
    np.testing.assert_array_equal(out, codes)


@pytest.mark.parametrize("bits", [2, 3, 8])
@pytest.mark.parametrize("act_order", [False, True])
def test_import_odd_bits_matches_oracle(bits, act_order):
    """2/3/8-bit GPTQ layers (reference quant framework widths,
    quant_config.h:21-143) import to QTensors whose dequant matches the
    published GPTQ formula; matmul agrees with the fp oracle."""
    rng = np.random.default_rng(bits)
    K, N, g = 96, 64, 32
    codes = rng.integers(0, 1 << bits, (K, N)).astype(np.uint8)
    G = K // g
    scales = (rng.random((G, N)).astype(np.float32) * 0.05 + 0.01)
    zeros = rng.integers(1, (1 << bits) - 1 or 1, (G, N)).astype(np.uint8)
    g_idx = None
    if act_order:
        g_idx = np.empty(K, np.int32)
        g_idx[rng.permutation(K)] = np.arange(K) // g
    qw = pack_fields(codes, bits, axis=0)
    qz = pack_fields((zeros.astype(np.int32) - 1).astype(np.uint8), bits,
                     axis=1)
    qt = gptq_layer_to_qtensor(qw, qz, scales, g_idx, bits=bits)
    ref = gptq_reference_dequant(qw, qz, scales, g_idx, bits=bits)
    got = np.asarray(dequantize(qt))
    np.testing.assert_allclose(got, ref, atol=1e-5)

    x = rng.standard_normal((4, K)).astype(np.float32)
    out = np.asarray(qmatmul(jnp.asarray(x), qt))
    exp = x @ ref
    # bf16 matmul path: absolute error scales with Σ|x||w| (bf16 rounding
    # doesn't cancel on near-zero outputs), not with |out|
    atol = 5e-3 * float((np.abs(x) @ np.abs(ref)).mean()) + 2e-2
    np.testing.assert_allclose(out, exp, atol=atol, rtol=2e-2)


def test_import_3bit_tenper_layout():
    """The reference importer's 3-bit layout (10 values per int32 word,
    top 2 bits unused — convert/common.py unpack_gptq_weight_3bits) is
    auto-detected from the qzeros width and imports exactly."""
    from neural_tpu.convert.gptq import unpack_int32_fields

    rng = np.random.default_rng(33)
    K, N, g = 96, 64, 32
    codes = rng.integers(0, 8, (K, N)).astype(np.uint8)
    G = K // g
    scales = (rng.random((G, N)).astype(np.float32) * 0.05 + 0.01)
    zeros = rng.integers(1, 7, (G, N)).astype(np.uint8)

    def pack_tenper(vals, axis):
        v = np.moveaxis(vals.astype(np.uint32), axis, 0)
        n = v.shape[0]
        words = -(-n // 10)
        v = np.concatenate(
            [v, np.zeros((words * 10 - n, *v.shape[1:]), np.uint32)])
        v = v.reshape(words, 10, *v.shape[1:])
        w = np.zeros((words, *v.shape[2:]), np.uint32)
        for j in range(10):
            w |= v[:, j] << (3 * j)
        return np.moveaxis(w, 0, axis).view(np.int32)

    qw = pack_tenper(codes, axis=0)
    qz = pack_tenper((zeros.astype(np.int32) - 1).astype(np.uint8), axis=1)
    assert qw.shape == (10, N) and qz.shape == (G, -(-N // 10))

    # unpack round-trips with truncation
    got = unpack_int32_fields(qw, 3, axis=0, fmt3="tenper", out_len=K)
    np.testing.assert_array_equal(got, codes)

    # full import via the auto-sniffed path (group_size supplies K)
    qt = gptq_layer_to_qtensor(qw, qz, scales, None, bits=3, group_size=g)
    exp = (codes.astype(np.float32)
           - np.repeat(zeros, g, axis=0).astype(np.float32)) \
        * np.repeat(scales, g, axis=0)
    np.testing.assert_allclose(np.asarray(dequantize(qt)), exp, atol=1e-5)
