"""GGUF reader/writer/loader tests (spec: reference gguf.h)."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from neural_tpu.convert.gguf import (
    GGUFReader, GGUFWriter, GGML_F32, GGML_F16, GGML_Q4_0, GGML_Q4_1,
    GGML_Q5_0, GGML_Q5_1, GGML_Q8_0, _pack_q4_0, QK)
from neural_tpu.convert.gguf_models import load_gguf, export_gguf
from neural_tpu.convert import from_hf_model
from neural_tpu.core.qtensor import dequantize
from neural_tpu.runtime import batch_logits, greedy_generate


def tiny_llama():
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=352,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=256)
    torch.manual_seed(0)
    return transformers.LlamaForCausalLM(cfg).eval()


def test_writer_reader_roundtrip(tmp_path):
    p = str(tmp_path / "t.gguf")
    w = GGUFWriter(p)
    w.add_kv("general.architecture", "llama")
    w.add_kv("llama.block_count", 2)
    w.add_kv("f", 1.5)
    w.add_kv("tokens", ["a", "bb", "ccc"])
    w.add_kv("arr", np.asarray([1, 2, 3], np.int32))
    rng = np.random.default_rng(0)
    a = rng.standard_normal((8, 64)).astype(np.float32)
    b = rng.standard_normal((4, 32)).astype(np.float32)
    w.add_tensor("a", a, GGML_F32)
    w.add_tensor("bf16", b, GGML_F16)
    w.add_tensor("aq", a, GGML_Q4_0)
    w.write()

    r = GGUFReader(p)
    assert r.kv["general.architecture"] == "llama"
    assert r.kv["llama.block_count"] == 2
    assert r.kv["f"] == 1.5
    assert r.kv["tokens"] == ["a", "bb", "ccc"]
    np.testing.assert_array_equal(r.kv["arr"], [1, 2, 3])
    np.testing.assert_array_equal(r.dequantize("a"), a)
    np.testing.assert_allclose(r.dequantize("bf16"), b, atol=1e-3)
    # q4_0 roundtrip error bounded by one step
    wq = r.dequantize("aq")
    scales = np.abs(a.reshape(-1, QK)).max(1) / 8
    assert np.all(np.abs(wq - a).reshape(-1, QK) <= scales[:, None] + 1e-6)
    r.close()


def test_export_load_f32_exact(tmp_path):
    m = tiny_llama()
    p = str(tmp_path / "m.gguf")
    export_gguf(m, p, ggml_type=GGML_F32)
    params, cfg = load_gguf(p, dtype=jnp.float32)
    prompt = np.asarray([[3, 17, 91, 4, 120]], np.int32)
    ours = np.asarray(batch_logits(params, cfg, prompt))[0]
    with torch.no_grad():
        ref = m(torch.tensor(prompt.tolist())).logits[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-2, rtol=3e-2)


def test_export_load_q4_0_lossless_repack(tmp_path):
    """QTensor re-pack must dequantize bit-identically to the GGUF reader's
    own dequantization (llama.cpp numerics)."""
    m = tiny_llama()
    p = str(tmp_path / "m4.gguf")
    export_gguf(m, p, ggml_type=GGML_Q4_0)
    r = GGUFReader(p)
    from neural_tpu.convert.gguf_models import _qtensor_from_gguf
    name = "blk.0.attn_q.weight"
    qt = _qtensor_from_gguf(r, name)
    ref = r.dequantize(name).T     # [K, N]
    got = np.asarray(dequantize(qt))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)
    r.close()

    params, cfg = load_gguf(p, dtype=jnp.float32)
    out = greedy_generate(params, cfg, [3, 7, 9], max_new_tokens=5,
                          stop_at_eos=False)
    assert len(out) == 8


# ---------------------------------------------------------------------------
# K-quants (Q2_K..Q6_K). Scalar oracles below are independent per-element
# loops written directly from the ggml block spec (reference
# data_types.h:120-144, vectors/cpu/quantize.h:956 dequantize_row_q6_K);
# the reader's vectorized unpack must match them bit-exactly.
# ---------------------------------------------------------------------------

from neural_tpu.convert.gguf import (
    GGML_Q2_K, GGML_Q3_K, GGML_Q4_K, GGML_Q5_K, GGML_Q6_K,
    _BLOCK_BYTES, _pack_q4_k, _pack_q6_k, QK_K)


def _get_scale_min_k4(j, q):
    if j < 4:
        return int(q[j]) & 63, int(q[j + 4]) & 63
    d = (int(q[j + 4]) & 0xF) | ((int(q[j - 4]) >> 6) << 4)
    m = (int(q[j + 4]) >> 4) | ((int(q[j]) >> 6) << 4)
    return d, m


def _f16(b):
    return float(np.frombuffer(bytes(b[:2]), np.float16)[0])


def _deq_q4k_scalar(blk):
    d, dmin = _f16(blk[0:2]), _f16(blk[2:4])
    sb, qs = blk[4:16], blk[16:144]
    y = np.zeros(QK_K, np.float32)
    isb, qoff = 0, 0
    for j in range(0, QK_K, 64):
        sc1, m1 = _get_scale_min_k4(isb + 0, sb)
        sc2, m2 = _get_scale_min_k4(isb + 1, sb)
        for l in range(32):
            y[j + l] = d * sc1 * (int(qs[qoff + l]) & 0xF) - dmin * m1
            y[j + 32 + l] = d * sc2 * (int(qs[qoff + l]) >> 4) - dmin * m2
        isb += 2
        qoff += 32
    return y


def _deq_q5k_scalar(blk):
    d, dmin = _f16(blk[0:2]), _f16(blk[2:4])
    sb, qh, qs = blk[4:16], blk[16:48], blk[48:176]
    y = np.zeros(QK_K, np.float32)
    isb, qoff, u1, u2 = 0, 0, 1, 2
    for j in range(0, QK_K, 64):
        sc1, m1 = _get_scale_min_k4(isb + 0, sb)
        sc2, m2 = _get_scale_min_k4(isb + 1, sb)
        for l in range(32):
            h1 = 16 if int(qh[l]) & u1 else 0
            h2 = 16 if int(qh[l]) & u2 else 0
            y[j + l] = d * sc1 * ((int(qs[qoff + l]) & 0xF) + h1) - dmin * m1
            y[j + 32 + l] = d * sc2 * ((int(qs[qoff + l]) >> 4) + h2) \
                - dmin * m2
        isb += 2
        qoff += 32
        u1 <<= 2
        u2 <<= 2
    return y


def _deq_q6k_scalar(blk):
    ql, qh = blk[:128], blk[128:192]
    sc = np.frombuffer(bytes(blk[192:208]), np.int8)
    d = _f16(blk[208:210])
    y = np.zeros(QK_K, np.float32)
    for n in range(0, QK_K, 128):
        lo, ho, so = n // 2, n // 4, n // 16
        for l in range(32):
            i16 = l // 16
            q1 = ((int(ql[lo + l]) & 0xF) | (((int(qh[ho + l]) >> 0) & 3) << 4)) - 32
            q2 = ((int(ql[lo + l + 32]) & 0xF) | (((int(qh[ho + l]) >> 2) & 3) << 4)) - 32
            q3 = ((int(ql[lo + l]) >> 4) | (((int(qh[ho + l]) >> 4) & 3) << 4)) - 32
            q4 = ((int(ql[lo + l + 32]) >> 4) | (((int(qh[ho + l]) >> 6) & 3) << 4)) - 32
            y[n + l] = d * int(sc[so + i16]) * q1
            y[n + l + 32] = d * int(sc[so + i16 + 2]) * q2
            y[n + l + 64] = d * int(sc[so + i16 + 4]) * q3
            y[n + l + 96] = d * int(sc[so + i16 + 6]) * q4
    return y


def _deq_q2k_scalar(blk):
    sb, qs = blk[:16], blk[16:80]
    d, dmin = _f16(blk[80:82]), _f16(blk[82:84])
    y = np.zeros(QK_K, np.float32)
    yo, isb, qoff = 0, 0, 0
    for n in range(0, QK_K, 128):
        shift = 0
        for j in range(4):
            sc = int(sb[isb]); isb += 1
            dl, ml = d * (sc & 0xF), dmin * (sc >> 4)
            for l in range(16):
                y[yo] = dl * ((int(qs[qoff + l]) >> shift) & 3) - ml
                yo += 1
            sc = int(sb[isb]); isb += 1
            dl, ml = d * (sc & 0xF), dmin * (sc >> 4)
            for l in range(16, 32):
                y[yo] = dl * ((int(qs[qoff + l]) >> shift) & 3) - ml
                yo += 1
            shift += 2
        qoff += 32
    return y


def _deq_q3k_scalar(blk):
    hm, qs, sb = blk[:32], blk[32:96], blk[96:108]
    d = _f16(blk[108:110])
    # 16 six-bit signed scales via the kmask shuffle
    aux = np.frombuffer(bytes(sb), np.uint32).copy()
    tmp = int(aux[2])
    a = [0, 0, 0, 0]
    a[0] = (int(aux[0]) & 0x0f0f0f0f) | (((tmp >> 0) & 0x03030303) << 4)
    a[1] = (int(aux[1]) & 0x0f0f0f0f) | (((tmp >> 2) & 0x03030303) << 4)
    a[2] = ((int(aux[0]) >> 4) & 0x0f0f0f0f) | (((tmp >> 4) & 0x03030303) << 4)
    a[3] = ((int(aux[1]) >> 4) & 0x0f0f0f0f) | (((tmp >> 6) & 0x03030303) << 4)
    scales = np.frombuffer(np.asarray(a, np.uint32).tobytes(), np.int8)
    y = np.zeros(QK_K, np.float32)
    yo, isb, qoff, m = 0, 0, 0, 1
    for n in range(0, QK_K, 128):
        shift = 0
        for j in range(4):
            dl = d * (int(scales[isb]) - 32); isb += 1
            for l in range(16):
                q = ((int(qs[qoff + l]) >> shift) & 3) \
                    - (0 if int(hm[l]) & m else 4)
                y[yo] = dl * q; yo += 1
            dl = d * (int(scales[isb]) - 32); isb += 1
            for l in range(16, 32):
                q = ((int(qs[qoff + l]) >> shift) & 3) \
                    - (0 if int(hm[l]) & m else 4)
                y[yo] = dl * q; yo += 1
            shift += 2
            m <<= 1
        qoff += 32
    return y


_SCALAR_ORACLES = {GGML_Q2_K: _deq_q2k_scalar, GGML_Q3_K: _deq_q3k_scalar,
                   GGML_Q4_K: _deq_q4k_scalar, GGML_Q5_K: _deq_q5k_scalar,
                   GGML_Q6_K: _deq_q6k_scalar}


def _random_kquant_blocks(tt, nb, rng):
    """Random block bytes with sane fp16 scale fields (no inf/nan)."""
    blk = rng.integers(0, 256, (nb, _BLOCK_BYTES[tt]), dtype=np.uint8)
    scl = rng.uniform(0.001, 0.1, (nb,)).astype(np.float16)
    if tt in (GGML_Q4_K, GGML_Q5_K):
        blk[:, 0:2] = scl.reshape(-1, 1).view(np.uint8)
        blk[:, 2:4] = rng.uniform(0.001, 0.1, (nb,)).astype(
            np.float16).reshape(-1, 1).view(np.uint8)
    elif tt == GGML_Q6_K:
        blk[:, 208:210] = scl.reshape(-1, 1).view(np.uint8)
    elif tt == GGML_Q2_K:
        blk[:, 80:82] = scl.reshape(-1, 1).view(np.uint8)
        blk[:, 82:84] = rng.uniform(0.001, 0.1, (nb,)).astype(
            np.float16).reshape(-1, 1).view(np.uint8)
    elif tt == GGML_Q3_K:
        blk[:, 108:110] = scl.reshape(-1, 1).view(np.uint8)
    return blk


@pytest.mark.parametrize("tt", [GGML_Q2_K, GGML_Q3_K, GGML_Q4_K,
                                GGML_Q5_K, GGML_Q6_K])
def test_kquant_reader_matches_scalar_oracle(tt, tmp_path):
    rng = np.random.default_rng(int(tt))
    out_f, in_f = 4, 512
    nb = out_f * in_f // QK_K
    blk = _random_kquant_blocks(tt, nb, rng)

    p = str(tmp_path / "k.gguf")
    w = GGUFWriter(p)
    w.add_kv("general.architecture", "llama")
    w.add_tensor_raw("t", (out_f, in_f), tt, blk.tobytes())
    w.write()
    r = GGUFReader(p)
    got = r.dequantize("t").reshape(-1)
    ref = np.concatenate([_SCALAR_ORACLES[tt](blk[i]) for i in range(nb)])
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)
    r.close()


@pytest.mark.parametrize("tt", [GGML_Q2_K, GGML_Q3_K, GGML_Q4_K,
                                GGML_Q5_K, GGML_Q6_K])
def test_kquant_qtensor_lossless_repack(tt, tmp_path):
    """GGUF K-quant blocks → QTensor must dequantize to the same values."""
    rng = np.random.default_rng(100 + int(tt))
    out_f, in_f = 8, 512
    nb = out_f * in_f // QK_K
    blk = _random_kquant_blocks(tt, nb, rng)
    p = str(tmp_path / "k.gguf")
    w = GGUFWriter(p)
    w.add_kv("general.architecture", "llama")
    w.add_tensor_raw("t", (out_f, in_f), tt, blk.tobytes())
    w.write()
    r = GGUFReader(p)
    from neural_tpu.convert.gguf_models import _qtensor_from_gguf
    qt = _qtensor_from_gguf(r, "t")
    ref = r.dequantize("t").T          # [K, N]
    got = np.asarray(dequantize(qt))
    # sym types repack exactly; asym float-zero roundtrip (z = -m/s) costs
    # one rounding step
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    r.close()


@pytest.mark.parametrize("tt", [GGML_Q2_K, GGML_Q3_K, GGML_Q4_K, GGML_Q5_K,
                                GGML_Q6_K])
def test_kquant_write_read_roundtrip(tt, tmp_path):
    """Our RTN K-quant encoders (now the FULL set the reference's
    model_quantize_special emits, quant_utils.h:39): reconstruction error
    bounded by one quantization step per group."""
    rng = np.random.default_rng(7)
    a = rng.standard_normal((8, 512)).astype(np.float32) * 0.05
    p = str(tmp_path / "w.gguf")
    w = GGUFWriter(p)
    w.add_kv("general.architecture", "llama")
    w.add_tensor("t", a, tt)
    w.write()
    r = GGUFReader(p)
    got = r.dequantize("t")
    g = {GGML_Q2_K: 16, GGML_Q3_K: 16, GGML_Q4_K: 32, GGML_Q5_K: 32,
         GGML_Q6_K: 16}[tt]
    levels = {GGML_Q2_K: 3, GGML_Q3_K: 7, GGML_Q4_K: 15, GGML_Q5_K: 31,
              GGML_Q6_K: 62}[tt]
    steps = (a.reshape(-1, g).max(1) - a.reshape(-1, g).min(1)) / levels
    err = np.abs(got - a).reshape(-1, g)
    # one quantization step per group, plus sub-scale rounding slack
    assert np.all(err <= steps[:, None] * 1.2 + 1e-5), err.max()
    r.close()


@pytest.mark.parametrize("tt", [GGML_Q2_K, GGML_Q3_K, GGML_Q5_K])
def test_kquant_write_exact_code_roundtrip(tt, tmp_path):
    """Bit-level check: writing then READING must reproduce the encoder's
    own codes/scales exactly (write→read→write is a fixed point). Catches
    packing-order bugs the error bound can't."""
    rng = np.random.default_rng(11)
    a = rng.standard_normal((4, 256)).astype(np.float32)
    p1 = str(tmp_path / "w1.gguf")
    w = GGUFWriter(p1)
    w.add_kv("general.architecture", "llama")
    w.add_tensor("t", a, tt)
    w.write()
    r = GGUFReader(p1)
    deq1 = r.dequantize("t")
    r.close()
    p2 = str(tmp_path / "w2.gguf")
    w2 = GGUFWriter(p2)
    w2.add_kv("general.architecture", "llama")
    w2.add_tensor("t", deq1, tt)      # re-encode the dequantized values
    w2.write()
    r2 = GGUFReader(p2)
    deq2 = r2.dequantize("t")
    r2.close()
    np.testing.assert_allclose(deq2, deq1, rtol=2e-3, atol=2e-3)


def test_export_load_q6_k_end_to_end(tmp_path):
    # K-quant super-blocks need in_features % 256 == 0
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=256)
    torch.manual_seed(0)
    m = transformers.LlamaForCausalLM(cfg).eval()
    p = str(tmp_path / "m6.gguf")
    export_gguf(m, p, ggml_type=GGML_Q6_K)
    params, cfg = load_gguf(p, dtype=jnp.float32)
    prompt = np.asarray([[3, 17, 91, 4, 120]], np.int32)
    ours = np.asarray(batch_logits(params, cfg, prompt))[0]
    with torch.no_grad():
        ref = m(torch.tensor(prompt.tolist())).logits[0].numpy()
    # 6.5-bit weights: logits close to fp32 reference
    cos = np.sum(ours * ref, -1) / (
        np.linalg.norm(ours, axis=-1) * np.linalg.norm(ref, axis=-1))
    assert np.all(cos > 0.99), cos


@pytest.mark.parametrize("tt", [GGML_Q4_1, GGML_Q5_0, GGML_Q5_1, GGML_Q8_0])
def test_legacy_write_read_roundtrip(tt, tmp_path):
    """Round-4 writer breadth: ALL legacy ggml formats the reference's
    model_quantize emits (quant_utils.cpp:357 ggml_quantize) write and
    read back within one quantization step per 32-block."""
    from neural_tpu.convert.gguf import GGML_Q4_1, GGML_Q5_0, GGML_Q5_1, \
        GGML_Q8_0
    rng = np.random.default_rng(tt)
    a = rng.standard_normal((8, 256)).astype(np.float32) * 0.05
    p = str(tmp_path / "w.gguf")
    w = GGUFWriter(p)
    w.add_kv("general.architecture", "llama")
    w.add_tensor("t", a, tt)
    w.write()
    r = GGUFReader(p)
    got = r.dequantize("t")
    blocks = a.reshape(-1, 32)
    if tt in (GGML_Q4_1, GGML_Q5_1):   # asym: step = range/levels
        steps = (blocks.max(1) - blocks.min(1)) / (
            15 if tt == GGML_Q4_1 else 31)
    elif tt == GGML_Q5_0:
        steps = np.abs(blocks).max(1) / 16
    else:
        steps = np.abs(blocks).max(1) / 127
    err = np.abs(got - a).reshape(-1, 32)
    # one step + fp16 scale rounding slack; sym types clip the element
    # opposite the signed max by up to a full step (ggml convention)
    assert np.all(err <= steps[:, None] * 1.05 + 2e-4), err.max()
    r.close()


def test_legacy_write_qtensor_load(tmp_path):
    """Written legacy blocks load back as QTensors whose dequant matches
    the reader's scalar dequant exactly (lossless repack both ways)."""
    from neural_tpu.convert.gguf import GGML_Q5_1
    from neural_tpu.convert.gguf_models import _qtensor_from_gguf
    from neural_tpu.core.qtensor import dequantize
    rng = np.random.default_rng(3)
    a = rng.standard_normal((64, 32)).astype(np.float32) * 0.1
    p = str(tmp_path / "w.gguf")
    w = GGUFWriter(p)
    w.add_kv("general.architecture", "llama")
    w.add_tensor("t", a, GGML_Q5_1)
    w.write()
    r = GGUFReader(p)
    ref = r.dequantize("t").reshape(64, 32)
    qt = _qtensor_from_gguf(r, "t")
    got = np.asarray(dequantize(qt))
    np.testing.assert_allclose(got, ref.T, rtol=1e-5, atol=1e-6)
    r.close()
