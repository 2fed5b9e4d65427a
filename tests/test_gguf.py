"""GGUF reader/writer/loader tests (spec: reference gguf.h)."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from neural_tpu.convert.gguf import (
    GGUFReader, GGUFWriter, GGML_F32, GGML_F16, GGML_Q4_0, _pack_q4_0, QK)
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
