"""End-to-end golden tests vs HuggingFace PyTorch.

Mirrors the reference test strategy (tests/test_python_api.py:26-80): fp32
greedy ids must MATCH the HF output exactly; quantized logits compared by
cosine similarity. Uses tiny random-weight models built locally (no network).
"""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from neural_tpu.convert import from_hf_model
from neural_tpu.runtime import greedy_generate, batch_logits
from neural_tpu.models.config import ModelConfig


def tiny_llama(n_kv_heads=4, vocab=256, tie=False):
    cfg = transformers.LlamaConfig(
        vocab_size=vocab, hidden_size=128, intermediate_size=352,
        num_hidden_layers=3, num_attention_heads=8,
        num_key_value_heads=n_kv_heads, max_position_embeddings=512,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=tie,
    )
    torch.manual_seed(0)
    return transformers.LlamaForCausalLM(cfg).eval()


@pytest.fixture(scope="module")
def model():
    return tiny_llama()


def hf_greedy(model, prompt, n_new):
    import torch as t
    ids = t.tensor([prompt])
    with t.no_grad():
        out = model.generate(ids, max_new_tokens=n_new, do_sample=False,
                             use_cache=True)
    return out[0].tolist()


def test_fp_logits_match(model):
    params, cfg = from_hf_model(model, quant=None, dtype=jnp.float32)
    prompt = np.array([[3, 17, 91, 4, 120, 5, 9, 33]], np.int32)
    ours = np.asarray(batch_logits(params, cfg, prompt))[0]
    with torch.no_grad():
        theirs = model(torch.tensor(prompt.tolist())).logits[0].numpy()
    # bf16-free fp32 path: should agree tightly
    cos = np.sum(ours * theirs, -1) / (
        np.linalg.norm(ours, axis=-1) * np.linalg.norm(theirs, axis=-1))
    assert cos.min() > 0.9999, cos
    np.testing.assert_allclose(ours, theirs, atol=2e-2, rtol=2e-2)


def test_fp_greedy_ids_match(model):
    params, cfg = from_hf_model(model, quant=None, dtype=jnp.float32)
    prompt = [3, 17, 91, 4, 120, 5, 9, 33]
    ours = greedy_generate(params, cfg, prompt, max_new_tokens=12,
                           stop_at_eos=False)
    theirs = hf_greedy(model, prompt, 12)
    assert ours == theirs


def test_gqa_and_mqa_logits():
    for kv in (2, 1):
        m = tiny_llama(n_kv_heads=kv)
        params, cfg = from_hf_model(m, quant=None, dtype=jnp.float32)
        prompt = np.array([[5, 8, 2, 250, 19]], np.int32)
        ours = np.asarray(batch_logits(params, cfg, prompt))[0]
        with torch.no_grad():
            theirs = m(torch.tensor(prompt.tolist())).logits[0].numpy()
        np.testing.assert_allclose(ours, theirs, atol=3e-2, rtol=3e-2)


def test_int4_logits_close(model):
    params, cfg = from_hf_model(model, quant="q4_0", dtype=jnp.float32)
    prompt = np.array([[3, 17, 91, 4, 120, 5, 9, 33]], np.int32)
    ours = np.asarray(batch_logits(params, cfg, prompt))[0]
    with torch.no_grad():
        theirs = model(torch.tensor(prompt.tolist())).logits[0].numpy()
    cos = np.sum(ours * theirs, -1) / (
        np.linalg.norm(ours, axis=-1) * np.linalg.norm(theirs, axis=-1) + 1e-9)
    # reference gate: int4 cosine vs fp32 (test_python_api.py:66-80)
    assert cos.min() > 0.96, cos.min()


def test_tied_embeddings():
    m = tiny_llama(tie=True)
    params, cfg = from_hf_model(m, quant=None, dtype=jnp.float32)
    assert "lm_head" not in params
    prompt = np.array([[1, 2, 3, 4]], np.int32)
    ours = np.asarray(batch_logits(params, cfg, prompt))[0]
    with torch.no_grad():
        theirs = m(torch.tensor(prompt.tolist())).logits[0].numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-2, rtol=3e-2)


def test_batched_decode_matches_single():
    m = tiny_llama()
    params, cfg = from_hf_model(m, quant=None, dtype=jnp.float32)
    p1 = [3, 17, 91, 4]
    out1 = greedy_generate(params, cfg, p1, max_new_tokens=6, stop_at_eos=False)
    out2 = greedy_generate(params, cfg, p1, max_new_tokens=6, stop_at_eos=False)
    assert out1 == out2


def test_fused_qkv_gateup_matches_unfused(model):
    """fuse_layer_weights must be numerically identical (same kernels, one
    concatenated N dimension)."""
    from neural_tpu.runtime.generate import fuse_layer_weights
    params, cfg = from_hf_model(model, quant="q4_0")
    prompt = np.array([[3, 17, 91, 4, 120, 5, 9, 33]], np.int32)
    ref = np.asarray(batch_logits(params, cfg, prompt))
    fused = fuse_layer_weights(params, cfg)
    lp = fused["layers"]
    assert "wqkv" in lp and "w_gateup" in lp and "wq" not in lp
    out = np.asarray(batch_logits(fused, cfg, prompt))
    np.testing.assert_array_equal(out, ref)
    # greedy decode path too
    a = greedy_generate(params, cfg, [3, 17, 91], max_new_tokens=6,
                        stop_at_eos=False)
    b = greedy_generate(fused, cfg, [3, 17, 91], max_new_tokens=6,
                        stop_at_eos=False)
    assert a == b


def test_ffn_padding_exact():
    """Odd intermediate sizes pad to the kernel lane tile (convert/hf.py
    ffn_padded_size); zero cols/rows must be numerically invisible."""
    import transformers as tr
    from neural_tpu.convert.hf import ffn_padded_size
    assert ffn_padded_size(11008) == 11264
    assert ffn_padded_size(352) == 352      # >5% overhead: skipped
    assert ffn_padded_size(4096) == 4096

    cfg = tr.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=1000,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4)
    torch.manual_seed(0)
    hf = tr.LlamaForCausalLM(cfg).eval()
    params, mcfg = from_hf_model(hf, quant="q8_0")
    assert params["layers"]["w_gate"].N == 1024
    assert params["layers"]["w_down"].K == 1024
    prompt = np.array([[3, 17, 91, 4, 120, 5, 9, 33]], np.int32)
    ours = np.asarray(batch_logits(params, mcfg, prompt))[0]
    with torch.no_grad():
        theirs = hf(torch.tensor(prompt.tolist())).logits[0].numpy()
    cos = np.sum(ours * theirs, -1) / (
        np.linalg.norm(ours, axis=-1) * np.linalg.norm(theirs, axis=-1))
    assert cos.min() > 0.999, cos.min()
