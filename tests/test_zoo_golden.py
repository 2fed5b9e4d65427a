"""Model-zoo golden tests: every family's tiny random HF model vs ours.

The reference's per-arch C++ graphs each got hand-tested against HF
(tests/test_python_api.py); here one parameterized test covers the zoo:
fp32 logits must match HF torch closely and greedy ids must match exactly.
"""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from neural_tpu.convert import from_hf_model
from neural_tpu.runtime import batch_logits, greedy_generate

TINY = dict(vocab=256, layers=2)


def _mk(cls, cfg):
    torch.manual_seed(0)
    return cls(cfg).eval()


def build(arch):
    t = transformers
    if arch == "gptj":
        return _mk(t.GPTJForCausalLM, t.GPTJConfig(
            vocab_size=256, n_embd=128, n_layer=2, n_head=8, n_positions=256,
            rotary_dim=8))
    if arch == "gpt_neox":
        return _mk(t.GPTNeoXForCausalLM, t.GPTNeoXConfig(
            vocab_size=256, hidden_size=128, num_hidden_layers=2,
            num_attention_heads=8, intermediate_size=256, rotary_pct=0.25,
            max_position_embeddings=256, use_parallel_residual=True))
    if arch == "gpt_neox_seq":
        return _mk(t.GPTNeoXForCausalLM, t.GPTNeoXConfig(
            vocab_size=256, hidden_size=128, num_hidden_layers=2,
            num_attention_heads=8, intermediate_size=256, rotary_pct=1.0,
            max_position_embeddings=256, use_parallel_residual=False))
    if arch == "opt":
        return _mk(t.OPTForCausalLM, t.OPTConfig(
            vocab_size=256, hidden_size=128, num_hidden_layers=2,
            num_attention_heads=8, ffn_dim=256,
            max_position_embeddings=256, activation_function="relu"))
    if arch == "bloom":
        return _mk(t.BloomForCausalLM, t.BloomConfig(
            vocab_size=256, hidden_size=128, n_layer=2, n_head=8))
    if arch == "mpt":
        return _mk(t.MptForCausalLM, t.MptConfig(
            vocab_size=256, d_model=128, n_layers=2, n_heads=8,
            max_seq_len=256, attn_config={"alibi": True}))
    if arch == "falcon":
        return _mk(t.FalconForCausalLM, t.FalconConfig(
            vocab_size=256, hidden_size=128, num_hidden_layers=2,
            num_attention_heads=8, multi_query=True, parallel_attn=True,
            bias=False, new_decoder_architecture=False, alibi=False))
    if arch == "falcon_new":
        return _mk(t.FalconForCausalLM, t.FalconConfig(
            vocab_size=256, hidden_size=128, num_hidden_layers=2,
            num_attention_heads=8, num_kv_heads=2, multi_query=False,
            parallel_attn=True, bias=False, new_decoder_architecture=True,
            alibi=False))
    if arch == "gpt_bigcode":
        return _mk(t.GPTBigCodeForCausalLM, t.GPTBigCodeConfig(
            vocab_size=256, n_embd=128, n_layer=2, n_head=8,
            n_positions=256, multi_query=True,
            activation_function="gelu_pytorch_tanh"))
    if arch == "qwen2":
        return _mk(t.Qwen2ForCausalLM, t.Qwen2Config(
            vocab_size=256, hidden_size=128, num_hidden_layers=2,
            num_attention_heads=8, num_key_value_heads=4,
            intermediate_size=256, max_position_embeddings=256))
    if arch == "phi":
        return _mk(t.PhiForCausalLM, t.PhiConfig(
            vocab_size=256, hidden_size=128, num_hidden_layers=2,
            num_attention_heads=8, intermediate_size=256,
            partial_rotary_factor=0.5, max_position_embeddings=256))
    if arch == "phi3":
        return _mk(t.Phi3ForCausalLM, t.Phi3Config(
            vocab_size=256, hidden_size=128, num_hidden_layers=2,
            num_attention_heads=8, num_key_value_heads=4,
            intermediate_size=256, max_position_embeddings=256,
            pad_token_id=0))
    if arch == "gemma":
        return _mk(t.GemmaForCausalLM, t.GemmaConfig(
            vocab_size=256, hidden_size=128, num_hidden_layers=2,
            num_attention_heads=8, num_key_value_heads=4, head_dim=32,
            intermediate_size=256, max_position_embeddings=256))
    if arch == "gemma2":
        return _mk(t.Gemma2ForCausalLM, t.Gemma2Config(
            vocab_size=256, hidden_size=128, num_hidden_layers=2,
            num_attention_heads=8, num_key_value_heads=4, head_dim=32,
            intermediate_size=256, max_position_embeddings=256,
            attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
            query_pre_attn_scalar=32, sliding_window=8))
    if arch == "stablelm":
        return _mk(t.StableLmForCausalLM, t.StableLmConfig(
            vocab_size=256, hidden_size=128, num_hidden_layers=2,
            num_attention_heads=8, num_key_value_heads=8,
            intermediate_size=256, partial_rotary_factor=0.25,
            max_position_embeddings=256))
    raise ValueError(arch)


ARCHS = ["gptj", "gpt_neox", "gpt_neox_seq", "opt", "bloom", "mpt",
         "falcon", "falcon_new", "gpt_bigcode", "qwen2", "phi", "phi3",
         "gemma", "gemma2", "stablelm"]


@pytest.mark.parametrize("arch", ARCHS)
def test_logits_match_hf(arch):
    model = build(arch)
    params, cfg = from_hf_model(model, quant=None, dtype=jnp.float32)
    prompt = np.array([[3, 17, 91, 4, 120, 5, 9, 33]], np.int32)
    ours = np.asarray(batch_logits(params, cfg, prompt))[0]
    with torch.no_grad():
        theirs = model(torch.tensor(prompt.tolist())).logits[0].numpy()
    cos = np.sum(ours * theirs, -1) / (
        np.linalg.norm(ours, axis=-1) * np.linalg.norm(theirs, axis=-1)
        + 1e-9)
    assert cos.min() > 0.999, (arch, cos)
    np.testing.assert_allclose(ours, theirs, atol=0.12, rtol=0.05)


@pytest.mark.parametrize("arch", ["gptj", "bloom", "falcon", "gemma2",
                                  "phi", "gpt_bigcode"])
def test_greedy_ids_match_hf(arch):
    model = build(arch)
    params, cfg = from_hf_model(model, quant=None, dtype=jnp.float32)
    prompt = [3, 17, 91, 4, 120]
    ours = greedy_generate(params, cfg, prompt, max_new_tokens=8,
                           stop_at_eos=False)
    with torch.no_grad():
        ref = model.generate(torch.tensor([prompt]), max_new_tokens=8,
                             do_sample=False, use_cache=True)[0].tolist()
    assert ours == ref, (arch, ours, ref)


def test_mixtral_moe_logits_match_hf():
    """MoE vs HF, exercising BOTH expert strategies: T=8 routes through the
    megablocks-style grouped ragged_dot path, T=4 (B·T < 8) through the
    dense-mixture path (models/transformer.py _moe_mlp)."""
    cfg_hf = transformers.MixtralConfig(
        vocab_size=256, hidden_size=128, intermediate_size=192,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=256)
    torch.manual_seed(0)
    model = transformers.MixtralForCausalLM(cfg_hf).eval()
    params, cfg = from_hf_model(model, quant=None, dtype=jnp.float32)
    for prompt in (np.array([[3, 17, 91, 4, 120, 5, 9, 33]], np.int32),
                   np.array([[3, 17, 91, 4]], np.int32)):
        ours = np.asarray(batch_logits(params, cfg, prompt))[0]
        with torch.no_grad():
            theirs = model(torch.tensor(prompt.tolist())).logits[0].numpy()
        cos = np.sum(ours * theirs, -1) / (
            np.linalg.norm(ours, axis=-1) * np.linalg.norm(theirs, axis=-1)
            + 1e-9)
        assert cos.min() > 0.999, (prompt.shape, cos)
        np.testing.assert_allclose(ours, theirs, atol=0.12, rtol=0.05)
