"""Beam search vs HuggingFace golden (reference beam_search_flow analog)."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from neural_tpu.convert import from_hf_model
from neural_tpu.runtime.beam import beam_search


def tiny_llama(eos=2):
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=352,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=256, eos_token_id=eos, pad_token_id=0)
    torch.manual_seed(7)
    return transformers.LlamaForCausalLM(cfg).eval()


def test_beam_matches_hf():
    m = tiny_llama()
    params, cfg = from_hf_model(m, quant=None, dtype=jnp.float32)
    prompt = [3, 17, 91, 4, 120]
    ours = beam_search(params, cfg, prompt, beam_size=4, max_new_tokens=10,
                       length_penalty=1.0)
    with torch.no_grad():
        ref = m.generate(torch.tensor([prompt]), num_beams=4,
                         max_new_tokens=10, do_sample=False,
                         length_penalty=1.0, early_stopping=True,
                         num_return_sequences=1)[0].tolist()
    # strip trailing pads the HF generate may add after eos
    got = ours[0].ids
    assert got[:len(ref)] == ref or ref[:len(got)] == got, (got, ref)


def test_beam_scores_ordered_and_beats_greedy():
    from neural_tpu.runtime import greedy_generate, batch_logits
    m = tiny_llama(eos=999 % 256)  # eos unlikely early
    params, cfg = from_hf_model(m, quant=None, dtype=jnp.float32)
    prompt = [5, 9, 2]
    hyps = beam_search(params, cfg, prompt, beam_size=4, max_new_tokens=6)
    assert all(hyps[i].score >= hyps[i + 1].score
               for i in range(len(hyps) - 1))

    # beam-1 == greedy
    h1 = beam_search(params, cfg, prompt, beam_size=1, max_new_tokens=6)
    g = greedy_generate(params, cfg, prompt, max_new_tokens=6,
                        stop_at_eos=False)
    assert h1[0].ids == g


def test_min_new_tokens():
    m = tiny_llama()
    params, cfg = from_hf_model(m, quant=None, dtype=jnp.float32)
    hyps = beam_search(params, cfg, [3, 4], beam_size=2, max_new_tokens=8,
                       min_new_tokens=5)
    for h in hyps:
        new = h.ids[2:]
        if cfg.eos_token_id in new:
            assert new.index(cfg.eos_token_id) >= 4
