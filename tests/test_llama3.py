"""Llama-3 family specifics: list eos_token_id, <|eot_id|> stop set,
llama3 rope scaling, BOS ensure-prepend.

Reference behavior: neural_speed/__init__.py:158-161 (llama3 detection by
vocab 128256), :345-348 (BOS prepend), :423-434 (<|eot_id|> as stop id).
The round-4 bug: HF Llama-3-Instruct ships ``eos_token_id: [128001,
128009]`` — a list landing in the frozen ModelConfig made it unhashable as
a static jit argument, so the flagship llama3 checkpoint failed on the
first model_step.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import neural_tpu as nt
from neural_tpu.models.config import ModelConfig
from neural_tpu.models import llama
from neural_tpu.ops.rope import rope_freqs
from neural_tpu.runtime.generate import truncate_at_eos

L3_ROPE = {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
           "high_freq_factor": 4.0,
           "original_max_position_embeddings": 8192}


def tiny_llama3():
    """Llama-3-shaped tiny checkpoint: vocab 128256, LIST eos, llama3
    rope_scaling — the exact combination that broke round 4."""
    torch.manual_seed(0)
    return transformers.LlamaForCausalLM(transformers.LlamaConfig(
        vocab_size=128256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=500000.0,
        rope_scaling=dict(L3_ROPE),
        bos_token_id=128000, eos_token_id=[128001, 128009])).eval()


def test_config_normalizes_list_eos():
    import dataclasses
    cfg = ModelConfig(eos_token_id=[128001, 128009])
    assert cfg.eos_token_id == 128001          # primary stays an int
    assert cfg.eos_token_ids == (128001, 128009)
    assert hash(cfg)                            # static-jit safe
    # int stays int; stop set defaults to the singleton
    cfg2 = ModelConfig(eos_token_id=2)
    assert cfg2.eos_token_ids == (2,)
    # explicit extra ids merge without duplicates
    cfg3 = ModelConfig(eos_token_id=2, extra_eos_ids=(2, 7))
    assert cfg3.eos_token_ids == (2, 7)
    # dataclasses.replace of the primary must NOT leak the old primary
    # into the stop set (tiny test configs replace eos freely)
    cfg4 = dataclasses.replace(cfg2, eos_token_id=5)
    assert cfg4.eos_token_ids == (5,)


def test_config_from_hf_llama3_stop_set():
    hf = tiny_llama3().config
    cfg = llama.config_from_hf(hf)
    assert cfg.eos_token_id == 128001
    # <|eot_id|> present even if the checkpoint listed it already
    assert 128009 in cfg.eos_token_ids
    assert cfg.eos_token_ids == (128001, 128009)
    # base llama-3 (single int eos) still gains <|eot_id|>
    hf.eos_token_id = 128001
    assert llama.config_from_hf(hf).eos_token_ids == (128001, 128009)


def test_eot_stop_set_applies_to_every_load_path():
    """The <|eot_id|> quirk lives in ModelConfig normalization, so a
    GGUF-shaped construction (arch + single int eos, no HF loader in the
    loop) gets the stop set too — the round-5 review caught the quirk
    living only in llama.config_from_hf."""
    cfg = ModelConfig(arch="llama", vocab_size=128256, eos_token_id=128001)
    assert cfg.eos_token_ids == (128001, 128009)
    # non-llama3 vocabs are untouched
    assert ModelConfig(arch="llama", vocab_size=32000,
                       eos_token_id=2).eos_token_ids == (2,)


def test_dynamic_ntk_noop_within_trained_window():
    """HF 'dynamic' semantics: scaling activates only past the trained
    window (max_position_embeddings); serving AT the trained length must
    leave the frequencies untouched (round-5 review: a hardcoded 4096
    default wrongly scaled any model trained beyond 4096)."""
    base = rope_freqs(16, None, 10000.0)
    same = rope_freqs(16, None, 10000.0,
                      {"type": "dynamic", "factor": 2.0},
                      max_seq_len=8192)      # trained window == serving
    np.testing.assert_array_equal(base, same)
    longer = rope_freqs(16, None, 10000.0,
                        {"type": "dynamic", "factor": 2.0,
                         "original_max_position_embeddings": 4096},
                        max_seq_len=8192)    # serving 2x the window
    assert np.all(longer[1:] < base[1:])     # frequencies compressed


def test_truncate_at_eos_any_member():
    cfg = ModelConfig(eos_token_id=[5, 9])
    assert truncate_at_eos([1, 2, 9, 3], cfg) == [1, 2, 9]
    assert truncate_at_eos([1, 5, 9], cfg) == [1, 5]
    assert truncate_at_eos([1, 2, 3], cfg) == [1, 2, 3]


def test_rope_llama3_matches_hf_oracle():
    try:
        from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS
    except ImportError:
        pytest.skip("transformers too old for ROPE_INIT_FUNCTIONS")
    hf = tiny_llama3().config
    inv_ref, _ = ROPE_INIT_FUNCTIONS["llama3"](hf, device="cpu")
    inv = rope_freqs(16, None, 500000.0, dict(L3_ROPE))
    np.testing.assert_allclose(inv, np.asarray(inv_ref, np.float32),
                               rtol=1e-6)


def test_llama3_e2e_generate_serve_beam():
    m = nt.Model().init_from_hf_model(tiny_llama3(), weight_dtype=None,
                                      dtype="float32")
    # generate: jit accepts the config (the round-4 failure point), and
    # the BOS ensure-prepend fires for non-BOS-led prompts
    out = m.generate([[3, 17, 91]], max_new_tokens=4, stop_at_eos=False)
    assert out[0][0] == 128000 and len(out[0]) == 8
    led = m.generate([[128000, 3, 17]], max_new_tokens=3,
                     stop_at_eos=False)
    assert led[0][:3] == [128000, 3, 17] and led[0].count(128000) <= \
        out[0].count(128000) + 1
    # beam search
    b = m.generate([3, 17, 91], max_new_tokens=3, num_beams=2)
    assert len(b[0]) >= 3
    # serving scheduler
    from neural_tpu.serving.scheduler import Scheduler
    s = Scheduler(m.params, m.cfg, max_batch=2, max_len=64)
    s.add_request("r0", [128000, 3, 17], max_new_tokens=4)
    s.add_request("r1", [128000, 9, 1, 4], max_new_tokens=4)
    done = s.run_to_completion()
    assert {q.request_id for q in done} == {"r0", "r1"}
    for q in done:
        assert 1 <= len(q.output_ids) <= 4


def test_scheduler_stops_on_any_eos_member():
    """A sequence whose sampled token is the SECOND stop id must finish."""
    m = nt.Model().init_from_hf_model(tiny_llama3(), weight_dtype=None,
                                      dtype="float32")
    from neural_tpu.serving.scheduler import Scheduler, SeqStatus, Sequence
    s = Scheduler(m.params, m.cfg, max_batch=1, max_len=64)
    seq = Sequence("x", [1, 2], max_new_tokens=10)
    seq.slot = 0
    seq.output_ids = [128009]          # <|eot_id|>, not the primary eos
    s.lengths[0] = 3
    s.running[0] = seq
    s._maybe_finish(seq)
    assert seq.status == SeqStatus.FINISHED
