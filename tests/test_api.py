"""Top-level Model API + checkpoint + tokenizer tests."""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import neural_tpu as nt


def tiny():
    torch.manual_seed(0)
    return transformers.LlamaForCausalLM(transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=352,
        num_hidden_layers=2, num_attention_heads=8,
        num_key_value_heads=4)).eval()


def test_model_api_generate_and_call():
    m = nt.Model().init_from_hf_model(tiny(), weight_dtype=None,
                                      dtype="float32")
    out = m.generate([[3, 17, 91]], max_new_tokens=5, stop_at_eos=False)
    assert len(out) == 1 and len(out[0]) == 8
    logits = m([[3, 17, 91]])
    assert logits.shape == (1, 3, 256)
    # beams + sampling + streaming paths
    b = m.generate([3, 17, 91], max_new_tokens=4, num_beams=2)
    assert len(b[0]) >= 4
    s = m.generate([3, 17, 91], max_new_tokens=4, do_sample=True, seed=1,
                   stop_at_eos=False)
    assert len(s[0]) == 7


def test_checkpoint_roundtrip(tmp_path):
    from neural_tpu.convert.checkpoint import save_checkpoint, load_checkpoint
    m = nt.Model().init_from_hf_model(tiny(), weight_dtype="q4_0",
                                      dtype="float32")
    ref = m.generate([[5, 6, 7]], max_new_tokens=5, stop_at_eos=False)[0]
    p = str(tmp_path / "m.ntpu")
    m.save(p)
    m2 = nt.Model().init_from_bin(p)
    assert m2.cfg == m.cfg
    out = m2.generate([[5, 6, 7]], max_new_tokens=5, stop_at_eos=False)[0]
    assert out == ref


def test_session_save_restore(tmp_path):
    from neural_tpu.convert.checkpoint import save_session, load_session
    from neural_tpu.runtime import init_cache, model_step
    m = nt.Model().init_from_hf_model(tiny(), weight_dtype=None,
                                      dtype="float32")
    cache = init_cache(m.cfg, 1, 32)
    toks = jnp.asarray([[3, 17, 91]], jnp.int32)
    logits, cache = model_step(m.params, toks, jnp.zeros((1,), jnp.int32),
                               cache, m.cfg)
    p = str(tmp_path / "sess.ntpu")
    save_session(p, cache, [3], extra={"prompt": [3, 17, 91]})
    cache2, lengths, extra = load_session(p)
    assert extra["prompt"] == [3, 17, 91] and lengths[0] == 3
    # continue decode from the restored session == from the live cache
    nxt = jnp.asarray([[int(np.argmax(np.asarray(logits)[0, -1]))]], jnp.int32)
    l1, _ = model_step(m.params, nxt, jnp.asarray([3], jnp.int32), cache, m.cfg)
    l2, _ = model_step(m.params, nxt, jnp.asarray([3], jnp.int32), cache2, m.cfg)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_spm_tokenizer_roundtrip():
    from neural_tpu.tokenizer import SPMTokenizer
    # tiny vocab with merge scores + byte fallback
    tokens = ["<unk>", "<s>", "</s>", "▁", "▁he", "llo", "▁hello", "l", "o",
              "he", "▁wor", "ld", "▁world"] + [f"<0x{b:02X}>" for b in range(256)]
    scores = [0, 0, 0, -1, -2, -3, -1.5, -5, -5, -4, -2, -3, -1.8] + [-100.0]*256
    tok = SPMTokenizer(tokens, scores, bos_id=1, eos_id=2)
    ids = tok.encode("hello world")
    assert ids[0] == 1
    assert tok.decode(ids) == "hello world"
    # byte fallback for unknown chars
    ids2 = tok.encode("héllo")
    assert tok.decode(ids2) == "héllo"


def test_wav_reader_roundtrip(tmp_path):
    import wave
    from neural_tpu.utils import read_wav, load_audio_16k
    path = str(tmp_path / "t.wav")
    sr = 8000
    t = np.arange(sr) / sr
    sig = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr)
        w.writeframes(sig.tobytes())
    x, got_sr = read_wav(path)
    assert got_sr == sr and x.shape == (sr, 1)
    assert abs(float(np.abs(x).max()) - 0.5) < 0.01
    a16 = load_audio_16k(path)
    assert len(a16) == 16000  # resampled 1s
    # dominant frequency preserved
    spec = np.abs(np.fft.rfft(a16))
    assert abs(int(np.argmax(spec)) - 440) <= 2


def test_verbose_timings(capsys, monkeypatch):
    monkeypatch.setenv("NEURAL_TPU_VERBOSE", "1")
    m = nt.Model().init_from_hf_model(tiny(), weight_dtype=None,
                                      dtype="float32")
    m.generate([[3, 5]], max_new_tokens=3, stop_at_eos=False)
    out = capsys.readouterr().out
    assert "neural-tpu timings" in out and "decode" in out


def test_quant_config_from_args():
    from neural_tpu.api import quant_config_from_args
    c = quant_config_from_args("int4", "asym", 128, "bf16", "int8")
    assert (c.bits, c.sym, c.group_size, c.scale_dtype, c.act_bits) == \
        (4, False, 128, "bf16", 8)
    c = quant_config_from_args("int8", "sym", -1, "fp32", "bf16")
    assert (c.bits, c.group_size, c.act_bits) == (8, -1, 16)
    assert quant_config_from_args("nf4").kind == "nf4"
    assert quant_config_from_args("q4_0") is nt.PRESETS["q4_0"]
    assert quant_config_from_args(None) is None
    assert quant_config_from_args("int4", use_ggml=True) is nt.PRESETS["q4_0"]
    with pytest.raises(ValueError):
        quant_config_from_args("int9000")


def test_generate_hooks_streamer_stopping_interactive():
    m = nt.Model().init_from_hf_model(tiny(), weight_dtype=None,
                                      dtype="float32")
    ref = m.generate([[3, 17, 91]], max_new_tokens=6, stop_at_eos=False)[0]

    class Stream:
        def __init__(self):
            self.toks, self.ended = [], False

        def put(self, ids):
            self.toks.extend(np.asarray(ids).reshape(-1).tolist())

        def end(self):
            self.ended = True

    st = Stream()
    out = m.generate([[3, 17, 91]], max_new_tokens=6, stop_at_eos=False,
                     streamer=st)[0]
    assert out == ref and st.toks == ref and st.ended

    # stopping_criteria fires after 2 new tokens
    stop = lambda ids, scores: ids.shape[1] >= 3 + 2
    out = m.generate([[3, 17, 91]], max_new_tokens=6, stop_at_eos=False,
                     stopping_criteria=stop)[0]
    assert out == ref[:5] and m.is_token_end()

    # interactive: two rounds == one long round; round 2 returns only new ids
    r1 = m.generate([[3, 17, 91]], max_new_tokens=3, stop_at_eos=False,
                    interactive=True, max_len=64)[0]
    assert r1 == ref[:6]
    r2 = m.generate([[r1[-1] + 0]], max_new_tokens=0, stop_at_eos=False,
                    interactive=True, max_len=64)
    m.reset_kv_cache()
    assert m._session is None

    # ignore_prompt strips the prompt
    out = m.generate([[3, 17, 91]], max_new_tokens=4, stop_at_eos=False,
                     ignore_prompt=True)[0]
    assert out == ref[3:7]


def test_interactive_multi_round_matches_single():
    m = nt.Model().init_from_hf_model(tiny(), weight_dtype=None,
                                      dtype="float32")
    one = m.generate([[3, 17, 91, 4, 7]], max_new_tokens=4,
                     stop_at_eos=False)[0]
    m.reset_kv_cache()
    r1 = m.generate([[3, 17, 91]], max_new_tokens=0, interactive=True,
                    stop_at_eos=False, max_len=64)
    r2 = m.generate([[4, 7]], max_new_tokens=4, interactive=True,
                    stop_at_eos=False, max_len=64)[0]
    assert r2 == one[5:]


def test_quant_model_file_to_file(tmp_path):
    m = nt.Model().init_from_hf_model(tiny(), weight_dtype="q4_0",
                                      dtype="float32")
    p1 = str(tmp_path / "a.ntpu")
    m.save(p1)
    p2 = str(tmp_path / "b.ntpu")
    nt.Model.quant_model(p1, p2, weight_dtype="int8", alg="sym",
                         group_size=32, compute_dtype="bf16")
    m2 = nt.Model().init_from_bin(p2)
    from neural_tpu.core.qtensor import QTensor
    import jax
    qts = [l for l in jax.tree.leaves(
        m2.params, is_leaf=lambda x: isinstance(x, QTensor))
        if isinstance(l, QTensor)]
    assert qts and all(q.cfg.bits == 8 for q in qts)
    out = m2.generate([[5, 6, 7]], max_new_tokens=4, stop_at_eos=False)[0]
    assert len(out) == 7


def test_bpe_tokenizer_matches_hf_gpt2():
    """Byte-level BPE vs the HF GPT2Tokenizer oracle on a constructed
    vocab (pretokenizer + merge order + byte fallback must all agree)."""
    import json
    import tempfile
    import os
    from neural_tpu.tokenizer import BPETokenizer, _bytes_to_unicode

    merges = ["h e", "l l", "he ll", "hell o", "w o", "r l", "wo rl",
              "worl d", "Ġ hello", "Ġ world", "1 2", "12 3", "a n",
              "an d", "Ġ and", "Ċ Ċ", "! !"]
    vocab = [c for _, c in sorted(_bytes_to_unicode().items())]
    for m in merges:
        a, b = m.split(" ")
        vocab.append(a + b)
    with tempfile.TemporaryDirectory() as d:
        vf, mf = os.path.join(d, "vocab.json"), os.path.join(d, "merges.txt")
        with open(vf, "w") as f:
            json.dump({t: i for i, t in enumerate(vocab)}, f)
        with open(mf, "w") as f:
            f.write("#version: 0.2\n" + "\n".join(merges) + "\n")
        from transformers import GPT2Tokenizer
        hf = GPT2Tokenizer(vf, mf)

    tok = BPETokenizer(vocab, merges)
    cases = ["hello world", "  hello   world!!", "don't we'll you've",
             "hello123 and 456", "tab\there\n\nnewlines  ",
             "naïve café ☕ ok", "trailing space ", " ", "",
             "MixedCASE Words", "a b"]  # nbsp
    for s in cases:
        got = tok.encode(s)
        want = hf.encode(s)
        assert got == want, (s, got, want,
                             [hf.convert_ids_to_tokens(want)])
        assert tok.decode(got) == s or s == ""  # byte-exact roundtrip


def test_tokenizer_from_gguf_dispatch():
    from neural_tpu.tokenizer import (tokenizer_from_gguf, BPETokenizer,
                                      SPMTokenizer)

    class FakeReader:
        def __init__(self, kv):
            self.kv = kv

    base = {"tokenizer.ggml.tokens": ["a", "b"],
            "tokenizer.ggml.merges": ["a b"]}
    assert isinstance(
        tokenizer_from_gguf(FakeReader({**base, "tokenizer.ggml.model":
                                        "gpt2"})), BPETokenizer)
    assert isinstance(
        tokenizer_from_gguf(FakeReader({**base, "tokenizer.ggml.model":
                                        "llama"})), SPMTokenizer)
    assert isinstance(tokenizer_from_gguf(FakeReader(base)), SPMTokenizer)


def test_session_file_prefix_reuse(tmp_path, small_model=None):
    """Prompt-keyed session files (reference CLI --session): a rerun with
    the same prompt and an extended prompt must both match fresh runs."""
    import jax.numpy as jnp
    import neural_tpu as nt
    from neural_tpu.convert import init_random
    from neural_tpu.models.config import ModelConfig

    cfg = ModelConfig(arch="llama", vocab_size=96, hidden_size=64,
                      n_layers=2, n_heads=4, n_kv_heads=4, head_dim=16,
                      intermediate_size=128, max_seq_len=64,
                      eos_token_id=999)
    m = nt.Model()
    m.params, m.cfg = init_random(cfg, dtype=jnp.float32), cfg

    prompt = [3, 14, 15, 9, 2]
    sess = str(tmp_path / "s.ntpus")
    fresh = m.generate(prompt, max_new_tokens=6, max_len=64,
                       repetition_penalty=1.0)[0]
    got1 = m.generate(prompt, max_new_tokens=6, max_len=64,
                      repetition_penalty=1.0, session_file=sess)[0]
    assert got1 == fresh
    import os
    assert os.path.exists(sess)
    # identical prompt: full-prefix reuse
    got2 = m.generate(prompt, max_new_tokens=6, max_len=64,
                      repetition_penalty=1.0, session_file=sess)[0]
    assert got2 == fresh
    # extended prompt: partial-prefix reuse must equal a fresh run
    longer = prompt + [7, 7, 1]
    fresh_l = m.generate(longer, max_new_tokens=6, max_len=64,
                         repetition_penalty=1.0)[0]
    got3 = m.generate(longer, max_new_tokens=6, max_len=64,
                      repetition_penalty=1.0, session_file=sess)[0]
    assert got3 == fresh_l
    # divergent prompt: no reuse, still correct
    other = [9, 9, 9]
    fresh_o = m.generate(other, max_new_tokens=6, max_len=64,
                         repetition_penalty=1.0)[0]
    got4 = m.generate(other, max_new_tokens=6, max_len=64,
                      repetition_penalty=1.0, session_file=sess)[0]
    assert got4 == fresh_o


def test_batched_generate_matches_rowwise():
    """Batched ragged generate (one padded prefill + one on-device decode
    loop) must produce the same greedy ids as the row-wise loop, with
    correct de-padding per row."""
    m = nt.Model().init_from_hf_model(tiny(), weight_dtype=None,
                                      dtype="float32")
    prompts = [[3, 17, 91], [5, 6], [9, 1, 2, 44, 7]]
    ref = [m.generate([p], max_new_tokens=6, stop_at_eos=False)[0]
           for p in prompts]
    got = m.generate(prompts, max_new_tokens=6, stop_at_eos=False)
    assert got == [r[0] for r in zip(ref)] or got == ref
    # ignore_prompt de-pads correctly
    got_np = m.generate(prompts, max_new_tokens=6, stop_at_eos=False,
                        ignore_prompt=True)
    assert got_np == [r[len(p):] for r, p in zip(ref, prompts)]
    # sampled batched path: right shapes, deterministic under a seed
    s1 = m.generate(prompts, max_new_tokens=5, do_sample=True, seed=7,
                    stop_at_eos=False)
    s2 = m.generate(prompts, max_new_tokens=5, do_sample=True, seed=7,
                    stop_at_eos=False)
    assert s1 == s2
    assert [len(s) for s in s1] == [len(p) + 5 for p in prompts]


def test_batched_generate_eos_truncation():
    """Rows that hit EOS stop at it; others run to max_new_tokens."""
    import jax.numpy as jnp
    from neural_tpu.convert import init_random
    from neural_tpu.models.config import ModelConfig
    cfg = ModelConfig(arch="llama", vocab_size=64, hidden_size=64,
                      n_layers=2, n_heads=4, n_kv_heads=4, head_dim=16,
                      intermediate_size=128, max_seq_len=64,
                      eos_token_id=0)
    m = nt.Model()
    m.params, m.cfg = init_random(cfg, dtype=jnp.float32), cfg
    prompts = [[3, 14, 15], [9, 2, 6, 5]]
    ref = [m.generate([p], max_new_tokens=8, repetition_penalty=1.0)[0]
           for p in prompts]
    got = m.generate(prompts, max_new_tokens=8, repetition_penalty=1.0)
    assert got == ref


def test_call_ragged_padding():
    m = nt.Model().init_from_hf_model(tiny(), weight_dtype=None,
                                      dtype="float32")
    rows = [[3, 17, 91], [5, 6]]
    logits = m(rows)
    assert logits.shape == (2, 3, 256)
    # row 1's valid positions match its solo eval
    solo = m([[5, 6]])
    np.testing.assert_allclose(logits[1, :2], solo[0], atol=2e-4)


def test_full_state_session_resume_equals_continuous(tmp_path):
    """Resumed sampled generation == uninterrupted run, bit-for-bit: the
    session snapshot carries logits + sampler RNG + mirostat state
    (reference full-state serialize, model_utils.cpp:1551-1773)."""
    m = nt.Model().init_from_hf_model(tiny(), weight_dtype=None,
                                      dtype="float32")
    prompt = [3, 17, 91, 5]
    kw = dict(max_new_tokens=8, do_sample=True, temperature=0.9, seed=7,
              stop_at_eos=False, max_len=32)

    # continuous run (session_file forces the hooked path; file is fresh
    # so round 1 prefices + saves)
    p1 = str(tmp_path / "a.ntpu")
    cont = m.generate([prompt], session_file=p1, **kw)[0]

    # resume: same prompt, fresh generate — full prompt match restores
    # logits/key/mu and skips re-eval entirely
    resumed = m.generate([prompt], session_file=p1, **kw)[0]
    assert resumed == cont

    # the snapshot carries the full state fields
    from neural_tpu.convert.checkpoint import load_session
    _, _, extra = load_session(p1)
    assert "logits" in extra and "rng_key" in extra and "sampler_mu" in extra
