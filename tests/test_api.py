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
