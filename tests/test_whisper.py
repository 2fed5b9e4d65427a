"""Whisper encoder-decoder golden tests vs HF torch (reference:
neural_speed/models/whisper port; here vs WhisperForConditionalGeneration)."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from neural_tpu.models.whisper import (
    params_from_hf, encode, init_decoder_state, decode_step,
    transcribe_ids, log_mel_spectrogram, mel_filterbank)


def tiny_whisper():
    cfg = transformers.WhisperConfig(
        vocab_size=200, d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128, num_mel_bins=80,
        max_source_positions=1500, max_target_positions=448,
        eos_token_id=3, decoder_start_token_id=4, pad_token_id=0,
        suppress_tokens=[], begin_suppress_tokens=[])
    torch.manual_seed(0)
    return transformers.WhisperForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def setup():
    m = tiny_whisper()
    params, cfg = params_from_hf(m)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((80, 3000)).astype(np.float32) * 0.5
    return m, params, cfg, mel


def test_encoder_matches_hf(setup):
    m, params, cfg, mel = setup
    ours = np.asarray(encode(params, jnp.asarray(mel)[None], cfg))
    with torch.no_grad():
        ref = m.model.encoder(torch.tensor(mel)[None]).last_hidden_state
    np.testing.assert_allclose(ours, ref.numpy(), atol=2e-3, rtol=1e-3)


def test_decoder_logits_match_hf(setup):
    m, params, cfg, mel = setup
    toks = [4, 7, 9, 11]
    enc = encode(params, jnp.asarray(mel)[None], cfg)
    state = init_decoder_state(params, enc, cfg)
    logits, _ = decode_step(params, jnp.asarray([toks], jnp.int32),
                            jnp.zeros((1,), jnp.int32), state, cfg)
    with torch.no_grad():
        ref = m(input_features=torch.tensor(mel)[None],
                decoder_input_ids=torch.tensor([toks])).logits[0]
    np.testing.assert_allclose(np.asarray(logits)[0], ref.numpy(),
                               atol=5e-3, rtol=1e-2)


def test_greedy_transcribe_matches_hf(setup):
    m, params, cfg, mel = setup
    ours = transcribe_ids(params, cfg, mel, [4], max_new_tokens=10)
    with torch.no_grad():
        ref = m.generate(input_features=torch.tensor(mel)[None],
                         max_new_tokens=10, do_sample=False)[0].tolist()
    # HF's output omits the decoder_start_token; ours includes the prompt
    assert ours[1:] == ref[:len(ours) - 1], (ours, ref)


def test_mel_matches_hf_feature_extractor():
    fe = transformers.WhisperFeatureExtractor(feature_size=80)
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    ref = fe(audio, sampling_rate=16000,
             return_tensors="np").input_features[0]
    ours = log_mel_spectrogram(audio, 80)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_transcribe_file_api(tmp_path):
    import wave
    import neural_tpu as nt
    m = tiny_whisper()
    api = nt.Model().init_whisper(m)
    # synthesize a wav
    sr = 16000
    t = np.arange(sr) / sr
    sig = (0.3 * np.sin(2 * np.pi * 300 * t) * 32767).astype(np.int16)
    p = str(tmp_path / "a.wav")
    with wave.open(p, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr)
        w.writeframes(sig.tobytes())
    ids = api.transcribe_file(p, prompt_ids=[4], max_new_tokens=6)
    assert ids[0] == 4 and len(ids) >= 2


def test_segments_from_tokens():
    from neural_tpu.models.whisper import segments_from_tokens
    tsb, eos = 1000, 3
    # <|0.00|> hello(5,6) <|1.00|> <|1.50|> world(7) <|2.00|> eos
    ids = [tsb, 5, 6, tsb + 50, tsb + 75, 7, tsb + 100, eos]
    segs, last = segments_from_tokens(ids, tsb, offset_s=30.0, eos=eos)
    assert segs[0] == (30.0, 31.0, [5, 6])
    assert segs[1] == (31.5, 32.0, [7])
    assert last == 2.0
    # unterminated segment closes at window end, no seek timestamp
    segs2, last2 = segments_from_tokens([tsb, 9, 8], tsb, 0.0, eos)
    assert segs2 == [(0.0, 30.0, [9, 8])]
    assert last2 is None


def test_long_form_transcribe_advances(setup):
    """45 s of audio → at least two windows; segments carry absolute
    times; the seek loop terminates (reference whisper_full seek)."""
    from neural_tpu.models.whisper import (transcribe_segments,
                                           timestamp_begin)
    m, params, cfg, _ = setup
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((80, 4500)).astype(np.float32) * 0.5
    # tiny test vocab (200) has no real whisper timestamp range → inject
    # a synthetic one (ids >= 150 are timestamps)
    segs = transcribe_segments(params, cfg, mel, [4], max_new_tokens=8,
                               ts_begin=150, max_windows=3)
    assert len(segs) >= 1
    for t0, t1, ids in segs:
        assert 0.0 <= t0 <= t1 <= 45.0 + 30.0
        assert all(i < 150 for i in ids)


def test_beam_transcribe_matches_hf(setup):
    """Beam decode (KV-reordered beam rows over the whisper decoder) vs
    HF generate(num_beams=5)."""
    from neural_tpu.models.whisper import transcribe_ids_beam
    m, params, cfg, mel = setup
    ours = transcribe_ids_beam(params, cfg, mel, [4], beam_size=5,
                               max_new_tokens=10, length_penalty=1.0)
    with torch.no_grad():
        ref = m.generate(input_features=torch.tensor(mel)[None],
                         num_beams=5, max_new_tokens=10, do_sample=False,
                         length_penalty=1.0,
                         early_stopping=True)[0].tolist()
    got = ours[1:]
    assert got[:len(ref)] == ref[:len(got)], (ours, ref)


def test_detect_language_matches_torch():
    """Language auto-detect: one decoder step restricted to the language
    block, vs a torch oracle on a whisper-shaped vocab layout."""
    from neural_tpu.models.whisper import (params_from_hf, special_tokens,
                                           detect_language)
    cfg_hf = transformers.WhisperConfig(
        vocab_size=1700, d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128, num_mel_bins=80,
        max_source_positions=1500, max_target_positions=448,
        eos_token_id=140, decoder_start_token_id=150, pad_token_id=0,
        suppress_tokens=[], begin_suppress_tokens=[])
    torch.manual_seed(1)
    m = transformers.WhisperForConditionalGeneration(cfg_hf).eval()
    params, cfg = params_from_hf(m)
    st = special_tokens(cfg)
    assert st["timestamp_begin"] == 1700 - 1501
    assert st["lang_begin"] == 151 and st["lang_end"] == st["translate"]

    rng = np.random.default_rng(2)
    mel = rng.standard_normal((80, 3000)).astype(np.float32) * 0.5
    lang_tok, probs = detect_language(params, cfg, mel)
    with torch.no_grad():
        enc = m.model.encoder(torch.tensor(mel)[None]).last_hidden_state
        lg = m(decoder_input_ids=torch.tensor([[150]]),
               encoder_outputs=(enc,)).logits[0, -1]
    block = lg[st["lang_begin"]:st["lang_end"]].numpy()
    assert lang_tok == st["lang_begin"] + int(block.argmax())
    assert abs(probs.sum() - 1.0) < 1e-5
    ref_probs = np.exp(block - block.max()); ref_probs /= ref_probs.sum()
    np.testing.assert_allclose(probs, ref_probs, atol=1e-3)


def test_forced_prompt_real_vocab_layout():
    """Special ids derived from the vocab structure must equal the real
    multilingual whisper ids (translate=50358, transcribe=50359,
    notimestamps=50363, langs from 50259)."""
    from neural_tpu.models.whisper import (WhisperConfig, special_tokens,
                                           build_forced_prompt)
    cfg = WhisperConfig(vocab_size=51865, sot_token_id=50258)
    st = special_tokens(cfg)
    assert st["translate"] == 50358
    assert st["transcribe"] == 50359
    assert st["notimestamps"] == 50363
    assert st["nospeech"] == 50362
    assert st["lang_begin"] == 50259 and st["lang_end"] == 50358
    en = 50259
    assert build_forced_prompt(cfg, en, "transcribe", False) == \
        [50258, 50259, 50359, 50363]
    assert build_forced_prompt(cfg, en, "translate", True) == \
        [50258, 50259, 50358]
    # tiny test vocab (no special block): sot only
    tiny = WhisperConfig(vocab_size=200, sot_token_id=4)
    assert build_forced_prompt(tiny, None, "transcribe", False) == [4]


def test_token_timestamper_algorithm():
    """TokenTimestamper: anchors from confident timestamp probabilities,
    proportional voice-length fill between them, monotone non-overlapping
    output (reference whisper_exp_compute_token_level_timestamps,
    whisper.cpp:2910)."""
    from neural_tpu.models.whisper import TokenTimestamper, voice_length

    tsb = 150
    st = TokenTimestamper(tsb)
    # segment [0, 2.0] s, 4 text tokens; token 2 confidently anchored at
    # tid tsb+50 (= 1.0 s)
    ids = [10, 11, 12, 13]
    info = [(0.001, 0.001, tsb),          # no anchor
            (0.001, 0.001, tsb),
            (0.5, 0.9, tsb + 50),         # anchor at 1.0 s
            (0.001, 0.001, tsb)]
    texts = ["hello", "world", "foo", "ba"]
    times = st.segment(ids, info, texts, 0.0, 2.0)
    assert len(times) == 4
    # anchored token starts exactly at its timestamp
    assert abs(times[2][0] - 1.0) < 1e-6
    # monotone, non-overlapping, inside the segment
    for j, (a, b) in enumerate(times):
        assert 0.0 - 1e-6 <= a <= b + 1e-6 and b <= 2.0 + 1e-6
        if j > 0:
            assert times[j - 1][1] <= a + 1e-6
    # proportional fill: first two tokens split [0, 1.0] by voice length
    v0, v1 = voice_length("hello"), voice_length("world")
    assert abs(times[0][1] - v0 / (v0 + v1 + voice_length("foo"))
               * 1.0) < 0.5  # rough: in the first half

    # voice_length weights match the reference table
    assert voice_length(" ") == 0.01
    assert voice_length(".") == 3.0 and voice_length("7") == 3.0
    assert voice_length("ab") == 2.0


def test_token_timestamps_end_to_end(setup):
    """transcribe_segments(token_timestamps=True) attaches per-text-token
    (t0, t1) inside each segment's bounds."""
    from neural_tpu.models.whisper import transcribe_segments

    m, params, cfg, _ = setup
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((80, 3000)).astype(np.float32) * 0.5
    audio = rng.standard_normal(16000 * 30).astype(np.float32) * 0.1
    segs = transcribe_segments(params, cfg, mel, [4], max_new_tokens=8,
                               ts_begin=150, max_windows=1,
                               token_timestamps=True, audio=audio)
    assert len(segs) >= 1
    for t0, t1, ids, times in segs:
        assert len(times) == len(ids)
        for a, b in times:
            assert a <= b + 1e-6


def test_quantized_whisper_matches_fp(setup):
    """int8-quantized whisper (reference quant_whisper.cpp →
    whisper_model_quantize, quant_utils.h:79): encoder states and decoder
    logits stay within quantization tolerance of fp, and the stacked
    QTensors really flow through the scanned graph."""
    m, params_fp, cfg, mel = setup
    from neural_tpu.core.qtensor import QTensor
    params_q, cfg_q = params_from_hf(m, quant="int8")
    assert cfg_q == cfg
    assert isinstance(params_q["enc_layers"]["fc1_w"], QTensor)
    assert isinstance(params_q["dec_layers"]["cross_wk"], QTensor)
    assert params_q["enc_layers"]["attn_wq"].cfg.bits == 8
    # convs / embeddings / norms stay fp (reference quantizes 2-D linears)
    assert not isinstance(params_q["conv1_w"], QTensor)
    assert not isinstance(params_q["dec_embed"], QTensor)

    x = jnp.asarray(mel[None])
    e_fp = np.asarray(encode(params_fp, x, cfg))
    e_q = np.asarray(encode(params_q, x, cfg))
    np.testing.assert_allclose(e_q, e_fp, atol=0.08, rtol=0.05)

    state_fp = init_decoder_state(params_fp, jnp.asarray(e_fp), cfg)
    state_q = init_decoder_state(params_q, jnp.asarray(e_fp), cfg)
    toks = jnp.asarray([[4, 7, 9]], jnp.int32)
    start = jnp.zeros((1,), jnp.int32)
    l_fp, _ = decode_step(params_fp, toks, start, state_fp, cfg)
    l_q, _ = decode_step(params_q, toks, start, state_q, cfg)
    np.testing.assert_allclose(np.asarray(l_q), np.asarray(l_fp),
                               atol=0.15, rtol=0.05)

    out = transcribe_ids(params_q, cfg, mel, [4], max_new_tokens=6)
    assert len(out) >= 1 and all(isinstance(t, int) for t in out)


def test_quantized_whisper_int4_runs(setup):
    m, _, cfg, mel = setup
    params_q, _ = params_from_hf(m, quant="q4_0")
    out = transcribe_ids(params_q, cfg, mel, [4], max_new_tokens=4)
    assert len(out) >= 1
