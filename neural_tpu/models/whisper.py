"""Whisper speech-to-text: encoder-decoder with cross-attention.

Reference: neural_speed/models/whisper/ (whisper.cpp port, 12k LoC: mel
frontend, conv stem, encoder, decoder with cross-attention, greedy
transcribe). Here the whole family is one functional module reusing the
framework's ops; weights map from HF WhisperForConditionalGeneration.

Structure (matches OpenAI Whisper):
- frontend: log-mel spectrogram (80/128 mels, n_fft=400, hop=160)
- encoder: gelu(conv1 k3 s1) → gelu(conv2 k3 s2) → +sinusoidal positions →
  pre-LN transformer → final LN
- decoder: token+learned-position embeddings → pre-LN transformer blocks
  with causal self-attention (KV cache) AND cross-attention over the
  encoder output (K/V computed once per utterance) → final LN → tied
  logits.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import layer_norm
from .transformer import linear

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    vocab_size: int = 51865
    d_model: int = 384
    n_heads: int = 6
    enc_layers: int = 4
    dec_layers: int = 4
    n_mels: int = 80
    n_audio_ctx: int = 1500         # encoder positions (30s / 2 / 10ms)
    n_text_ctx: int = 448
    ffn_dim: int = 1536
    eos_token_id: int = 50257
    sot_token_id: int = 50258

    @property
    def head_dim(self):
        return self.d_model // self.n_heads


def config_from_hf(c) -> WhisperConfig:
    return WhisperConfig(
        vocab_size=c.vocab_size, d_model=c.d_model,
        n_heads=c.encoder_attention_heads,
        enc_layers=c.encoder_layers, dec_layers=c.decoder_layers,
        n_mels=c.num_mel_bins, n_audio_ctx=c.max_source_positions,
        n_text_ctx=c.max_target_positions, ffn_dim=c.encoder_ffn_dim,
        eos_token_id=c.eos_token_id,
        sot_token_id=getattr(c, "decoder_start_token_id", 50258))


# ---------------------------------------------------------------------------
# audio frontend (reference: whisper.cpp log_mel_spectrogram)
# ---------------------------------------------------------------------------

SAMPLE_RATE, N_FFT, HOP = 16000, 400, 160


def mel_filterbank(n_mels: int = 80, n_fft: int = N_FFT,
                   sr: int = SAMPLE_RATE) -> np.ndarray:
    """Slaney-style mel filter matrix [n_mels, n_fft//2+1] (librosa/HF
    WhisperFeatureExtractor equivalent)."""
    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mel = 3.0 * f / 200.0
        log_region = f >= 1000.0
        mel = np.where(log_region,
                       15.0 + np.log(np.maximum(f, 1e-9) / 1000.0)
                       / np.log(6.4) * 27.0, mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = 200.0 * m / 3.0
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp(np.log(6.4) *
                                                 (m - 15.0) / 27.0), f)
        return f

    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0),
                                    n_mels + 2))
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(n_mels):
        lo, ce, hi = mel_pts[i], mel_pts[i + 1], mel_pts[i + 2]
        up = (fft_freqs - lo) / max(ce - lo, 1e-9)
        down = (hi - fft_freqs) / max(hi - ce, 1e-9)
        fb[i] = np.maximum(0, np.minimum(up, down))
        fb[i] *= 2.0 / (hi - lo)          # Slaney normalization
    return fb.astype(np.float32)


def log_mel_spectrogram(audio: np.ndarray, n_mels: int = 80,
                        pad_to: Optional[int] = 3000) -> np.ndarray:
    """f32 audio [n] @16kHz → log-mel [n_mels, frames] (matches the HF
    WhisperFeatureExtractor pipeline)."""
    audio = np.asarray(audio, np.float32)
    if pad_to is not None:
        target = pad_to * HOP
        audio = audio[:target]
        audio = np.pad(audio, (0, max(0, target - len(audio))))
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    pad = N_FFT // 2
    x = np.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - N_FFT) // HOP
    frames = np.lib.stride_tricks.as_strided(
        x, (n_frames, N_FFT), (x.strides[0] * HOP, x.strides[0]))
    stft = np.fft.rfft(frames * window, axis=-1)
    power = np.abs(stft[:-1]) ** 2            # drop last frame like whisper
    mel = mel_filterbank(n_mels) @ power.T    # [n_mels, frames]
    logm = np.log10(np.maximum(mel, 1e-10))
    logm = np.maximum(logm, logm.max() - 8.0)
    return ((logm + 4.0) / 4.0).astype(np.float32)


# ---------------------------------------------------------------------------
# encoder / decoder graphs
# ---------------------------------------------------------------------------


def _mha(q, k, v, n_heads: int, causal_len: Optional[jnp.ndarray] = None,
         q_pos: Optional[jnp.ndarray] = None):
    """Plain multi-head attention. q [B,T,D], k/v [B,S,D]. Masking: if
    causal_len given, key s valid iff s <= q_pos (absolute positions)."""
    B, T, D = q.shape
    S = k.shape[1]
    H = n_heads
    Dh = D // H
    qh = q.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
    kh = k.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
    vh = v.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhtd,bhsd->bhts", qh.astype(jnp.float32),
                        kh.astype(jnp.float32)) * (Dh ** -0.5)
    if q_pos is not None:
        s_idx = jnp.arange(S)[None, None, :]
        mask = s_idx <= q_pos[:, :, None]
        scores = jnp.where(mask[:, None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", probs, vh.astype(jnp.float32))
    return out.transpose(0, 2, 1, 3).reshape(B, T, D).astype(q.dtype)


def _attn_proj(x, lp, prefix):
    q = linear(x, lp[f"{prefix}_wq"], lp.get(f"{prefix}_bq"))
    k = linear(x, lp[f"{prefix}_wk"])                # whisper: k has no bias
    v = linear(x, lp[f"{prefix}_wv"], lp.get(f"{prefix}_bv"))
    return q, k, v


def encode(params: Params, mel: jnp.ndarray, cfg: WhisperConfig):
    """mel [B, n_mels, 3000] → encoder states [B, 1500, D]."""
    x = mel.astype(jnp.float32)
    # conv1: k=3 s=1 p=1 ; conv2: k=3 s=2 p=1  (channels-first weights
    # [out, in, k] like torch)
    x = jax.lax.conv_general_dilated(
        x, params["conv1_w"], (1,), [(1, 1)],
        dimension_numbers=("NCH", "OIH", "NCH"))
    x = jax.nn.gelu(x + params["conv1_b"][None, :, None], approximate=False)
    x = jax.lax.conv_general_dilated(
        x, params["conv2_w"], (2,), [(1, 1)],
        dimension_numbers=("NCH", "OIH", "NCH"))
    x = jax.nn.gelu(x + params["conv2_b"][None, :, None], approximate=False)
    x = x.transpose(0, 2, 1)                        # [B, T, D]
    x = x + params["enc_pos"][None, : x.shape[1]]

    def block(x, lp):
        h = layer_norm(x, lp["ln1_w"], lp["ln1_b"])
        q, k, v = _attn_proj(h, lp, "attn")
        a = _mha(q, k, v, cfg.n_heads)
        x = x + linear(a, lp["attn_wo"], lp["attn_bo"])
        h = layer_norm(x, lp["ln2_w"], lp["ln2_b"])
        h = jax.nn.gelu(linear(h, lp["fc1_w"], lp["fc1_b"]),
                        approximate=False)
        x = x + linear(h, lp["fc2_w"], lp["fc2_b"])
        return x, None

    x, _ = jax.lax.scan(block, x, params["enc_layers"])
    return layer_norm(x, params["enc_ln_w"], params["enc_ln_b"])


def init_decoder_state(params: Params, enc_out: jnp.ndarray,
                       cfg: WhisperConfig, max_len: Optional[int] = None):
    """Precompute per-layer cross-attention K/V (once per utterance —
    reference: whisper.cpp cross-attn kv precompute) and allocate the
    self-attention cache."""
    B, Tenc, D = enc_out.shape
    S = max_len or cfg.n_text_ctx

    def cross_kv(lp):
        k = linear(enc_out, lp["cross_wk"])
        v = linear(enc_out, lp["cross_wv"], lp.get("cross_bv"))
        return k, v

    cross_k, cross_v = jax.lax.map(cross_kv, params["dec_layers"])
    self_k = jnp.zeros((cfg.dec_layers, B, S, D), jnp.float32)
    self_v = jnp.zeros((cfg.dec_layers, B, S, D), jnp.float32)
    return {"cross_k": cross_k, "cross_v": cross_v,
            "self_k": self_k, "self_v": self_v}


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3,))
def decode_step(params: Params, tokens: jnp.ndarray, start: jnp.ndarray,
                state, cfg: WhisperConfig):
    """tokens [B, T] at positions start[B]..start+T → (logits, state)."""
    B, T = tokens.shape
    positions = start[:, None] + jnp.arange(T)[None, :]
    x = jnp.take(params["dec_embed"], tokens, axis=0).astype(jnp.float32)
    x = x + jnp.take(params["dec_pos"], positions, axis=0)

    def block(carry, layer):
        x = carry
        lp, ck, cv, sk, sv = layer
        h = layer_norm(x, lp["ln1_w"], lp["ln1_b"])
        q, k, v = _attn_proj(h, lp, "attn")

        def upd(cache, new, s0):
            return jax.lax.dynamic_update_slice(cache, new, (s0, 0))
        sk = jax.vmap(upd)(sk, k.astype(sk.dtype), start)
        sv = jax.vmap(upd)(sv, v.astype(sv.dtype), start)
        a = _mha(q, sk, sv, cfg.n_heads, q_pos=positions)
        x = x + linear(a, lp["attn_wo"], lp["attn_bo"])

        h = layer_norm(x, lp["ln_cross_w"], lp["ln_cross_b"])
        qc = linear(h, lp["cross_wq"], lp.get("cross_bq"))
        a = _mha(qc, ck, cv, cfg.n_heads)
        x = x + linear(a, lp["cross_wo"], lp["cross_bo"])

        h = layer_norm(x, lp["ln2_w"], lp["ln2_b"])
        h = jax.nn.gelu(linear(h, lp["fc1_w"], lp["fc1_b"]),
                        approximate=False)
        x = x + linear(h, lp["fc2_w"], lp["fc2_b"])
        return x, (sk, sv)

    x, (self_k, self_v) = jax.lax.scan(
        block, x, (params["dec_layers"], state["cross_k"], state["cross_v"],
                   state["self_k"], state["self_v"]))
    x = layer_norm(x, params["dec_ln_w"], params["dec_ln_b"])
    logits = jnp.dot(x, params["dec_embed"].T.astype(x.dtype),
                     preferred_element_type=jnp.float32)
    state = dict(state)
    state["self_k"], state["self_v"] = self_k, self_v
    return logits, state


def _ts_probs(row: np.ndarray, ts_begin: int):
    """(pt, ptsum, tid) of one step's logits row — the timestamp-token
    probability stats the reference records per sampled token
    (whisper.cpp whisper_process_logits → token.pt/ptsum/tid)."""
    row = row - row.max()
    p = np.exp(row)
    p /= p.sum()
    tail = p[ts_begin:]
    tid = int(tail.argmax()) + ts_begin
    return float(tail.max()), float(tail.sum()), tid


def transcribe_ids(params: Params, cfg: WhisperConfig, mel: np.ndarray,
                   prompt_ids: Sequence[int], max_new_tokens: int = 64,
                   suppress_ids: Sequence[int] = (),
                   force_first: Optional[int] = None,
                   collect_ts: Optional[int] = None) -> List[int]:
    """Greedy decode (reference whisper_full greedy path). ``prompt_ids``
    are the forced SOT/language/task tokens; ``suppress_ids`` are masked
    from every step (e.g. the <|notimestamps|> token in timestamp mode);
    ``force_first`` pins the first sampled token (whisper's rule that a
    timestamped window opens with a timestamp token).

    ``collect_ts``: the timestamp-begin token id; when set, returns
    (ids, info) where info[i] = (pt, ptsum, tid) per generated token —
    the raw material for token-level timestamps."""
    enc = encode(params, jnp.asarray(mel)[None], cfg)
    state = init_decoder_state(params, enc, cfg)
    toks = jnp.asarray(np.asarray(prompt_ids, np.int32)[None, :])
    logits, state = decode_step(params, toks, jnp.zeros((1,), jnp.int32),
                                state, cfg)

    def pick(logits_row):
        row = np.array(logits_row, np.float32)  # writable copy
        if suppress_ids:
            row[list(suppress_ids)] = -np.inf
        return int(row.argmax())

    out = list(prompt_ids)
    info = []
    row = np.asarray(logits[0, -1], np.float32)
    nxt = force_first if force_first is not None else pick(row)
    out.append(nxt)
    if collect_ts is not None:
        info.append(_ts_probs(row, collect_ts))
    pos = len(prompt_ids)
    for _ in range(max_new_tokens - 1):
        if nxt == cfg.eos_token_id:
            break
        logits, state = decode_step(
            params, jnp.asarray([[nxt]], jnp.int32),
            jnp.asarray([pos], jnp.int32), state, cfg)
        row = np.asarray(logits[0, -1], np.float32)
        nxt = pick(row)
        out.append(nxt)
        if collect_ts is not None:
            info.append(_ts_probs(row, collect_ts))
        pos += 1
    if collect_ts is not None:
        return out, info
    return out


# ---------------------------------------------------------------------------
# Beam decode (reference whisper.cpp beam-search strategy)
# ---------------------------------------------------------------------------


def _reorder_state(state, parents):
    """Reindex the beam rows of the decoder state (self-attn KV reorder —
    the whisper analog of beam_search_kv_cache_reorder, model_utils.h:423;
    cross K/V rows are identical copies so the take is a no-op there)."""
    return {k: jnp.take(v, parents, axis=1) for k, v in state.items()}


@partial(jax.jit, static_argnames=("cfg", "W"), donate_argnums=(4,))
def _beam_step(params, tokens, pos, scores, state, alive,
               cfg: WhisperConfig, W: int):
    """One beam expansion over the whisper decoder (mirrors
    runtime/beam.py::_beam_step: forward → joint top-k → KV reorder)."""
    logits, state = decode_step(params, tokens, pos, state, cfg)
    logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
    V = logp.shape[-1]
    logp = jnp.where(jnp.logical_not(alive)[:, None], -1e30, logp)
    total = scores[:, None] + logp
    top_scores, top_idx = jax.lax.top_k(total.reshape(-1), W)
    parents = top_idx // V
    toks = (top_idx % V).astype(jnp.int32)
    state = _reorder_state(state, parents)
    return parents, toks, top_scores, state


def transcribe_ids_beam(params: Params, cfg: WhisperConfig, mel: np.ndarray,
                        prompt_ids: Sequence[int], beam_size: int = 5,
                        max_new_tokens: int = 64,
                        length_penalty: float = 1.0) -> List[int]:
    """Beam-search transcription (reference whisper.cpp beam strategy;
    HF generate(num_beams=N) semantics incl. the can't-be-beaten early
    stop). Returns prompt + best hypothesis ids."""
    W = beam_size
    T = len(prompt_ids)
    enc = encode(params, jnp.asarray(mel)[None], cfg)
    # prefill the prompt ONCE at B=1 (the W rows would be byte-identical),
    # then broadcast the decoder state into the beam rows — the whisper
    # analog of the scheduler's _bcast_rows beam admission
    state = init_decoder_state(params, enc, cfg)
    prompt = jnp.asarray(np.asarray(prompt_ids, np.int32)[None, :])
    logits, state = decode_step(params, prompt, jnp.zeros((1,), jnp.int32),
                                state, cfg)
    state = {k: jnp.broadcast_to(v, (v.shape[0], W) + v.shape[2:])
             for k, v in state.items()}
    logp0 = jax.nn.log_softmax(logits[0, -1].astype(jnp.float32))
    top_scores, top_toks = jax.lax.top_k(logp0, W)

    beams = [list(prompt_ids) + [int(t)] for t in np.asarray(top_toks)]
    scores = np.asarray(top_scores, np.float64).copy()
    alive = np.ones(W, bool)
    done: List[Tuple[List[int], float]] = []

    def lp(n_new):
        return max(n_new, 1) ** length_penalty

    for w in range(W):
        if beams[w][-1] == cfg.eos_token_id:
            done.append((beams[w], scores[w] / lp(1)))
            alive[w] = False
            scores[w] = -1e30

    pos = T
    for step in range(1, max_new_tokens):
        if not alive.any():
            break
        tokens = jnp.asarray(
            np.asarray([b[-1] for b in beams], np.int32)[:, None])
        parents, toks, new_scores, state = _beam_step(
            params, tokens, jnp.full((W,), pos, jnp.int32),
            jnp.asarray(scores, jnp.float32), state, jnp.asarray(alive),
            cfg, W)
        parents = np.asarray(parents)
        toks = np.asarray(toks)
        new_scores = np.asarray(new_scores, np.float64)
        new_beams, new_alive = [], np.ones(W, bool)
        for w in range(W):
            seq = beams[parents[w]] + [int(toks[w])]
            new_beams.append(seq)
            if int(toks[w]) == cfg.eos_token_id:
                done.append((seq, new_scores[w] / lp(step + 1)))
                new_alive[w] = False
                new_scores[w] = -1e30
        beams, scores, alive = new_beams, new_scores, new_alive
        pos += 1
        if len(done) >= W:
            best_alive = scores[alive].max() if alive.any() else -np.inf
            worst_done = sorted(done, key=lambda h: -h[1])[W - 1][1]
            if best_alive / lp(max_new_tokens) < worst_done:
                break

    for w in range(W):
        if alive[w]:
            done.append((beams[w], scores[w] / lp(len(beams[w]) - T)))
    done.sort(key=lambda h: -h[1])
    return done[0][0]


# ---------------------------------------------------------------------------
# Special-token layout, language auto-detect, task plumbing
# ---------------------------------------------------------------------------


def special_tokens(cfg: WhisperConfig) -> Dict[str, int]:
    """Structure-derived special ids (whisper vocabs end with
    [...languages...] <|translate|> <|transcribe|> <|startoflm|>
    <|startofprev|> <|nospeech|> <|notimestamps|> [1500 timestamps] —
    reference: whisper.cpp token_* fields)."""
    ts = timestamp_begin(cfg)
    no_ts = ts - 1
    return {
        "timestamp_begin": ts, "notimestamps": no_ts,
        "nospeech": no_ts - 1, "startofprev": no_ts - 2,
        "startoflm": no_ts - 3, "transcribe": no_ts - 4,
        "translate": no_ts - 5,
        "lang_begin": cfg.sot_token_id + 1,     # <|en|> ...
        "lang_end": no_ts - 5,                  # exclusive
    }


def detect_language(params: Params, cfg: WhisperConfig, mel: np.ndarray,
                    enc: Optional[jnp.ndarray] = None):
    """One decoder step from [sot], softmax restricted to the language
    token block (reference whisper_lang_auto_detect,
    models/whisper/whisper.cpp). Returns (lang_token_id, probs [n_langs]
    over ids lang_begin..lang_end)."""
    st = special_tokens(cfg)
    if st["lang_end"] <= st["lang_begin"]:
        raise ValueError("vocab has no language token block")
    if enc is None:
        enc = encode(params, jnp.asarray(mel)[None], cfg)
    state = init_decoder_state(params, enc, cfg, max_len=8)
    toks = jnp.asarray([[cfg.sot_token_id]], jnp.int32)
    logits, _ = decode_step(params, toks, jnp.zeros((1,), jnp.int32),
                            state, cfg)
    row = np.asarray(logits[0, -1], np.float32)
    block = row[st["lang_begin"]:st["lang_end"]]
    probs = np.exp(block - block.max())
    probs /= probs.sum()
    return st["lang_begin"] + int(block.argmax()), probs


def build_forced_prompt(cfg: WhisperConfig, language: Optional[int] = None,
                        task: str = "transcribe",
                        timestamps: bool = False) -> List[int]:
    """SOT-sequence builder: [sot, <|lang|>, <|task|>, (<|notimestamps|>)]
    (reference whisper_full forced decoder tokens; HF forced_decoder_ids).
    ``language`` is a language TOKEN id (use detect_language for auto)."""
    if timestamp_begin(cfg) < 1:      # non-whisper vocab (tiny test models)
        return [cfg.sot_token_id]
    st = special_tokens(cfg)
    ids = [cfg.sot_token_id]
    if language is not None:
        ids.append(int(language))
    if language is not None or task != "transcribe":
        ids.append(st[task])
    if not timestamps:
        ids.append(st["notimestamps"])
    return ids


# ---------------------------------------------------------------------------
# Long-form transcription with timestamps (reference whisper_full seek loop)
# ---------------------------------------------------------------------------

TS_STEP = 0.02          # seconds per timestamp token
MEL_HOP_S = 0.01        # seconds per mel frame


def timestamp_begin(cfg: WhisperConfig) -> int:
    """First timestamp token id <|0.00|>. Whisper vocabs end with 1500
    timestamp tokens (0.00–30.00 in 0.02 s steps) plus <|notimestamps|>
    right before them — so en (51864) and multilingual (51865) both give
    vocab_size - 1501 (reference: whisper.cpp token_beg)."""
    return cfg.vocab_size - 1501


def segments_from_tokens(ids: Sequence[int], ts_begin: int, offset_s: float,
                         eos: int):
    """Split one window's decoded ids at timestamp tokens.

    Returns (segments, last_ts_s): segments are (start_s, end_s, text_ids)
    with absolute times; last_ts_s is the final timestamp in the window
    (the seek advance), or None if the window had no closing timestamp.
    """
    segs, cur = [], []
    t0 = 0.0
    last_ts = None
    for t in ids:
        if t == eos:
            break
        if t >= ts_begin:
            ts = (t - ts_begin) * TS_STEP
            if cur:
                segs.append((offset_s + t0, offset_s + ts, cur))
                cur = []
            t0 = ts
            last_ts = ts
        else:
            cur.append(int(t))
    if cur:  # unterminated segment: close at the window end
        segs.append((offset_s + t0, offset_s + 30.0, cur))
        last_ts = None
    return segs, last_ts


# ---------------------------------------------------------------------------
# Token-level timestamps (reference whisper_exp_compute_token_level_timestamps,
# whisper.cpp:2910 definition, applied per new segment at :4102-4147)
# ---------------------------------------------------------------------------


def voice_length(text: str) -> float:
    """Heuristic spoken length of a token's text (reference voice_length):
    spaces ~0, punctuation/digits long, letters 1."""
    res = 0.0
    for c in text:
        if c == " ":
            res += 0.01
        elif c == ",":
            res += 2.0
        elif c in ".!?" or c.isdigit():
            res += 3.0
        else:
            res += 1.0
    return res


def signal_energy(audio: np.ndarray, hw: int = 32) -> np.ndarray:
    """Smoothed |amplitude| per sample (reference get_signal_energy)."""
    a = np.abs(np.asarray(audio, np.float32).reshape(-1))
    kernel = np.ones(2 * hw + 1, np.float32) / (2 * hw + 1)
    return np.convolve(a, kernel, mode="same")


class TokenTimestamper:
    """Carries the cross-segment anchors (reference state->t_beg /
    t_last / tid_last) and computes per-token (t0, t1) seconds for one
    segment at a time."""

    def __init__(self, ts_begin: int, thold_pt: float = 0.01,
                 thold_ptsum: float = 0.01,
                 energy: Optional[np.ndarray] = None,
                 sample_rate: int = SAMPLE_RATE):
        self.ts_begin = ts_begin
        self.thold_pt = thold_pt
        self.thold_ptsum = thold_ptsum
        self.energy = energy
        self.sr = sample_rate
        self.t_beg = 0.0
        self.t_last = 0.0
        self.tid_last = ts_begin

    def segment(self, ids: Sequence[int], info, texts: Sequence[str],
                t0: float, t1: float) -> List[Tuple[float, float]]:
        """ids/info/texts: the segment's tokens (incl. any timestamp
        tokens), their (pt, ptsum, tid) stats, and their decoded text;
        t0/t1: segment bounds in seconds. Returns [(t0_s, t1_s)] per
        token — anchor on confidently-sampled timestamp probabilities,
        proportionally split the gaps by voice length, then snap to
        signal energy when audio is available."""
        n = len(ids)
        if n == 0:
            return []
        if n == 1:
            self.t_last = t1
            return [(t0, t1)]
        UNSET = -1.0
        tok_t0 = [UNSET] * n
        tok_t1 = [UNSET] * n

        if ids[0] == self.ts_begin:
            tok_t0[0] = tok_t1[0] = t0
            tok_t0[1] = t0
            self.t_beg = t0
            self.t_last = t0
            self.tid_last = self.ts_begin
        else:
            tok_t0[0] = self.t_last

        for j in range(n):
            pt, ptsum, tid = info[j]
            tt = self.t_beg + TS_STEP * (tid - self.ts_begin)
            if (pt > self.thold_pt and ptsum > self.thold_ptsum
                    and tid > self.tid_last and tt <= t1):
                if j > 0:
                    tok_t1[j - 1] = tt
                tok_t0[j] = tt
                self.tid_last = tid
        tok_t1[n - 2] = t1
        tok_t0[n - 1] = t1
        tok_t1[n - 1] = t1
        self.t_last = t1

        # proportional fill of unknown intervals by voice length
        vlens = [voice_length(t) for t in texts]
        p0 = 0
        while True:
            p1 = p0
            while p1 < n and tok_t1[p1] < 0:
                p1 += 1
            if p1 >= n:
                p1 = n - 1
            if p1 > p0:
                psum = sum(vlens[p0:p1 + 1]) or 1.0
                dt = tok_t1[p1] - tok_t0[p0]
                for j in range(p0 + 1, p1 + 1):
                    ct = tok_t0[j - 1] + dt * vlens[j - 1] / psum
                    tok_t1[j - 1] = ct
                    tok_t0[j] = ct
            p0 = p1 + 1
            if p0 >= n:
                break
        # monotonicity fixups (reference "fix up (just in case)")
        for j in range(n - 1):
            if tok_t1[j] < 0:
                tok_t0[j + 1] = tok_t1[j]
            if j > 0 and tok_t1[j - 1] > tok_t0[j]:
                tok_t0[j] = tok_t1[j - 1]
                tok_t1[j] = max(tok_t0[j], tok_t1[j])

        if self.energy is not None:
            self._vad(ids, tok_t0, tok_t1)
        return list(zip(tok_t0, tok_t1))

    def _vad(self, ids, tok_t0, tok_t1):
        """Expand/contract token intervals to the local voice activity
        (reference VAD block of the same function)."""
        e = self.energy
        ns_total = len(e)
        hw = self.sr // 8

        def to_sample(t):
            return min(max(int(round(t * self.sr)), 0), ns_total - 1)

        n = len(ids)
        for j in range(n):
            if ids[j] >= self.ts_begin:
                continue
            s0, s1 = to_sample(tok_t0[j]), to_sample(tok_t1[j])
            ss0, ss1 = max(s0 - hw, 0), min(s1 + hw, ns_total)
            if ss1 <= ss0:
                continue
            thold = 0.5 * float(e[ss0:ss1].sum()) / (ss1 - ss0)

            k = s0
            if e[k] > thold and j > 0:
                while k > 0 and e[k] > thold:
                    k -= 1
                t = k / self.sr
                tok_t0[j] = max(t, tok_t1[j - 1])
            else:
                while k < s1 and e[k] < thold:
                    k += 1
                tok_t0[j] = k / self.sr
                s0 = k

            k = s1
            if e[k] > thold:
                while k < ns_total - 1 and e[k] > thold:
                    k += 1
                t = k / self.sr
                tok_t1[j] = min(t, tok_t0[j + 1]) if j < n - 1 \
                    and tok_t0[j + 1] >= 0 else t
            else:
                while k > s0 and e[k] < thold:
                    k -= 1
                tok_t1[j] = k / self.sr


def transcribe_segments(params: Params, cfg: WhisperConfig, mel: np.ndarray,
                        prompt_ids: Sequence[int],
                        max_new_tokens: int = 224,
                        ts_begin: Optional[int] = None,
                        max_windows: Optional[int] = None,
                        token_timestamps: bool = False,
                        audio: Optional[np.ndarray] = None,
                        token_text_fn=None):
    """Long-audio transcription: 30 s windows advanced by the last decoded
    timestamp, with per-segment (start, end) times — the TPU-side analog of
    the reference's whisper_full seek loop (models/whisper/whisper.cpp).

    mel: [n_mels, T_frames] (any length). Returns a list of
    (start_s, end_s, token_ids) segments — or, with
    ``token_timestamps=True``, (start_s, end_s, token_ids, token_times)
    where token_times[i] = (t0_s, t1_s) per text token (reference
    params.token_timestamps → whisper_exp_compute_token_level_timestamps,
    whisper.cpp:4102-4147). ``audio`` (16 kHz samples) enables the
    energy-VAD snap; ``token_text_fn`` maps an id to its text for the
    voice-length split (defaults to a uniform length).
    """
    if ts_begin is None:
        ts_begin = timestamp_begin(cfg)
    if ts_begin < 1:
        raise ValueError(
            f"vocab_size {cfg.vocab_size} has no timestamp tokens; pass "
            "ts_begin explicitly for non-whisper vocabs")
    no_ts = ts_begin - 1
    win = cfg.n_audio_ctx * 2                       # mel frames per window
    mel = np.asarray(mel)
    n_frames = mel.shape[-1]
    segments = []
    seek = 0
    n_win = 0
    stamper = None
    if token_timestamps:
        energy = signal_energy(audio) if audio is not None else None
        stamper = TokenTimestamper(ts_begin, energy=energy)
        text_fn = token_text_fn or (lambda i: "x")
    while seek < n_frames and (max_windows is None or n_win < max_windows):
        n_win += 1
        window = mel[:, seek:seek + win]
        if window.shape[-1] < win:
            window = np.pad(window,
                            ((0, 0), (0, win - window.shape[-1])),
                            constant_values=float(window.min())
                            if window.size else 0.0)
        ids = transcribe_ids(params, cfg, window, prompt_ids,
                             max_new_tokens, suppress_ids=(no_ts,),
                             force_first=ts_begin,
                             collect_ts=ts_begin if token_timestamps
                             else None)
        if token_timestamps:
            ids, info = ids
        new = ids[len(prompt_ids):]
        offset_s = seek * MEL_HOP_S
        segs, last_ts = segments_from_tokens(
            new, ts_begin, offset_s, cfg.eos_token_id)
        if token_timestamps:
            # re-scan with indices so each segment's text tokens map back
            # to their per-step (pt, ptsum, tid) stats
            idx_segs, cur = [], []
            for i, t in enumerate(new):
                if t == cfg.eos_token_id:
                    break
                if t >= ts_begin:
                    if cur:
                        idx_segs.append(cur)
                        cur = []
                else:
                    cur.append(i)
            if cur:
                idx_segs.append(cur)
            for (t0, t1, text_ids), idxs in zip(segs, idx_segs):
                times = stamper.segment(
                    [new[i] for i in idxs], [info[i] for i in idxs],
                    [text_fn(new[i]) for i in idxs], t0, t1)
                segments.append((t0, t1, text_ids, times))
        else:
            segments.extend(segs)
        if last_ts is not None and last_ts > 0:
            seek += int(round(last_ts / MEL_HOP_S))
        else:
            seek += win
    return segments


# ---------------------------------------------------------------------------
# HF weight mapping
# ---------------------------------------------------------------------------


def params_from_hf(model, dtype=jnp.float32,
                   quant=None) -> Tuple[Params, WhisperConfig]:
    """torch WhisperForConditionalGeneration → (params, cfg).

    ``quant`` (preset name / QuantConfig / None): quantize every
    encoder/decoder attention + MLP linear to QTensors consumed by the
    shared ``linear()`` — the analog of the reference's whisper
    quantization (models/model_utils/quant_utils.h:79 whisper_model_quantize
    driven by application/quant_whisper.cpp). Convs, embeddings, norms and
    the tied lm_head stay fp, matching the reference's quantized-tensor
    set (2-D linears only). Weights whose K doesn't divide the group size
    (tiny test models) stay fp.
    """
    import numpy as _np
    from ..convert.hf import _quantize_one, resolve_quant
    from ..convert.quant_registry import QuantRegistry
    qcfg = resolve_quant(quant)
    if isinstance(qcfg, QuantRegistry):
        raise ValueError(
            "whisper quantization takes a single preset/QuantConfig — "
            "per-tensor QuantRegistry rules target decoder-family tensor "
            "names and do not apply to the whisper encoder-decoder")
    cfg = config_from_hf(model.config)
    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}

    def g(name, transpose=False, q=False):
        w = sd[name]
        w = w.T if transpose else w
        if q and qcfg is not None and w.ndim == 2 and \
                (qcfg.group_size == -1
                 or w.shape[0] % qcfg.group_size == 0):
            return _quantize_one(_np.asarray(w, _np.float32), qcfg)
        return jnp.asarray(w, dtype)

    def attn_block(p, prefix, out):
        out[f"{prefix}_wq"] = g(p + "q_proj.weight", True, q=True)
        out[f"{prefix}_bq"] = g(p + "q_proj.bias")
        out[f"{prefix}_wk"] = g(p + "k_proj.weight", True, q=True)
        out[f"{prefix}_wv"] = g(p + "v_proj.weight", True, q=True)
        out[f"{prefix}_bv"] = g(p + "v_proj.bias")
        out[f"{prefix}_wo"] = g(p + "out_proj.weight", True, q=True)
        out[f"{prefix}_bo"] = g(p + "out_proj.bias")

    def enc_layer(i):
        p = f"model.encoder.layers.{i}."
        out = {
            "ln1_w": g(p + "self_attn_layer_norm.weight"),
            "ln1_b": g(p + "self_attn_layer_norm.bias"),
            "ln2_w": g(p + "final_layer_norm.weight"),
            "ln2_b": g(p + "final_layer_norm.bias"),
            "fc1_w": g(p + "fc1.weight", True, q=True),
            "fc1_b": g(p + "fc1.bias"),
            "fc2_w": g(p + "fc2.weight", True, q=True),
            "fc2_b": g(p + "fc2.bias"),
        }
        attn_block(p + "self_attn.", "attn", out)
        return out

    def dec_layer(i):
        p = f"model.decoder.layers.{i}."
        out = {
            "ln1_w": g(p + "self_attn_layer_norm.weight"),
            "ln1_b": g(p + "self_attn_layer_norm.bias"),
            "ln_cross_w": g(p + "encoder_attn_layer_norm.weight"),
            "ln_cross_b": g(p + "encoder_attn_layer_norm.bias"),
            "ln2_w": g(p + "final_layer_norm.weight"),
            "ln2_b": g(p + "final_layer_norm.bias"),
            "fc1_w": g(p + "fc1.weight", True, q=True),
            "fc1_b": g(p + "fc1.bias"),
            "fc2_w": g(p + "fc2.weight", True, q=True),
            "fc2_b": g(p + "fc2.bias"),
        }
        attn_block(p + "self_attn.", "attn", out)
        attn_block(p + "encoder_attn.", "cross", out)
        return out

    stack = lambda ds: jax.tree.map(lambda *xs: jnp.stack(xs), *ds)
    params: Params = {
        "conv1_w": g("model.encoder.conv1.weight"),
        "conv1_b": g("model.encoder.conv1.bias"),
        "conv2_w": g("model.encoder.conv2.weight"),
        "conv2_b": g("model.encoder.conv2.bias"),
        "enc_pos": g("model.encoder.embed_positions.weight"),
        "enc_ln_w": g("model.encoder.layer_norm.weight"),
        "enc_ln_b": g("model.encoder.layer_norm.bias"),
        "enc_layers": stack([enc_layer(i) for i in range(cfg.enc_layers)]),
        "dec_embed": g("model.decoder.embed_tokens.weight"),
        "dec_pos": g("model.decoder.embed_positions.weight"),
        "dec_ln_w": g("model.decoder.layer_norm.weight"),
        "dec_ln_b": g("model.decoder.layer_norm.bias"),
        "dec_layers": stack([dec_layer(i) for i in range(cfg.dec_layers)]),
    }
    return params, cfg
