"""Beam search with KV-cache reorder.

Reference: neural_speed/models/model_utils/model_utils.cpp:2139-2943 —
``beam_search_flow::loop`` (beam/beam_hypotheses model_utils.h:297,331),
``logits_processor`` (min-new-tokens + length penalty, :404),
``beam_search_kv_cache_reorder`` (:423) and top-k next-token expansion
(:2310).

TPU-native: beams are batch rows of one shared cache; the per-step reorder
is a single ``jnp.take`` over the batch axis (the analog of the reference's
per-arch KV reorder hook); the whole step (forward → joint top-k →
reorder) is jitted with donated cache.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.transformer import forward
from .kvcache import KVCache, init_cache, reorder_batch
from .generate import model_step


@dataclasses.dataclass
class Hypothesis:
    ids: List[int]
    score: float            # length-penalized log-prob


def _plen_beam(cfg: ModelConfig, T: int, W: int):
    """Prompt-length operand for prefix-LM archs' decode steps (ChatGLM
    v1 GLM RoPE anchor); None elsewhere."""
    if cfg.prefix_lm or cfg.rope_style == "glm1":
        return jnp.full((W,), T, jnp.int32)
    return None


@partial(jax.jit, static_argnames=("cfg", "W"), donate_argnums=(4,))
def _beam_step(params, tokens, pos, scores, cache, alive, eos_mask,
               cfg: ModelConfig, W: int, prompt_len=None):
    """One beam expansion.

    tokens [W, 1]; scores [W] cumulative log-probs; alive [W] bool;
    eos_mask [V] (-inf at eos before min_new_tokens, else 0).
    Returns (parents [W], next_tokens [W], new_scores [W], logp_of_pick [W],
    cache-after-reorder-and-forward).
    """
    logits, cache = forward(params, tokens, pos, cache, cfg,
                            prompt_len=prompt_len)
    logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
    logp = logp + eos_mask[None, :]
    V = logp.shape[-1]
    # dead beams must not spawn: give them -inf except a single dummy slot
    dead = jnp.logical_not(alive)
    logp = jnp.where(dead[:, None], -1e30, logp)
    total = scores[:, None] + logp                     # [W, V]
    flat = total.reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat, W)
    parents = top_idx // V
    toks = (top_idx % V).astype(jnp.int32)
    picked_logp = jnp.take_along_axis(
        logp[parents], toks[:, None], axis=-1)[:, 0]
    cache = reorder_batch(cache, parents)
    return parents, toks, top_scores, picked_logp, cache


def beam_search(params, cfg: ModelConfig, prompt_ids: Sequence[int],
                beam_size: int = 4, max_new_tokens: int = 32,
                length_penalty: float = 1.0, min_new_tokens: int = 0,
                max_len: Optional[int] = None,
                num_return: Optional[int] = None) -> List[Hypothesis]:
    """Standard beam search (HF semantics: early-stop when the worst kept
    hypothesis can no longer be beaten). Returns hypotheses sorted by
    length-penalized score."""
    W = beam_size
    T = len(prompt_ids)
    S = max_len or min(cfg.max_seq_len, T + max_new_tokens)
    num_return = num_return or W

    cache = init_cache(cfg, W, S)
    prompt = jnp.asarray(np.tile(np.asarray(prompt_ids, np.int32), (W, 1)))
    logits, cache = model_step(params, prompt,
                               jnp.zeros((W,), jnp.int32), cache, cfg)
    logp0 = jax.nn.log_softmax(logits[0, -1].astype(jnp.float32))
    if min_new_tokens > 0:
        logp0 = logp0.at[jnp.asarray(cfg.eos_token_ids)].add(-1e30)
    top_scores, top_toks = jax.lax.top_k(logp0, W)

    beams = [list(prompt_ids) + [int(t)] for t in np.asarray(top_toks)]
    scores = np.asarray(top_scores, np.float64).copy()
    alive = np.ones(W, bool)
    done: List[Hypothesis] = []

    def lp(n_new):  # length penalty divisor (reference logits_processor:404)
        return max(n_new, 1) ** length_penalty

    # first token may be EOS (if min_new_tokens == 0)
    for w in range(W):
        if beams[w][-1] in cfg.eos_token_ids and min_new_tokens <= 1:
            done.append(Hypothesis(beams[w], scores[w] / lp(1)))
            alive[w] = False

    pos = T
    for step in range(1, max_new_tokens):
        if not alive.any():
            break
        eos_mask = np.zeros(cfg.vocab_size, np.float32)
        if step + 1 <= min_new_tokens:
            eos_mask[list(cfg.eos_token_ids)] = -1e30
        tokens = jnp.asarray(
            np.asarray([b[-1] for b in beams], np.int32)[:, None])
        parents, toks, new_scores, _, cache = _beam_step(
            params, tokens, jnp.full((W,), pos, jnp.int32),
            jnp.asarray(scores, jnp.float32), cache,
            jnp.asarray(alive), jnp.asarray(eos_mask), cfg, W,
            prompt_len=_plen_beam(cfg, T, W))
        parents = np.asarray(parents)
        toks = np.asarray(toks)
        new_scores = np.asarray(new_scores, np.float64)

        new_beams, new_alive = [], np.ones(W, bool)
        for w in range(W):
            seq = beams[parents[w]] + [int(toks[w])]
            new_beams.append(seq)
            if int(toks[w]) in cfg.eos_token_ids:
                done.append(Hypothesis(seq, new_scores[w] / lp(step + 1)))
                new_alive[w] = False
                new_scores[w] = -1e30
        beams, scores, alive = new_beams, new_scores, new_alive
        pos += 1

        # early stop: best possible remaining score can't beat kept worst
        if len(done) >= W:
            best_alive = scores[alive].max() if alive.any() else -np.inf
            worst_done = sorted(done, key=lambda h: -h.score)[W - 1].score
            if best_alive / lp(max_new_tokens) < worst_done:
                break

    for w in range(W):
        if alive[w]:
            done.append(Hypothesis(beams[w],
                                   scores[w] / lp(len(beams[w]) - T)))
    done.sort(key=lambda h: -h.score)
    return done[:num_return]
