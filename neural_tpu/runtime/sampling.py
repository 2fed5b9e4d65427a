"""Sampling suite: penalties, top-k/top-p, TFS, typical, mirostat, greedy.

TPU-native port-free reimplementation of the reference sampler family
(neural_speed/models/model_utils/model_utils.cpp:521-996:
model_sample_top_k/top_p/tail_free/typical/temperature,
model_sample_repetition_penalty/frequency_and_presence_penalties,
model_sample_token_mirostat v1/v2 and _greedy; batched post-processors
model_post_greedy_search / model_post_sample_top_k_top_p_repeat
model_utils.h:533-536).

Everything is functional jnp over batched [B, V] logits (no host round
trips), so the whole pipeline fuses into the decode step under jit.
Filters keep the full [B, V] shape (masking with -inf) — TPU-friendly
static shapes instead of the reference's candidate-array sort/truncate.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG = -1e30


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Mirrors gpt_params' sampling block (model_config.h:40+)."""
    temperature: float = 0.8
    top_k: int = 40            # <=0 → disabled
    top_p: float = 0.95        # >=1 → disabled
    tfs_z: float = 1.0         # <1 → tail-free sampling enabled
    typical_p: float = 1.0     # <1 → locally-typical sampling enabled
    repeat_penalty: float = 1.1
    repeat_last_n: int = 64
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    mirostat: int = 0          # 0 off, 1 v1, 2 v2
    mirostat_tau: float = 5.0
    mirostat_eta: float = 0.1
    greedy: bool = False


class SamplerState(NamedTuple):
    """Per-sequence mutable sampling state (mirostat mu)."""
    mu: jnp.ndarray  # [B] f32

    @staticmethod
    def init(batch: int, params: "SamplingParams") -> "SamplerState":
        return SamplerState(mu=jnp.full((batch,), 2.0 * params.mirostat_tau,
                                        jnp.float32))


# ---------------------------------------------------------------------------
# penalties (logit preprocessing)
# ---------------------------------------------------------------------------


def token_counts(tokens: jnp.ndarray, valid: jnp.ndarray, vocab: int):
    """tokens [B, T] + validity mask [B, T] → counts [B, V] (f32)."""
    B, T = tokens.shape
    one = valid.astype(jnp.float32)
    counts = jnp.zeros((B, vocab), jnp.float32)
    return counts.at[jnp.arange(B)[:, None], tokens].add(one)


def apply_penalties(logits, counts, params: SamplingParams):
    """Repetition (CTRL-style divide/multiply) + OpenAI freq/presence.

    reference: model_sample_repetition_penalty (model_utils.cpp:676) and
    model_sample_frequency_and_presence_penalties (:696).
    """
    seen = counts > 0
    if params.repeat_penalty != 1.0:
        rp = params.repeat_penalty
        penalized = jnp.where(logits > 0, logits / rp, logits * rp)
        logits = jnp.where(seen, penalized, logits)
    if params.frequency_penalty or params.presence_penalty:
        logits = logits - counts * params.frequency_penalty \
            - seen.astype(logits.dtype) * params.presence_penalty
    return logits


# ---------------------------------------------------------------------------
# filters (keep [B, V], mask with -inf)
# ---------------------------------------------------------------------------


def top_k_filter(logits, k: int):
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jnp.sort(logits, axis=-1)[..., -k][..., None]
    return jnp.where(logits < kth, NEG, logits)


def top_p_filter(logits, p: float):
    """Nucleus: keep the smallest prefix of sorted probs with cumsum >= p
    (reference model_sample_top_p, model_utils.cpp:570: always keeps the
    first token; includes the token that crosses p)."""
    if p >= 1.0:
        return logits
    sl = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sl, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep while cumulative BEFORE this token < p (so crossing token kept)
    keep_sorted = (cum - probs) < p
    n_keep = jnp.maximum(keep_sorted.sum(-1), 1)
    cutoff = jnp.take_along_axis(sl, (n_keep - 1)[..., None], axis=-1)
    return jnp.where(logits < cutoff, NEG, logits)


def tail_free_filter(logits, z: float):
    """Tail-free sampling: cut where the (normalized) |second derivative|
    of sorted probs accumulates past z (model_sample_tail_free,
    model_utils.cpp:605)."""
    if z >= 1.0:
        return logits
    sl = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sl, axis=-1)
    d2 = jnp.abs(jnp.diff(jnp.diff(probs, axis=-1), axis=-1))
    d2 = d2 / jnp.maximum(d2.sum(-1, keepdims=True), 1e-12)
    cum = jnp.cumsum(d2, axis=-1)
    keep = cum < z                       # over V-2 entries
    n_keep = jnp.maximum(keep.sum(-1) + 1, 1)
    cutoff = jnp.take_along_axis(sl, (n_keep - 1)[..., None], axis=-1)
    return jnp.where(logits < cutoff, NEG, logits)


def typical_filter(logits, p: float):
    """Locally typical sampling (model_sample_typical, model_utils.cpp:646):
    keep tokens whose -log p is closest to the entropy until mass >= p."""
    if p >= 1.0:
        return logits
    probs = jax.nn.softmax(logits, axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ent = -jnp.sum(probs * logp, axis=-1, keepdims=True)
    shift = jnp.abs(-logp - ent)
    order = jnp.argsort(shift, axis=-1)                  # ascending
    probs_sorted = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    keep_sorted = (cum - probs_sorted) < p
    keep = jnp.zeros_like(keep_sorted).at[
        jnp.arange(logits.shape[0])[:, None], order].set(keep_sorted)
    return jnp.where(keep, logits, NEG)


# ---------------------------------------------------------------------------
# samplers
# ---------------------------------------------------------------------------


def _categorical(key, logits):
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def sample(logits: jnp.ndarray, key, params: SamplingParams,
           state: Optional[SamplerState] = None,
           prev_tokens: Optional[jnp.ndarray] = None,
           prev_valid: Optional[jnp.ndarray] = None):
    """Full pipeline (reference order, main_run.cpp:571-600):
    penalties → [mirostat | greedy | temperature → top-k → TFS → typical
    → top-p → categorical]. Returns (token [B], new_state)."""
    logits = logits.astype(jnp.float32)
    B, V = logits.shape
    if state is None:
        state = SamplerState.init(B, params)

    if prev_tokens is not None:
        if prev_valid is None:
            prev_valid = jnp.ones(prev_tokens.shape, bool)
        counts = token_counts(prev_tokens, prev_valid, V)
        logits = apply_penalties(logits, counts, params)

    if params.greedy or params.temperature <= 0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), state

    if params.mirostat == 2:
        return _mirostat_v2(logits, key, params, state)
    if params.mirostat == 1:
        return _mirostat_v1(logits, key, params, state)

    logits = logits / params.temperature
    logits = top_k_filter(logits, params.top_k)
    logits = tail_free_filter(logits, params.tfs_z)
    logits = typical_filter(logits, params.typical_p)
    logits = top_p_filter(logits, params.top_p)
    return _categorical(key, logits), state


class BatchedSamplingParams(NamedTuple):
    """Per-ROW sampling parameters as device arrays — one [B, V] sampling
    dispatch even when every running request carries different
    SamplingParams (the reference serves per-query generation configs
    through one batched post-process, model_utils.h:533-536). Built host-
    side by :func:`batch_params`; consumed by :func:`sample_batched`."""
    temperature: jnp.ndarray        # [B] f32
    top_k: jnp.ndarray              # [B] i32 (<=0 disabled)
    top_p: jnp.ndarray              # [B] f32 (>=1 disabled)
    tfs_z: jnp.ndarray              # [B] f32 (>=1 disabled)
    typical_p: jnp.ndarray          # [B] f32 (>=1 disabled)
    repeat_penalty: jnp.ndarray     # [B] f32 (==1 disabled)
    frequency_penalty: jnp.ndarray  # [B] f32
    presence_penalty: jnp.ndarray   # [B] f32
    mirostat: jnp.ndarray           # [B] i32 (0 off, 1 v1, 2 v2)
    mirostat_tau: jnp.ndarray       # [B] f32
    mirostat_eta: jnp.ndarray       # [B] f32
    greedy: jnp.ndarray             # [B] bool
    mask_eos: jnp.ndarray           # [B] bool (min-new-tokens suppression)


def batch_params(rows, mask_eos=None) -> BatchedSamplingParams:
    """list[SamplingParams] (+ per-row eos-suppression flags) → arrays."""
    import numpy as np
    f = lambda name: jnp.asarray(
        np.asarray([getattr(r, name) for r in rows], np.float32))
    i = lambda name: jnp.asarray(
        np.asarray([getattr(r, name) for r in rows], np.int32))
    if mask_eos is None:
        mask_eos = [False] * len(rows)
    return BatchedSamplingParams(
        temperature=f("temperature"), top_k=i("top_k"), top_p=f("top_p"),
        tfs_z=f("tfs_z"), typical_p=f("typical_p"),
        repeat_penalty=f("repeat_penalty"),
        frequency_penalty=f("frequency_penalty"),
        presence_penalty=f("presence_penalty"), mirostat=i("mirostat"),
        mirostat_tau=f("mirostat_tau"), mirostat_eta=f("mirostat_eta"),
        greedy=jnp.asarray(np.asarray([r.greedy or r.temperature <= 0
                                       for r in rows], bool)),
        mask_eos=jnp.asarray(np.asarray(mask_eos, bool)))


def _rowwise_filters(logits, bp: BatchedSamplingParams):
    """top-k → TFS → typical → top-p with PER-ROW thresholds (branchless:
    each filter computes unconditionally and row-selects; a disabled row
    keeps its input)."""
    B, V = logits.shape
    rows = jnp.arange(B)

    # top-k: per-row kth value; disabled rows get an -inf threshold
    sl = jnp.sort(logits, axis=-1)[..., ::-1]
    k = jnp.clip(bp.top_k, 1, V)
    kth = jnp.take_along_axis(sl, (k - 1)[:, None], axis=-1)
    k_on = jnp.logical_and(bp.top_k > 0, bp.top_k < V)[:, None]
    logits = jnp.where(jnp.logical_and(k_on, logits < kth), NEG, logits)

    # tail-free (sort again: the top-k mask changed the distribution)
    sl = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sl, axis=-1)
    d2 = jnp.abs(jnp.diff(jnp.diff(probs, axis=-1), axis=-1))
    d2 = d2 / jnp.maximum(d2.sum(-1, keepdims=True), 1e-12)
    keep = jnp.cumsum(d2, axis=-1) < bp.tfs_z[:, None]
    n_keep = jnp.maximum(keep.sum(-1) + 1, 1)
    cutoff = jnp.take_along_axis(sl, (n_keep - 1)[:, None], axis=-1)
    tfs_on = (bp.tfs_z < 1.0)[:, None]
    logits = jnp.where(jnp.logical_and(tfs_on, logits < cutoff), NEG, logits)

    # locally-typical
    probs = jax.nn.softmax(logits, axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ent = -jnp.sum(jnp.where(probs > 0, probs * logp, 0.0), -1,
                   keepdims=True)
    shift = jnp.abs(-logp - ent)
    order = jnp.argsort(shift, axis=-1)
    ps = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(ps, axis=-1)
    keep_sorted = (cum - ps) < bp.typical_p[:, None]
    keep = jnp.zeros_like(keep_sorted).at[rows[:, None], order].set(
        keep_sorted)
    typ_on = (bp.typical_p < 1.0)[:, None]
    logits = jnp.where(jnp.logical_and(typ_on, ~keep), NEG, logits)

    # top-p (nucleus); p >= 1 is naturally a no-op
    sl = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sl, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_sorted = (cum - probs) < jnp.minimum(bp.top_p, 1.0)[:, None]
    n_keep = jnp.maximum(keep_sorted.sum(-1), 1)
    cutoff = jnp.take_along_axis(sl, (n_keep - 1)[:, None], axis=-1)
    p_on = (bp.top_p < 1.0)[:, None]
    return jnp.where(jnp.logical_and(p_on, logits < cutoff), NEG, logits)


def sample_batched(logits: jnp.ndarray, key, bp: BatchedSamplingParams,
                   mu: jnp.ndarray, eos_ids: tuple = (),
                   prev_tokens: Optional[jnp.ndarray] = None,
                   prev_valid: Optional[jnp.ndarray] = None,
                   enable: tuple = ("filters", "mirostat")):
    """Heterogeneous batched sampling: the full reference pipeline with
    per-row parameters, one device dispatch, no [B, V] host fetch.

    Returns (token [B] i32, new mu [B] f32). Rows with ``mirostat != 0``
    route through the per-row mirostat samplers and update their mu;
    greedy rows take the penalized argmax; everything else runs the
    temperature → top-k → TFS → typical → top-p → categorical chain.
    ``eos_ids`` (static) are suppressed on rows where ``bp.mask_eos``
    (min-new-tokens).

    ``enable`` (static) prunes work no row needs — the CALLER knows the
    union of the batch's params: without "filters" every row is treated
    as greedy (skips 3 [B, V] sorts + 1 argsort); without "mirostat" the
    two mirostat samplers (another sort + top-k) are skipped and mu
    passes through. Penalties are skipped by passing prev_tokens=None.
    """
    logits = logits.astype(jnp.float32)
    B, V = logits.shape
    in_vocab = tuple(t for t in eos_ids if 0 <= t < V)
    if in_vocab:
        eos_mask = jnp.zeros((V,), bool).at[jnp.asarray(in_vocab)].set(True)
        logits = jnp.where(bp.mask_eos[:, None] & eos_mask[None, :], NEG,
                           logits)

    if prev_tokens is not None:
        if prev_valid is None:
            prev_valid = jnp.ones(prev_tokens.shape, bool)
        counts = token_counts(prev_tokens, prev_valid, V)
        seen = counts > 0
        rp = bp.repeat_penalty[:, None]
        pen = jnp.where(logits > 0, logits / rp, logits * rp)
        logits = jnp.where(seen & (rp != 1.0), pen, logits)
        logits = logits - counts * bp.frequency_penalty[:, None] \
            - seen.astype(logits.dtype) * bp.presence_penalty[:, None]

    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    tok, new_mu = greedy_tok, mu

    temp = jnp.maximum(bp.temperature, 1e-6)[:, None]
    scaled = logits / temp
    k1, k2, k3 = jax.random.split(key, 3)

    if "filters" in enable:
        plain = _categorical(k1, _rowwise_filters(scaled, bp))
        tok = jnp.where(bp.greedy, greedy_tok, plain)

    if "mirostat" in enable:
        # mirostat (per-row tau/eta/mu); both variants computed
        # branchlessly — B is small and the selects are trivial next to
        # the [B, V] sorts. The scalar helpers broadcast [B] eta/tau
        # cleanly; temperature=1 because ``scaled`` is already
        # temperature-divided.
        st = SamplerState(mu=mu)

        class _P:                  # per-row param view for the helpers
            temperature = 1.0
            mirostat_eta = bp.mirostat_eta
            mirostat_tau = bp.mirostat_tau
        m2_tok, m2_st = _mirostat_v2(scaled, k2, _P, st)
        m1_tok, m1_st = _mirostat_v1(scaled, k3, _P, st)
        tok = jnp.where(bp.mirostat == 2, m2_tok,
                        jnp.where(bp.mirostat == 1, m1_tok, tok))
        tok = jnp.where(bp.greedy, greedy_tok, tok)
        new_mu = jnp.where(bp.mirostat == 2, m2_st.mu,
                           jnp.where(bp.mirostat == 1, m1_st.mu, mu))
    return tok, new_mu


def _mirostat_v2(logits, key, params, state: SamplerState):
    """model_sample_token_mirostat_v2 (model_utils.cpp:896): truncate tokens
    with surprise > mu, sample, then mu -= eta * (surprise - tau)."""
    logits = logits / params.temperature
    logp = jax.nn.log_softmax(logits, axis=-1)
    surprise = -logp / jnp.log(2.0)                       # bits
    trunc = jnp.where(surprise > state.mu[:, None], NEG, logits)
    # keep at least the argmax
    best = jnp.argmax(logits, axis=-1)
    all_cut = jnp.all(trunc <= NEG / 2, axis=-1)
    trunc = jnp.where(all_cut[:, None],
                      jnp.where(jax.nn.one_hot(best, logits.shape[-1],
                                               dtype=bool), logits, NEG),
                      trunc)
    tok = _categorical(key, trunc)
    obs = jnp.take_along_axis(surprise, tok[:, None], axis=-1)[:, 0]
    mu = state.mu - params.mirostat_eta * (obs - params.mirostat_tau)
    return tok, SamplerState(mu=mu)


def _mirostat_v1(logits, key, params, state: SamplerState):
    """model_sample_token_mirostat (model_utils.cpp:858): estimate Zipf s
    over the top-100 probs, derive k from mu, then top-k sample + mu update."""
    logits = logits / params.temperature
    V = logits.shape[-1]
    m = min(100, V)
    top = jax.lax.top_k(logits, m)[0]
    probs = jax.nn.softmax(top, axis=-1)
    # s_hat: regression of log(p_i/p_{i+1}) on log((i+2)/(i+1))
    ti = jnp.log((jnp.arange(m - 1) + 2.0) / (jnp.arange(m - 1) + 1.0))
    bi = jnp.log(probs[..., :-1] / jnp.maximum(probs[..., 1:], 1e-30))
    s_hat = jnp.sum(ti * bi, -1) / jnp.sum(ti * ti)
    eps = s_hat - 1.0
    k = jnp.power((eps * jnp.power(2.0, state.mu)) /
                  (1 - jnp.power(float(V), -eps)), 1.0 / s_hat)
    k = jnp.clip(k, 1, V).astype(jnp.int32)              # [B]
    # per-row dynamic k: mask logits below the k-th value
    sorted_l = jnp.sort(logits, axis=-1)[..., ::-1]
    kth = jnp.take_along_axis(sorted_l, (k - 1)[:, None], axis=-1)
    trunc = jnp.where(logits < kth, NEG, logits)
    tok = _categorical(key, trunc)
    logp = jax.nn.log_softmax(logits, axis=-1)
    obs = -jnp.take_along_axis(logp, tok[:, None], axis=-1)[:, 0] / jnp.log(2.)
    mu = state.mu - params.mirostat_eta * (obs - params.mirostat_tau)
    return tok, SamplerState(mu=mu)
