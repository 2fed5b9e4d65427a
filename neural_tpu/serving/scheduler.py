"""Iteration-level continuous batching (ORCA-style).

TPU-native redesign of the reference serving stack
(neural_speed/models/model_utils/scheduler.{h,cpp}: ``Cont_batch_gen_scheduler``
FCFS admission + ``Cont_batch_gen_worker`` mixed prefill/decode steps +
``steps_decoding_for_next_prefill`` deferral, pool.h sequence pools).

Static-shape design for XLA: a fixed pool of B cache slots; prompts prefill
into ONE slot at a time with bucketed lengths (pad to the next bucket →
bounded compile count), decode advances ALL active slots in a single [B, 1]
step. The KV cache is one shared [L, B, Hkv, S, Dh] buffer; per-slot
lengths select valid keys via the attention mask.
"""
from __future__ import annotations

import dataclasses
import time
from collections import deque
from enum import Enum
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.transformer import forward
from ..runtime.kvcache import KVCache, init_cache
from ..runtime.paged import (PagedKVCache, PageAllocator, init_paged_cache,
                             pages_needed)
from ..runtime.sampling import (SamplingParams, SamplerState, sample,
                                batch_params, sample_batched)
from ..runtime.generate import prepare_params, sample_loop, pick_decode_blk


class SeqStatus(Enum):
    # reference: seq_status (pool.h:22)
    WAITING = 0
    PREFILL = 1
    DECODING = 2
    FINISHED = 3


@dataclasses.dataclass
class Sequence:
    """reference: sequence (pool.h:43)."""
    request_id: str
    prompt_ids: List[int]
    max_new_tokens: int = 128
    sampling: Optional[SamplingParams] = None   # per-request override
    status: SeqStatus = SeqStatus.WAITING
    slot: int = -1
    prefill_pos: int = 0   # tokens already prefilled (chunked prefill)
    chunk: Optional[int] = None  # this request's prefill chunk (None =
    #                              single-shot), set at admission
    output_ids: List[int] = dataclasses.field(default_factory=list)
    receive_time: float = dataclasses.field(default_factory=time.time)
    first_token_time: Optional[float] = None
    end_time: Optional[float] = None
    # beam-search requests (reference scheduler.cpp:99-148 runs beam steps
    # inside the continuous-batching worker; beam state model_utils.h:297)
    num_beams: int = 1
    length_penalty: float = 1.0
    min_new_tokens: int = 0
    beam: Optional["BeamGroup"] = None
    hypotheses: List[Tuple[List[int], float]] = \
        dataclasses.field(default_factory=list)  # (new_token_ids, score)


@dataclasses.dataclass
class BeamGroup:
    """Host-side beam bookkeeping for one in-scheduler beam request.

    The W beams live in W *contiguous* cache slots [base, base+W); the
    per-step KV reorder is then one sliced gather over those rows only
    (reference beam_search_kv_cache_reorder, model_utils.h:423, rewrites
    the beams' KV blocks the same way)."""
    width: int
    base: int                         # first slot of the contiguous block
    beams: List[List[int]]            # full token ids per live beam row
    scores: np.ndarray                # cumulative log-probs [W]
    alive: np.ndarray                 # bool [W]
    done: List[Tuple[List[int], float]]  # finished (ids, penalized score)
    step: int = 0                     # generated tokens so far


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds max bucket {buckets[-1]}")


def _penalty_hist(rows, B: int, RL: int):
    """Repetition-penalty history for a batch of rows.

    ``rows``: iterable of (row_index, Sequence, repeat_last_n). Returns
    right-aligned (hist [B, RL] int32, valid [B, RL] bool) over each
    sequence's last min(rl, RL) prompt+output tokens — the ONE builder
    behind _sample_many / _decode_block_step / _decode_sample_step
    (three hand-rolled copies diverged in round 5's review)."""
    hist = np.zeros((B, max(RL, 1)), np.int32)
    valid = np.zeros((B, max(RL, 1)), bool)
    for r, seq, rl in rows:
        t = (seq.prompt_ids + seq.output_ids)[-min(rl, RL):] if rl > 0 else []
        if t:
            hist[r, -len(t):] = t
            valid[r, -len(t):] = True
    return hist, valid


@partial(jax.jit, static_argnames=("cfg", "T"), donate_argnums=(2,))
def _prefill_slot(params, tokens, cache: KVCache, slot, start, plen,
                  cfg: ModelConfig, T: int):
    """Prefill one CHUNK of a sequence into cache slot ``slot``. tokens
    [1, T] padded on the RIGHT, written at cache offset ``start`` [1]
    (0 for single-shot prefill, the chunk offset under chunked prefill);
    ``plen`` [1] is the full prompt length (prefix-LM mask bound). Returns
    the chunk's logits and the updated cache. Writes only slot rows
    (batch-sliced views keep other slots intact)."""
    params = prepare_params(params)
    sub = KVCache(*(None if c is None else
                    jax.lax.dynamic_slice_in_dim(c, slot, 1, axis=1)
                    for c in cache))
    logits, sub = forward(params, tokens, start, sub, cfg, prompt_len=plen)
    cache = KVCache(*(None if c is None else
                      jax.lax.dynamic_update_slice_in_dim(c, s, slot, axis=1)
                      for c, s in zip(cache, sub)))
    return logits, cache


@partial(jax.jit, static_argnames=("cfg", "T"), donate_argnums=(2,))
def _prefill_slot_paged(params, tokens, cache: PagedKVCache, slot, start,
                        plen, cfg: ModelConfig, T: int):
    """Paged prefill chunk: the page POOL is shared, so only the table row
    is sliced to batch 1 — writes land in this slot's reserved pages."""
    params = prepare_params(params)
    sub = PagedKVCache(cache.k, cache.v, cache.k_scale, cache.v_scale,
                       jax.lax.dynamic_slice_in_dim(cache.table, slot, 1, 0))
    logits, sub = forward(params, tokens, start, sub, cfg, prompt_len=plen)
    return logits, PagedKVCache(sub.k, sub.v, sub.k_scale, sub.v_scale,
                                cache.table)


@partial(jax.jit, static_argnames=("cfg", "n_keep", "n_discard"),
         donate_argnums=(0,))
def _shift_slot(cache: KVCache, inv_freqs, slot, cfg: ModelConfig,
                n_keep: int, n_discard: int):
    """StreamingLLM compact-and-rotate for ONE slot row (reference ring-full
    shift-RoPE, llama.cpp:106-109 / mha_dense.h:142 — per-sequence, since
    slots fill at different rates)."""
    from ..runtime.streaming import shift_cache_impl
    sub = KVCache(*(None if c is None else
                    jax.lax.dynamic_slice_in_dim(c, slot, 1, axis=1)
                    for c in cache))
    sub = shift_cache_impl(sub, inv_freqs, cfg, n_keep, n_discard)
    return KVCache(*(None if c is None else
                     jax.lax.dynamic_update_slice_in_dim(c, s, slot, axis=1)
                     for c, s in zip(cache, sub)))


@partial(jax.jit, static_argnames=("W",), donate_argnums=(0,))
def _bcast_rows(cache: KVCache, base, W: int):
    """Replicate slot ``base``'s KV into slots [base, base+W): a beam
    request's W rows all start from the shared prompt KV."""
    def f(c):
        if c is None:
            return None
        row = jax.lax.dynamic_slice_in_dim(c, base, 1, axis=1)
        rows = jnp.broadcast_to(row, row.shape[:1] + (W,) + row.shape[2:])
        return jax.lax.dynamic_update_slice_in_dim(c, rows, base, axis=1)
    return KVCache(*(f(c) for c in cache))


@partial(jax.jit, donate_argnums=(0,))
def _copy_pages(cache: PagedKVCache, src, dst):
    """Copy page CONTENTS pool[src[i]] → pool[dst[i]] across the k/v (and
    scale) pools. The paged-mode analog of both _bcast_rows (beam prompt
    share) and _reorder_rows (beam KV reorder): in paged mode a slot's KV
    lives in its table row's pages, so replicating/reordering beams is a
    page-content copy over the pool's page axis (reference
    beam_search_kv_cache_reorder against the packed cache,
    model_utils.h:423)."""
    def f(c):
        if c is None:
            return None
        return c.at[:, dst].set(c[:, src])
    return PagedKVCache(*(f(c) for c in cache[:4]), cache.table)


@partial(jax.jit, static_argnames=("W",), donate_argnums=(0,))
def _reorder_rows(cache: KVCache, base, parents, W: int):
    """Beam KV reorder restricted to the group's contiguous rows
    (reference beam_search_kv_cache_reorder). Skipped host-side when
    parents is the identity (the common steady state)."""
    def f(c):
        if c is None:
            return None
        rows = jax.lax.dynamic_slice_in_dim(c, base, W, axis=1)
        rows = jnp.take(rows, parents, axis=1)
        return jax.lax.dynamic_update_slice_in_dim(c, rows, base, axis=1)
    return KVCache(*(f(c) for c in cache))


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3,))
def _decode_all(params, tokens, lengths, cache, cfg: ModelConfig,
                prompt_len=None):
    """One decode step for every slot: tokens [B, 1] at offsets lengths [B].
    Inactive slots still compute (static shapes) — their outputs are ignored
    and their cache rows overwritten on next prefill. ``prompt_len`` [B]:
    per-slot prompt sizes (prefix-LM archs' GLM RoPE anchor)."""
    params = prepare_params(params)
    logits, cache = forward(params, tokens, lengths, cache, cfg,
                            prompt_len=prompt_len)
    return logits[:, -1], cache


@partial(jax.jit, static_argnames=("cfg", "eos_ids", "enable"),
         donate_argnums=(3,))
def _decode_sample_all(params, tokens, lengths, cache, key, bp, mu, hist,
                       valid, cfg: ModelConfig, eos_ids: tuple,
                       enable: tuple, prompt_len=None):
    """One decode step PLUS heterogeneous batched sampling in a single
    executable: per-request SamplingParams ride as [B] device arrays
    (sampling.batch_params) and only [B] token ids (+ mirostat mu) ever
    leave the device — the [B, V] logits never do. This is the analog of
    the reference's batched post-process (model_utils.h:533-536): its
    server loop also fetches tokens, not logits (main_pybind.cpp:209-220).
    On the tunneled runtime the [B, 32000] f32 fetch alone was the
    difference between 131-150 tok/s served and 905+ on-device."""
    params = prepare_params(params)
    logits, cache = forward(params, tokens, lengths, cache, cfg,
                            prompt_len=prompt_len)
    tok, mu = sample_batched(logits[:, -1], key, bp, mu, eos_ids,
                             prev_tokens=hist, prev_valid=valid,
                             enable=enable)
    return tok, mu, cache


class Scheduler:
    """FCFS continuous-batching scheduler (reference scheduler.cpp:278).

    Usage: add_request(...) any time; step() runs one iteration (one
    prefill admission OR one batched decode); poll finished sequences
    with pop_finished().
    """

    def __init__(self, params, cfg: ModelConfig, max_batch: int = 8,
                 max_len: int = 2048,
                 sampling: Optional[SamplingParams] = None,
                 kv_dtype=jnp.bfloat16, seed: int = 0,
                 prefill_buckets: Sequence[int] = (32, 64, 128, 256, 512,
                                                  1024, 2048),
                 kv_mode: str = "slots", page_size: int = 256,
                 n_pages: Optional[int] = None,
                 prefill_chunk: Optional[int] = 512,
                 streaming: bool = False, n_keep: int = 4,
                 n_discard: Optional[int] = None,
                 decode_block: int = 1, donate_params: bool = True):
        """``kv_mode="paged"``: shared page pool + per-slot page tables
        (runtime/paged.py). ``n_pages`` sizes the pool below worst case
        (default batch·max_len/page_size); admission defers when the pool
        can't cover a request's prompt+max_new reservation.

        ``prefill_chunk``: long prompts prefill in chunks of this many
        tokens, with a batched decode step interleaved after every chunk —
        the mixed prefill+decode iteration of the reference worker
        (scheduler.cpp:55-98) under static shapes. Bounds the decode-latency
        spike a long prompt can inject to one chunk's prefill time. None =
        single-shot prefill (and forced for prefix-LM archs, whose
        bidirectional prompt mask can't be built a chunk at a time).

        ``streaming=True``: StreamingLLM per-slot infinite inference —
        when a slot's KV fills, keep ``n_keep`` sink tokens, drop
        ``n_discard`` (default half the non-sink window) and shift-RoPE
        the rest down (reference shift_roped_k serving path); requests may
        then generate beyond max_len. Slots mode only.

        ``decode_block > 1``: when nothing can be admitted (pool full or
        queue empty) and every running request shares one SamplingParams,
        decode advances ``decode_block`` tokens per scheduler iteration in
        ONE on-device sample_loop dispatch — sampling (penalties included)
        runs on-device, so the host pays one round trip per block instead
        of per token. Tokens a request generates past its EOS /
        max_new_tokens within a block are discarded (its freed cache rows
        are overwritten by the next prefill). Greedy outputs are identical
        to decode_block=1; sampled outputs draw the same distribution from
        a different key stream."""
        # automatic weight residency for the serving shape (batch ×
        # max_len × kv dtype): packed + in-jit conversion when it fits,
        # native-at-rest when the double residency would OOM (the batch-8
        # serving config on one 16 GB chip) — runtime.residency policy,
        # NTPU_NATIVE_AT_REST=1/0 still forces. donate_params=True
        # (default) lets the conversion FREE the packed source as it
        # streams — without it a native conversion keeps BOTH trees
        # resident, recreating the exact OOM the policy avoids. Pass
        # donate_params=False only to share one packed tree across
        # schedulers at shapes that stay packed.
        from ..runtime.residency import ensure_decode_residency
        params = ensure_decode_residency(params, cfg, max_batch, max_len,
                                         kv_dtype, donate=donate_params)
        self.params = params
        self.cfg = cfg
        self.max_batch = max_batch
        self.max_len = max_len
        self.sampling = sampling or SamplingParams(greedy=True)
        self.kv_mode = kv_mode
        if kv_mode == "paged":
            self.page_size = page_size
            self.cache = init_paged_cache(cfg, max_batch, max_len, n_pages,
                                          page_size, kv_dtype)
            self.maxp = max_len // page_size
            # last page = trash: inactive slots' table rows point there, so
            # their (ignored, static-shape) decode writes can never alias a
            # live sequence's pages
            self._trash_page = self.cache.n_pages - 1
            self.allocator = PageAllocator(self.cache.n_pages - 1)
            self.table_np = np.full((max_batch, self.maxp),
                                    self._trash_page, np.int32)
            self.slot_pages: Dict[int, List[int]] = {}
            self._table_dirty = True
        else:
            self.cache = init_cache(cfg, max_batch, max_len, kv_dtype)
        self.lengths = np.zeros(max_batch, np.int64)
        self.prompt_lens = np.zeros(max_batch, np.int64)
        self.buckets = [b for b in prefill_buckets if b <= max_len]
        if not self.buckets or self.buckets[-1] < max_len:
            # terminal bucket = the cache itself, so single-shot prefill
            # can hold any admissible prompt (T <= max_len)
            self.buckets.append(max_len)
        if cfg.prefix_lm or cfg.rope_style == "glm1":
            prefill_chunk = None   # prefix mask needs the whole prompt
        if prefill_chunk is not None and kv_mode == "paged":
            # paged multi-token writes stream whole pages, so chunks must
            # begin page-aligned (paged_update_kv's T>1 path)
            prefill_chunk = -(-prefill_chunk // page_size) * page_size
        if prefill_chunk is not None:
            # chunk sizes must be bucket members to bound compile count
            fit = [b for b in self.buckets
                   if b >= min(prefill_chunk, self.buckets[-1])]
            prefill_chunk = min(fit) if fit else None
            if kv_mode == "paged" and prefill_chunk is not None \
                    and prefill_chunk % page_size:
                prefill_chunk = None   # no aligned bucket → single-shot
        self.prefill_chunk = prefill_chunk
        self._prefilling: Optional[Sequence] = None
        self.streaming = streaming
        if streaming:
            assert kv_mode == "slots", "streaming requires kv_mode='slots'"
            self.n_keep = n_keep
            self.n_discard = n_discard or (max_len - n_keep) // 2
            self.inv_freqs = params.get("rope_inv_freqs")
        self.waiting: deque[Sequence] = deque()
        self.running: Dict[int, Sequence] = {}     # slot → seq
        self.finished: List[Sequence] = []
        self.free_slots = list(range(max_batch))[::-1]
        self.key = jax.random.PRNGKey(seed)
        # per-SLOT mirostat mu, persisted across tokens. Re-initialized to
        # 2*tau by _reset_mu at every slot assignment (_begin_prefill /
        # _prefill_beam) — a reused slot must not inherit the previous
        # request's converged mu, and a per-request mirostat_tau needs its
        # own 2*tau start (round-4 review finding).
        self._mu = np.full(max_batch, 2.0 * self.sampling.mirostat_tau,
                           np.float32)
        self._next_tokens = np.zeros(max_batch, np.int64)
        self.decode_block = max(1, decode_block)
        self.steps_decoding_for_next_prefill = 0  # reference scheduler.cpp:355

    # -- client API ---------------------------------------------------------
    def add_request(self, request_id: str, prompt_ids: Sequence[int],
                    max_new_tokens: int = 128,
                    sampling: Optional[SamplingParams] = None,
                    num_beams: int = 1, length_penalty: float = 1.0,
                    min_new_tokens: int = 0):
        """``sampling`` overrides the scheduler default for this request
        (reference: per-query generation config in Query). ``num_beams > 1``
        runs beam search *inside* the batched scheduler step (reference
        scheduler.cpp:99-148): the request takes num_beams cache slots and
        its result is the best length-penalized hypothesis."""
        if self.streaming:
            assert len(prompt_ids) < self.max_len, \
                "prompt must fit in the cache"
        else:
            assert len(prompt_ids) + max_new_tokens <= self.max_len, \
                "request exceeds max_len"
        if num_beams > 1:
            assert num_beams <= self.max_batch, "num_beams exceeds slot pool"
        if self.kv_mode == "paged":
            # reject requests the pool can NEVER satisfy — otherwise
            # admission defers forever and run_to_completion() livelocks.
            # Must use the SAME worst-case formula as _can_admit /
            # _begin_prefill (bucket pad included): a request that passes a
            # smaller check here but never satisfies admission would still
            # livelock (round-4 review finding).
            need = self._pages_required(len(prompt_ids), max_new_tokens,
                                        num_beams)
            cap = self.cache.n_pages - 1
            if need > cap:
                raise ValueError(
                    f"request needs {need} pages but the pool holds {cap} "
                    f"(n_pages={self.cache.n_pages}, page_size="
                    f"{self.page_size}); raise n_pages or lower "
                    "max_new_tokens")
        self.waiting.append(Sequence(request_id, list(prompt_ids),
                                     max_new_tokens, sampling,
                                     num_beams=num_beams,
                                     length_penalty=length_penalty,
                                     min_new_tokens=min_new_tokens))

    def pop_finished(self) -> List[Sequence]:
        out, self.finished = self.finished, []
        return out

    @property
    def has_work(self) -> bool:
        return bool(self.waiting or self.running
                    or self._prefilling is not None)

    # -- one scheduling iteration (reference scheduler.cpp:369 step) --------
    def _find_contiguous(self, W: int) -> Optional[int]:
        """Base of a run of W contiguous free slots, or None."""
        free = sorted(self.free_slots)
        run = 1
        for i in range(1, len(free)):
            run = run + 1 if free[i] == free[i - 1] + 1 else 1
            if run == W:
                return free[i] - W + 1
        return free[0] if W == 1 and free else None

    def _chunk_for(self, T: int) -> Optional[int]:
        """The prefill chunk a T-token prompt would get (None=single-shot);
        the T-only core of _seq_chunk, shared with the page math."""
        chunk = self.prefill_chunk
        if chunk is None:
            return None
        for b in range(0, T, chunk):
            e = min(b + chunk, T)
            if b + _bucket(e - b, self.buckets) > self.max_len:
                return None
        return chunk

    def _pad_end(self, T: int) -> int:
        """Furthest padded cache offset a T-token prompt's prefill writes:
        the last chunk's bucket pad end (== bucket(T) when single-shot).
        Always <= max_len (_chunk_for falls back to single-shot when a
        chunk's pad would cross it)."""
        chunk = self._chunk_for(T)
        if chunk is None or T == 0:
            return _bucket(max(T, 1), self.buckets)
        last_b = ((T - 1) // chunk) * chunk
        return last_b + _bucket(T - last_b, self.buckets)

    def _pages_required(self, T: int, max_new_tokens: int,
                        num_beams: int) -> int:
        """Worst-case page reservation for a request: prompt+max_new or the
        prefill's furthest PAD offset (chunk-aware — with non-doubling
        buckets the last chunk's pad can exceed bucket(T)), whichever is
        larger, capped at the per-slot table size, per beam. Shared by
        add_request's never-fits rejection, _can_admit, and
        _begin_prefill so the gates can never disagree (beam prefill is
        single-shot; its bucket(T) pad is <= this bound)."""
        per_beam = min(pages_needed(max(T + max_new_tokens,
                                        self._pad_end(T)),
                                    self.page_size), self.maxp)
        return per_beam * max(num_beams, 1)

    def _can_admit(self, seq: Sequence) -> bool:
        if not self.free_slots:
            return False
        if seq.num_beams > 1 and \
                self._find_contiguous(seq.num_beams) is None:
            return False
        if self.kv_mode != "paged":
            return True
        need = self._pages_required(len(seq.prompt_ids), seq.max_new_tokens,
                                    seq.num_beams)
        return self.allocator.n_free >= need

    def _flush_table(self):
        """Rebuild the device page table from table_np if dirty (paged KV).
        One definition — a missed refresh site decodes against a stale
        table (round-4 review: this block was copy-pasted four times)."""
        if self.kv_mode == "paged" and self._table_dirty:
            self.cache = PagedKVCache(*self.cache[:4],
                                      jnp.asarray(self.table_np))
            self._table_dirty = False

    def step(self):
        """One mixed iteration: at most one prefill CHUNK plus one batched
        decode step for all running slots (reference mixed prefill+decode
        inputs, scheduler.cpp:55-98). Decodes advance every iteration, so
        the decode-latency spike from an arriving long prompt is bounded
        by one chunk's prefill time rather than the whole prompt's."""
        # admit one waiting request if no prefill is mid-flight, a slot
        # (and, paged, enough pages) is free, and we are not in a forced
        # decode-only phase (prefill-defer)
        if (self._prefilling is None and self.waiting
                and self._can_admit(self.waiting[0])
                and self.steps_decoding_for_next_prefill == 0):
            seq = self.waiting.popleft()
            if seq.num_beams > 1:
                self._prefill_beam(seq)   # beam prefill is single-shot
            else:
                self._begin_prefill(seq)
        if self._prefilling is not None:
            self._prefill_chunk_step()
        if self.running:
            self._decode_step()
            if self.steps_decoding_for_next_prefill > 0:
                self.steps_decoding_for_next_prefill -= 1
        if self.waiting and not self._can_admit(self.waiting[0]):
            # pool full (slots or pages): decode-only until capacity frees
            self.steps_decoding_for_next_prefill = max(
                1, self.steps_decoding_for_next_prefill)

    def run_to_completion(self):
        while self.has_work:
            self.step()
        return self.pop_finished()

    # -- internals ----------------------------------------------------------
    def _plens(self):
        """Per-slot prompt lengths for prefix-LM archs; None elsewhere."""
        if self.cfg.prefix_lm or self.cfg.rope_style == "glm1":
            return jnp.asarray(self.prompt_lens.astype(np.int32))
        return None

    def _min_tokens_mask(self, logits_row, seq: Sequence):
        """-inf the EOS logit until min_new_tokens is met (the non-beam
        analog of the beam path's lines; reference logits_processor
        min-new-tokens, model_utils.h:404)."""
        if len(seq.output_ids) < seq.min_new_tokens:
            logits_row = jnp.asarray(logits_row).at[
                jnp.asarray(self.cfg.eos_token_ids)].set(-np.inf)
        return logits_row

    def _sample_one(self, logits_row, seq: Sequence):
        sp = seq.sampling or self.sampling
        self.key, sub = jax.random.split(self.key)
        logits_row = self._min_tokens_mask(logits_row, seq)
        st = SamplerState(mu=jnp.asarray([self._mu[seq.slot]])) \
            if sp.mirostat else None
        if sp.repeat_last_n <= 0:  # 0 disables penalties (llama.cpp conv.)
            tok, st2 = sample(logits_row[None], sub, sp, st)
        else:
            hist = (seq.prompt_ids + seq.output_ids)[-sp.repeat_last_n:]
            tok, st2 = sample(logits_row[None], sub, sp, st,
                              prev_tokens=jnp.asarray([hist], jnp.int32))
        if sp.mirostat:
            self._mu[seq.slot] = float(st2.mu[0])
        return int(tok[0])

    def _sample_many(self, logits: np.ndarray, seqs: List[Sequence]):
        """Sample every slot with ONE device call per distinct
        SamplingParams (usually one). Per-slot sample() calls cost a
        blocking host↔device round trip each — measured 12 tok/s aggregate
        vs the decode step itself at ~6 ms on the tunneled runtime."""
        toks = np.zeros(len(seqs), np.int64)
        logits = np.array(logits, np.float32, copy=True)
        for i, seq in enumerate(seqs):   # min-new-tokens EOS suppression
            if len(seq.output_ids) < seq.min_new_tokens:
                logits[i, list(self.cfg.eos_token_ids)] = -np.inf
        groups: Dict[SamplingParams, List[int]] = {}
        for i, seq in enumerate(seqs):
            groups.setdefault(seq.sampling or self.sampling, []).append(i)
        for sp, idxs in groups.items():
            self.key, sub = jax.random.split(self.key)
            st = SamplerState(mu=jnp.asarray(
                self._mu[[seqs[i].slot for i in idxs]])) \
                if sp.mirostat else None
            rl = sp.repeat_last_n
            if rl <= 0:  # 0 disables penalties (llama.cpp convention)
                t, st2 = sample(jnp.asarray(logits[idxs]), sub, sp, st)
            else:
                hist, valid = _penalty_hist(
                    ((j, seqs[i], rl) for j, i in enumerate(idxs)),
                    len(idxs), rl)
                t, st2 = sample(jnp.asarray(logits[idxs]), sub, sp, st,
                                prev_tokens=jnp.asarray(hist),
                                prev_valid=jnp.asarray(valid))
            t = np.asarray(t)
            if sp.mirostat:
                mu = np.asarray(st2.mu)
                for j, i in enumerate(idxs):
                    self._mu[seqs[i].slot] = mu[j]
            for j, i in enumerate(idxs):
                toks[i] = int(t[j])
        return toks

    # -- in-scheduler beam search (reference scheduler.cpp:99-148) ----------
    @staticmethod
    def _lp(n_new: int, penalty: float) -> float:
        # length-penalty divisor (reference logits_processor model_utils.h:404)
        return max(n_new, 1) ** penalty

    def _prefill_beam(self, seq: Sequence):
        W = seq.num_beams
        base = self._find_contiguous(W)
        for s in range(base, base + W):
            self.free_slots.remove(s)
        self._reset_mu(seq, range(base, base + W))
        T = len(seq.prompt_ids)
        Tb = _bucket(T, self.buckets)
        toks = np.zeros((1, Tb), np.int32)
        toks[0, :T] = seq.prompt_ids
        if self.kv_mode == "paged":
            # every beam row owns its pages exclusively (no refcounting);
            # prompt sharing and KV reorder are page-content copies
            need = min(pages_needed(max(T + seq.max_new_tokens, Tb),
                                    self.page_size), self.maxp)
            for s in range(base, base + W):
                pages = self.allocator.alloc(need)
                assert pages is not None, "admission gate guarantees pages"
                self.slot_pages[s] = pages
                self.table_np[s, :] = self._trash_page
                self.table_np[s, :need] = pages
            self._table_dirty = True
            self._flush_table()
            logits, self.cache = _prefill_slot_paged(
                self.params, jnp.asarray(toks), self.cache, jnp.int32(base),
                jnp.zeros((1,), jnp.int32), jnp.asarray([T], jnp.int32),
                self.cfg, Tb)
            # replicate the prompt KV into the other beams' pages
            if W > 1:
                src = np.concatenate(
                    [self.slot_pages[base]] * (W - 1)).astype(np.int32)
                dst = np.concatenate(
                    [self.slot_pages[base + w] for w in range(1, W)]
                ).astype(np.int32)
                self.cache = _copy_pages(self.cache, jnp.asarray(src),
                                         jnp.asarray(dst))
        else:
            logits, self.cache = _prefill_slot(
                self.params, jnp.asarray(toks), self.cache, jnp.int32(base),
                jnp.zeros((1,), jnp.int32), jnp.asarray([T], jnp.int32),
                self.cfg, Tb)
            # all W beams share the prompt KV
            self.cache = _bcast_rows(self.cache, jnp.int32(base), W)
        row = np.asarray(logits[0, T - 1], np.float32)
        logp0 = row - row.max()
        logp0 -= np.log(np.exp(logp0).sum())
        if seq.min_new_tokens > 0:
            logp0[list(self.cfg.eos_token_ids)] = -1e30
        top = np.argsort(-logp0)[:W]
        beams = [seq.prompt_ids + [int(t)] for t in top]
        scores = logp0[top].astype(np.float64)
        alive = np.ones(W, bool)
        done: List[Tuple[List[int], float]] = []
        for w in range(W):
            if beams[w][-1] in self.cfg.eos_token_ids and seq.min_new_tokens <= 1:
                done.append((beams[w], scores[w] / self._lp(
                    1, seq.length_penalty)))
                alive[w] = False
                scores[w] = -1e30
        seq.beam = BeamGroup(W, base, beams, scores, alive, done, step=1)
        for w in range(W):
            self.lengths[base + w] = T
            self.prompt_lens[base + w] = T
            self._next_tokens[base + w] = beams[w][-1]
            self.running[base + w] = seq
        seq.first_token_time = time.time()
        seq.status = SeqStatus.DECODING
        seq.slot = base
        if seq.max_new_tokens <= 1 or not alive.any():
            self._finish_beam(seq)

    def _beam_advance(self, seq: Sequence, logits: np.ndarray):
        """One joint top-k expansion + KV reorder for a beam group, from the
        batched decode step's logits (host-side analog of
        runtime/beam.py::_beam_step)."""
        g = seq.beam
        W, base = g.width, g.base
        rows = logits[base:base + W].astype(np.float64)
        rows -= rows.max(axis=-1, keepdims=True)
        rows -= np.log(np.exp(rows).sum(axis=-1, keepdims=True))
        if g.step + 1 <= seq.min_new_tokens:
            rows[:, list(self.cfg.eos_token_ids)] = -1e30
        rows[~g.alive] = -1e30          # dead beams must not spawn
        total = (g.scores[:, None] + rows).ravel()
        V = rows.shape[-1]
        top = np.argpartition(-total, W - 1)[:W]
        top = top[np.argsort(-total[top])]
        parents = (top // V).astype(np.int32)
        toks = (top % V).astype(np.int32)
        new_scores = total[top]

        if not np.array_equal(parents, np.arange(W)):
            if self.kv_mode == "paged":
                # page-content reorder: rows keep their pages; contents
                # copy from the parent's used pages (incl. the token just
                # written at offset lengths, hence the +1)
                used = pages_needed(int(self.lengths[base]) + 1,
                                    self.page_size)
                src, dst = [], []
                for w in range(W):
                    p = int(parents[w])
                    if p == w:
                        continue
                    src += self.slot_pages[base + p][:used]
                    dst += self.slot_pages[base + w][:used]
                self.cache = _copy_pages(
                    self.cache, jnp.asarray(np.asarray(src, np.int32)),
                    jnp.asarray(np.asarray(dst, np.int32)))
            else:
                self.cache = _reorder_rows(self.cache, jnp.int32(base),
                                           jnp.asarray(parents), W)
        g.step += 1
        new_beams, new_alive = [], np.ones(W, bool)
        for w in range(W):
            ids = g.beams[parents[w]] + [int(toks[w])]
            new_beams.append(ids)
            if int(toks[w]) in self.cfg.eos_token_ids:
                g.done.append((ids, new_scores[w] / self._lp(
                    g.step, seq.length_penalty)))
                new_alive[w] = False
                new_scores[w] = -1e30
            self.lengths[base + w] += 1
            self._next_tokens[base + w] = int(toks[w])
        g.beams, g.scores, g.alive = new_beams, new_scores, new_alive

        finish = (not g.alive.any() or g.step >= seq.max_new_tokens
                  or self.lengths[base] + 1 >= self.max_len)
        if not finish and len(g.done) >= W:
            # HF early stop: best possible remaining score can't beat the
            # worst kept hypothesis (runtime/beam.py:129)
            best_alive = g.scores[g.alive].max() if g.alive.any() else -np.inf
            worst_done = sorted(g.done, key=lambda h: -h[1])[W - 1][1]
            if best_alive / self._lp(seq.max_new_tokens,
                                     seq.length_penalty) < worst_done:
                finish = True
        if finish:
            self._finish_beam(seq)

    def _finish_beam(self, seq: Sequence):
        g = seq.beam
        T = len(seq.prompt_ids)
        done = list(g.done)
        for w in range(g.width):
            if g.alive[w]:
                done.append((g.beams[w], g.scores[w] / self._lp(
                    len(g.beams[w]) - T, seq.length_penalty)))
        done.sort(key=lambda h: -h[1])
        seq.hypotheses = [(ids[T:], float(s)) for ids, s in done[:g.width]]
        seq.output_ids = list(seq.hypotheses[0][0])
        seq.status = SeqStatus.FINISHED
        seq.end_time = time.time()
        self.finished.append(seq)
        for s in range(g.base, g.base + g.width):
            self.running.pop(s, None)
            self.free_slots.append(s)
            self.lengths[s] = 0
            if self.kv_mode == "paged" and s in self.slot_pages:
                self.allocator.release(self.slot_pages.pop(s))
                self.table_np[s, :] = self._trash_page
                self._table_dirty = True

    def _seq_chunk(self, seq: Sequence) -> Optional[int]:
        """Per-request prefill chunk; None = single-shot. Falls back to
        single-shot when any chunk's bucket pad would cross max_len: a
        crossing dynamic_update_slice would CLAMP its offset and silently
        shift the chunk over earlier real keys (and a paged table would
        index past its last page). Single-shot is always safe: bucket(T)
        <= max_len by construction."""
        return self._chunk_for(len(seq.prompt_ids))

    def _chunk_bounds(self, seq: Sequence) -> List[Tuple[int, int]]:
        """[(begin, end)) chunk spans for this request's prompt."""
        T = len(seq.prompt_ids)
        chunk = seq.chunk or T
        return [(b, min(b + chunk, T)) for b in range(0, T, chunk)] \
            or [(0, 0)]

    def _reset_mu(self, seq: Sequence, slots):
        """Fresh mirostat state for newly assigned slot(s)."""
        tau = (seq.sampling or self.sampling).mirostat_tau
        for s in ([slots] if isinstance(slots, (int, np.integer)) else slots):
            self._mu[int(s)] = 2.0 * tau

    def _begin_prefill(self, seq: Sequence):
        slot = self.free_slots.pop()
        seq.slot = slot
        self._reset_mu(seq, slot)
        seq.status = SeqStatus.PREFILL
        seq.prefill_pos = 0
        seq.chunk = self._seq_chunk(seq)
        T = len(seq.prompt_ids)
        if self.kv_mode == "paged":
            # reserve prompt+max_new worst case up front → decode never
            # OOMs mid-sequence (preemption-free policy). Each bucketed
            # chunk writes pad keys up to its bucket end, so the furthest
            # padded offset must be reserved too (those keys are masked,
            # but must not alias other slots' pages). SAME formula as the
            # admission gates (_pages_required) — a reservation larger
            # than admission checked would fire the assert below.
            need = self._pages_required(T, seq.max_new_tokens, 1)
            pages = self.allocator.alloc(need)
            assert pages is not None, "admission gate guarantees pages"
            self.slot_pages[slot] = pages
            self.table_np[slot, :] = self._trash_page
            self.table_np[slot, :need] = pages
            self._table_dirty = True
        self._prefilling = seq

    def _prefill_chunk_step(self):
        """Advance the in-flight prefill by one chunk; on the last chunk,
        sample the first token and move the sequence to DECODING.

        Invariant for the pad tail: a chunk [begin, end) is padded to
        ``begin + Tb``; offsets in [end, begin+Tb) hold garbage keys, but
        lengths[slot] stays <= end, so attention (bounded by the per-row
        length) never reads them, and each one is overwritten when real
        tokens (next chunk or decode) reach its offset."""
        seq = self._prefilling
        slot = seq.slot
        T = len(seq.prompt_ids)
        begin = seq.prefill_pos
        end = min(begin + (seq.chunk or T), T)
        n = end - begin
        Tb = _bucket(n, self.buckets)
        assert begin + Tb <= self.max_len, "guarded by _seq_chunk"
        toks = np.zeros((1, Tb), np.int32)
        toks[0, :n] = seq.prompt_ids[begin:end]
        self._flush_table()   # BEFORE building args: a stale (donated)
        #                       cache in the tuple would be silently wrong
        args = (self.params, jnp.asarray(toks), self.cache, jnp.int32(slot),
                jnp.asarray([begin], jnp.int32), jnp.asarray([T], jnp.int32),
                self.cfg, Tb)
        if self.kv_mode == "paged":
            logits, self.cache = _prefill_slot_paged(*args)
        else:
            logits, self.cache = _prefill_slot(*args)
        seq.prefill_pos = end
        self.lengths[slot] = end
        if end < T:
            return
        self._prefilling = None
        self.prompt_lens[slot] = T
        tok = self._sample_one(logits[0, n - 1], seq)
        seq.output_ids.append(tok)
        seq.first_token_time = time.time()
        seq.status = SeqStatus.DECODING
        self.running[slot] = seq
        self._next_tokens[slot] = tok
        self._maybe_finish(seq)

    def _decode_block_step(self, sp: SamplingParams, k: int):
        """k decode steps in ONE on-device sample_loop dispatch (sampling
        incl. penalties on-device); host post-processes the [k, B] token
        block. Engaged by step() when nothing can be admitted and all
        running requests share ``sp``."""
        active = list(self.running.items())
        # per-row capacity: a block writes k cache rows at lengths..+k
        room = min(self.max_len - int(self.lengths[s]) for s, _ in active)
        if room < k:
            k = 1   # boundary: fall back (keeps compile count at two)
        cfg = pick_decode_blk(self.cfg, int(self.lengths.max()) + k)
        rl = max(sp.repeat_last_n, 0)
        hist, valid = _penalty_hist(
            ((slot, seq, rl) for slot, seq in active), self.max_batch, rl)
        self.key, sub = jax.random.split(self.key)
        toks, self.cache = sample_loop(
            self.params, jnp.asarray(self._next_tokens[:, None], jnp.int32),
            jnp.asarray(self.lengths.astype(np.int32)), self.cache, cfg, k,
            sp, sub, jnp.asarray(hist), jnp.asarray(valid),
            prompt_len=self._plens())
        toks = np.asarray(toks)                        # [k, B]
        for slot, seq in active:
            for i in range(k):
                t = int(toks[i, slot])
                seq.output_ids.append(t)
                self.lengths[slot] += 1
                self._next_tokens[slot] = t
                self._maybe_finish(seq)
                if seq.status == SeqStatus.FINISHED:
                    break   # tokens past EOS/max_new are discarded
        # a k-block counts as k decode-only iterations for prefill-defer
        self.steps_decoding_for_next_prefill = max(
            0, self.steps_decoding_for_next_prefill - (k - 1))

    def _decode_step(self):
        if self.decode_block > 1 and not self.streaming \
                and self._prefilling is None \
                and not (self.waiting and self._can_admit(self.waiting[0])
                         and self.steps_decoding_for_next_prefill == 0) \
                and not any(q.num_beams > 1 for q in self.running.values()):
            # paged mode is block-safe: pages are reserved for
            # prompt+max_new at admission and positions past a slot's
            # reservation hit the trash page, so the k on-device steps
            # can't touch another sequence's pages
            sps = {q.sampling or self.sampling
                   for q in self.running.values()}
            # mirostat state and the min-new-tokens EOS mask are host-side
            # per-token concerns; fall back to per-token stepping for them
            block_ok = (len(sps) == 1
                        and not next(iter(sps)).mirostat
                        and all(len(q.output_ids) >= q.min_new_tokens
                                for q in self.running.values()))
            if block_ok:
                self._flush_table()
                return self._decode_block_step(next(iter(sps)),
                                               self.decode_block)
        self._flush_table()
        toks = jnp.asarray(self._next_tokens[:, None].astype(np.int32))
        lens = jnp.asarray(self.lengths.astype(np.int32))
        # fill-hinted attention block size (two variants max → at most one
        # extra compile when the longest slot crosses the threshold)
        cfg = pick_decode_blk(self.cfg, int(self.lengths.max()) + 1)
        items = [(s, q) for s, q in self.running.items() if q.num_beams == 1]
        beam_seqs = list({id(q): q for q in self.running.values()
                          if q.num_beams > 1}.values())
        if not beam_seqs:
            # fused decode+sample: ONE dispatch even with mixed per-request
            # SamplingParams / mirostat / min-new-tokens; fetch [B] ints
            # (+ [B] mu when mirostat runs), never the [B, V] logits
            out = self._decode_sample_step(cfg, toks, lens)
            for slot, seq in items:
                self.lengths[slot] += 1
                t = int(out[slot])
                seq.output_ids.append(t)
                self._next_tokens[slot] = t
                self._maybe_finish(seq)
            return
        # beam groups advance host-side (joint top-k over W rows), so this
        # path still fetches logits; plain rows ride along via _sample_many
        logits, self.cache = _decode_all(self.params, toks, lens, self.cache,
                                         cfg, prompt_len=self._plens())
        logits = np.asarray(logits, np.float32)
        if items:
            toks = self._sample_many(logits[[s for s, _ in items]],
                                     [q for _, q in items])
            for (slot, seq), tok in zip(items, toks):
                self.lengths[slot] += 1
                tok = int(tok)
                seq.output_ids.append(tok)
                self._next_tokens[slot] = tok
                self._maybe_finish(seq)
        for seq in beam_seqs:
            self._beam_advance(seq, logits)

    #: inactive slots sample with this trivial config (argmax, no state) —
    #: their tokens are discarded, so give them the cheapest row
    _IDLE_SP = SamplingParams(greedy=True, repeat_penalty=1.0,
                              repeat_last_n=0)

    def _decode_sample_step(self, cfg: ModelConfig, toks, lens) -> np.ndarray:
        """Run the fused _decode_sample_all step; returns [B] token ids."""
        B = self.max_batch
        sps, mask_eos = [], []
        for s in range(B):
            seq = self.running.get(s)
            sps.append((seq.sampling or self.sampling) if seq
                       else self._IDLE_SP)
            mask_eos.append(bool(seq)
                            and len(seq.output_ids) < seq.min_new_tokens)
        active = [sps[s] for s in self.running]
        enable = []
        if any(not (sp.greedy or sp.temperature <= 0) for sp in active):
            enable.append("filters")
        if any(sp.mirostat for sp in active):
            enable.append("mirostat")
        penal = [s for s in self.running
                 if sps[s].repeat_last_n > 0
                 and (sps[s].repeat_penalty != 1.0
                      or sps[s].frequency_penalty
                      or sps[s].presence_penalty)]
        hist = valid = None
        if penal:
            rl_max = max(sps[s].repeat_last_n for s in penal)
            RL = -(-rl_max // 64) * 64          # pad → bounded compiles
            h, v = _penalty_hist(
                ((s, self.running[s], sps[s].repeat_last_n) for s in penal),
                B, RL)
            hist, valid = jnp.asarray(h), jnp.asarray(v)
        self.key, sub = jax.random.split(self.key)
        tok, mu, self.cache = _decode_sample_all(
            self.params, toks, lens, self.cache, sub, batch_params(
                sps, mask_eos), jnp.asarray(self._mu), hist, valid, cfg,
            self.cfg.eos_token_ids, tuple(enable),
            prompt_len=self._plens())
        if "mirostat" in enable:
            self._mu = np.asarray(mu).copy()
        return np.asarray(tok)

    def _maybe_finish(self, seq: Sequence):
        done = (len(seq.output_ids) >= seq.max_new_tokens
                or (seq.output_ids[-1] in self.cfg.eos_token_ids
                    and len(seq.output_ids) >= seq.min_new_tokens)
                or (not self.streaming
                    and self.lengths[seq.slot] + 1 >= self.max_len))
        if not done and self.streaming \
                and self.lengths[seq.slot] >= self.max_len:
            # cache full → StreamingLLM: compact-and-rotate this slot and
            # keep going (same trigger as stream_generate's pos >= max_len,
            # so the two paths produce identical token streams)
            self.cache = _shift_slot(self.cache, self.inv_freqs,
                                     jnp.int32(seq.slot), self.cfg,
                                     self.n_keep, self.n_discard)
            self.lengths[seq.slot] -= self.n_discard
        if done:
            seq.status = SeqStatus.FINISHED
            seq.end_time = time.time()
            self.finished.append(seq)
            if seq.slot in self.running:
                del self.running[seq.slot]
            self.free_slots.append(seq.slot)
            self.lengths[seq.slot] = 0
            if self.kv_mode == "paged" and seq.slot in self.slot_pages:
                self.allocator.release(self.slot_pages.pop(seq.slot))
                self.table_np[seq.slot, :] = self._trash_page
                self._table_dirty = True
