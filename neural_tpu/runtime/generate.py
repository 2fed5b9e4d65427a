"""Generation loops: prefill + decode.

Analog of the reference's generation driver (application/main_run.cpp:439-600
prefill-in-chunks + sampling loop; Python Model.generate __init__.py:337).
The jitted ``model_step`` is the per-iteration unit; greedy/sampled loops
drive it from Python (one host↔device round-trip per token, like the
reference's per-step pybind call, but with donated cache buffers so the KV
never copies).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.qtensor import QTensor, is_native, to_native, to_native_packed
from ..models.config import ModelConfig
from ..models.transformer import forward
from .kvcache import init_cache
from .sampling import SamplingParams, SamplerState, sample


# prepare_params leaves tensors whose f32 conversion temp exceeds this in
# at-rest form (in-jit conversion would spike HBM); runtime.residency
# imports it so the packed-vs-native estimate matches the kernel policy
IN_JIT_SKIP_BYTES = 1 << 30


def _qleaves(params):
    return [l for l in jax.tree.leaves(
        params, is_leaf=lambda x: isinstance(x, QTensor))
        if isinstance(l, QTensor)]


# tensors at or above this K*N get the uint8 native-pack at-rest format.
# Below it (the ~[4096, 4096] attention projections of a 7B) the in-kernel
# bitcast costs ~0.8 ms/tok on v5e: their decode kernels run only 2-4 grid
# steps, too few to hide the bitcast's register shuffle behind the DMA
# pipeline (measured: npack attn-only 6.16 ms/tok vs 5.34 packed+in-jit
# conversion; gate/up/down/lm_head show NO penalty). Small tensors stay
# bit-plane packed and convert in-jit per call — only ~1 GB worth on a 7B.
NPACK_MIN_ELEMS = 32 * (1 << 20)


def params_to_native(params, donate: bool = True, force: bool = False,
                     min_elems: Optional[int] = None):
    """ONE-TIME load conversion to the at-rest TPU decode format
    (reference analog: packed weights are load-time artifacts,
    bestla_storage.h:697):

    - layers unstack to per-layer tuples (the measured-fast decode layout:
      every kernel reads whole per-layer buffers; stacked-index streaming
      cost +1.3 ms/tok on a 7B),
    - large 2-4 bit tensors repack to the uint8 native-pack layout
      (in-kernel bitcast → hardware int4 convert; zero conversion,
      crosses jit boundaries),
    - 5-8 bit tensors convert to int8 code planes (also boundary-safe),
    - small 2-4 bit tensors (see NPACK_MIN_ELEMS) keep the packed form;
      prepare_params converts just those in-jit (~1 GB on a 7B).

    Net: no executable holds a second full copy of the model — the
    round-2 double-residency (and its batch-8 HBM OOM) is gone, and
    serving's per-step jits stop re-paying full-model VPU unpack work.

    ``donate=True`` frees each packed buffer as its replacement is built;
    the caller MUST drop its reference to the input tree (rebind). No-op
    off-TPU (unless ``force``, for tests) and for already-converted
    params.
    """
    if jax.default_backend() != "tpu" and not force:
        return params
    if "layers" not in params or not _qleaves(params):
        return params  # fp models / whisper: nothing to convert
    if min_elems is None:
        min_elems = NPACK_MIN_ELEMS

    def conv_one(qt):
        if not isinstance(qt, QTensor) or is_native(qt):
            return qt
        if qt.cfg.kind == "int" and 2 <= qt.cfg.bits <= 4 \
                and qt.planes[0].dtype == jnp.uint8 \
                and qt.K * qt.N >= min_elems:
            fn = _JIT_NPACK if donate else _JIT_NPACK_KEEP
        elif qt.cfg.kind == "int" and qt.cfg.bits >= 5 \
                and qt.planes[0].dtype == jnp.uint8:
            fn = _JIT_NATIVE if donate else _JIT_NATIVE_KEEP
        else:
            return qt
        return fn(qt)

    def conv_tree(tree):
        return jax.tree.map(conv_one, tree,
                            is_leaf=lambda x: isinstance(x, QTensor))

    params = dict(params)
    layers = params["layers"]
    if isinstance(layers, (list, tuple)):
        params["layers"] = tuple(conv_tree(lp) for lp in layers)
    else:
        # unstack (host-level slices; the stack frees when the caller
        # rebinds) and convert per layer — whole-stack conversion would
        # spike an L-times int32 unpack temp (measured 11 GB OOM on a
        # fused 7B gate|up stack)
        L = jax.tree.leaves(layers)[0].shape[0]
        params["layers"] = tuple(
            conv_tree(jax.tree.map(lambda a: a[l], layers))
            for l in range(L))
    rest = {k: conv_one(v) for k, v in params.items() if k != "layers"}
    params.update(rest)
    return params


_JIT_NPACK = jax.jit(to_native_packed, donate_argnums=(0,))
_JIT_NPACK_KEEP = jax.jit(to_native_packed)
_JIT_NATIVE = jax.jit(to_native, donate_argnums=(0,))
_JIT_NATIVE_KEEP = jax.jit(to_native)


def prepare_params(params, native: Optional[bool] = None,
                   unroll: Optional[bool] = None):
    """Decode-loop preparation, called INSIDE the jit before the step scan:

    1. convert 4-bit QTensors to native int4 codes — the hardware int4→f32
       convert feeding the f32-dequant Pallas decode kernel streams weights
       at ~660 GB/s on v5e vs ~230 GB/s for shift/mask unpacking
       (scripts/exp_kernels.py), and
    2. unstack the layer dict into per-layer tuples so the decode steps read
       loop-invariant whole weight buffers. This matters twice: a lax.scan
       over stacked weights re-materializes a sliced copy every step before
       each Pallas call, and even with prefetch-indexed stacked kernels,
       XLA's while-loop memory pass sinks the scale stacks into the layer
       scan's carry with alternating memory spaces — a measured 4.2 ms/tok
       of staging copies on a 7B. Unrolled decode: 8.1 ms/tok vs 13.9
       scanned vs 22.4 packed (llama2-7b q4_0, v5e).

    Both run once per jit invocation and hoist out of the decode scan.
    Defaults (None) resolve to True on TPU, False elsewhere.
    """
    qts = _qleaves(params)
    if qts and all(is_native(q) for q in qts):
        # native-at-rest params (params_to_native ran at load): every
        # kernel consumes the stored planes directly — no conversion and
        # no unstack copies (the layers are already per-layer tuples, so
        # forward's unrolled branch reads them as plain jit inputs)
        return params
    if native is None:
        native = jax.default_backend() == "tpu"
    if unroll is None:
        unroll = jax.default_backend() == "tpu"
    # unroll BEFORE the native conversion: to_native's shift/mask unpack
    # goes through an int32 intermediate, and on a whole [L, K, N] stack
    # that transient is L× the per-layer one (11.5 GB for a fused 7B
    # gate|up stack — HBM OOM). Per-layer conversion peaks at ~360 MB.
    def conv(tree):
        def one(l):
            if not isinstance(l, QTensor):
                return l
            # skip tensors whose unpack would spike a huge int32 temp
            # (e.g. a 152k-vocab lm_head: [4096, 151936] i32 = 2.5 GB —
            # OOMs a 16 GB chip next to a 7B model); the packed Pallas
            # kernel handles them at streaming rate once per step.
            if l.K * l.N * 4 > IN_JIT_SKIP_BYTES:
                return l
            return to_native(l)
        return jax.tree.map(one, tree,
                            is_leaf=lambda l: isinstance(l, QTensor))

    if unroll and not isinstance(params["layers"], (list, tuple)):
        layers = params["layers"]
        L = jax.tree.leaves(layers)[0].shape[0]
        params = dict(params)
        # SEQUENCE slice+convert per layer (optimization_barrier): both the
        # sliced packed copies and the unpack's [K, N] int32 temps
        # otherwise go live for many layers at once under XLA's scheduler —
        # measured HBM OOM on 7B q3/q5/mistral shapes. One layer's
        # conversion must finish before the next layer's slice starts.
        out, prev = [], None
        for l in range(L):
            lsrc = layers
            if prev is not None:
                lsrc, _ = jax.lax.optimization_barrier((lsrc, prev))
            lp = jax.tree.map(lambda a: a[l], lsrc)
            if native:
                lp = conv(lp)
            prev = jax.tree.leaves(lp)[0]
            out.append(lp)
        params["layers"] = tuple(out)
        if native:
            rest = {k: v for k, v in params.items() if k != "layers"}
            if prev is not None:
                rest, _ = jax.lax.optimization_barrier((rest, prev))
            params.update(conv(rest))
        return params
    if native:
        params = dict(params)
        if isinstance(params["layers"], (list, tuple)):
            # already unrolled (the at-rest tuple layout): convert ONLY
            # the packed tensors, sequencing just those — barriers must
            # not touch the already-native leaves, or XLA demotes them
            # from direct jit inputs to computed temps (a full extra copy
            # of the model per call; measured +0.4 ms/tok and +2.5 GB on
            # the hybrid 7B layout)
            prev = [None]

            def one_seq(l):
                if not isinstance(l, QTensor) or is_native(l):
                    return l
                if l.K * l.N * 4 > IN_JIT_SKIP_BYTES:
                    return l
                if prev[0] is not None:
                    l, _ = jax.lax.optimization_barrier((l, prev[0]))
                l = to_native(l)
                prev[0] = l.planes[0]
                return l

            params["layers"] = tuple(
                jax.tree.map(one_seq, lp,
                             is_leaf=lambda x: isinstance(x, QTensor))
                for lp in params["layers"])
            rest = {k: v for k, v in params.items() if k != "layers"}
            params.update(jax.tree.map(
                one_seq, rest, is_leaf=lambda x: isinstance(x, QTensor)))
        else:
            params = conv(params)
    return params


def fuse_layer_weights(params, cfg: ModelConfig):
    """Eagerly (outside jit, once at load) concatenate per-layer QKV and
    gate/up projections along N into single GEMMs — the reference's fused
    qkv / ffn_silu ops (ne_bestla.h:42-70; llama.cpp:217 fused-QKV graph).
    For decode this cuts 3 kernel launches per layer (~0.2-0.4 ms/tok on a
    7B); the x tile is also read once instead of thrice.

    Single-device layout only: TP column-splits the UNFUSED names
    (parallel/sharding.py) — apply fusion per-rank or not at all there.
    Layers may be a stacked dict ([L, ...] leaves) or unrolled tuples.
    No-op for layers whose projections can't fuse (different quant configs,
    mismatched act-order perms, fp weights, MoE). Act-order projections
    with IDENTICAL perms (the GPTQ same-Hessian case) do fuse — and the
    fusion is how act-order decode sheds 2 of its 3 per-branch activation
    gathers (reference analog: the in-kernel activation shuffle,
    bestla_prologue_a.h:299 ShuffleActivationKBlockBase).
    """
    from ..core.qtensor import QTensor, concat_n

    def perms_fusable(ts):
        # all plain, or all act-order with identical perms (GPTQ quantizes
        # same-input projections against the same Hessian → same g_idx);
        # the fused GEMM then pays ONE activation gather instead of three.
        if all(t.perm is None for t in ts):
            return True
        if any(t.perm is None for t in ts):
            return False
        p0 = np.asarray(ts[0].perm)
        return all(np.array_equal(np.asarray(t.perm), p0) for t in ts[1:])

    def fuse_one(lp):
        lp = dict(lp)
        trio = [lp.get(k) for k in ("wq", "wk", "wv")]
        if all(isinstance(t, QTensor) for t in trio) and \
                perms_fusable(trio) and \
                len({t.cfg for t in trio}) == 1 and \
                trio[0].N == cfg.n_heads * cfg.head_dim and \
                trio[1].N == cfg.n_kv_heads * cfg.head_dim:
            bias = [lp.get(k) for k in ("bq", "bk", "bv")]
            if all(b is None for b in bias) or all(
                    b is not None for b in bias):
                lp["wqkv"] = concat_n(trio)
                if bias[0] is not None:
                    lp["bqkv"] = jnp.concatenate(bias, axis=-1)
                for k in ("wq", "wk", "wv", "bq", "bk", "bv"):
                    lp.pop(k, None)
        duo = [lp.get(k) for k in ("w_gate", "w_up")]
        if all(isinstance(t, QTensor) for t in duo) and \
                perms_fusable(duo) and \
                duo[0].cfg == duo[1].cfg and duo[0].N == duo[1].N:
            bias = [lp.get(k) for k in ("b_gate", "b_up")]
            if all(b is None for b in bias) or all(
                    b is not None for b in bias):
                lp["w_gateup"] = concat_n(duo)
                if bias[0] is not None:
                    lp["b_gateup"] = jnp.concatenate(bias, axis=-1)
                for k in ("w_gate", "w_up", "b_gate", "b_up"):
                    lp.pop(k, None)
        return lp

    if cfg.is_moe:
        return params
    params = dict(params)
    layers = params["layers"]
    if isinstance(layers, (list, tuple)):
        params["layers"] = tuple(fuse_one(lp) for lp in layers)
    else:
        params["layers"] = fuse_one(layers)
    return params


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3,))
def model_step(params, tokens, start, cache, cfg: ModelConfig,
               prompt_len=None):
    """One eval: tokens [B, T] at cache offsets start [B] → logits, cache.

    ``prompt_len`` [B]: the prompt size — needed by prefix-LM archs
    (ChatGLM v1) on DECODE steps, where forward's start+T default would
    track the current position instead of the prompt boundary."""
    return forward(params, tokens, start, cache, cfg, prompt_len=prompt_len)


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3,))
def prefill_step(params, tokens, start, cache, cfg: ModelConfig,
                 prompt_len=None):
    """Prefill eval returning ONLY the last token's logits [B, 1, V]
    (forward's logit_positions): the lm_head runs on [B, 1, D] instead of
    [B, T, D], skipping ~0.5 TFLOP of dead vocab matmul plus the
    [B, T, V] f32 materialization (~4 ms + 250 MB on a 2k-token 7B).
    This matches the reference, whose model_eval computes logits for the
    LAST position only unless logits_all (model_utils.h). Full rows only
    (ragged prompts go through _prefill_ragged)."""
    lens = jnp.full(tokens.shape[:1], tokens.shape[1], jnp.int32)
    return forward(params, tokens, start, cache, cfg, prompt_len=prompt_len,
                   logit_positions=lens - 1)


def truncate_at_eos(ids, cfg: ModelConfig):
    """Cut a generated-id list after its first stop token. Membership is
    over the full stop set ``cfg.eos_token_ids`` (Llama-3-Instruct stops
    on <|end_of_text|> OR <|eot_id|>; reference
    neural_speed/__init__.py:423-434)."""
    for i, t in enumerate(ids):
        if t in cfg.eos_token_ids:
            return ids[:i + 1]
    return ids


def _plen(cfg: ModelConfig, lens) -> Optional[jnp.ndarray]:
    """Prompt-length operand for decode steps — only prefix-LM archs
    (ChatGLM v1) consume it; None elsewhere keeps jit signatures lean."""
    if cfg.prefix_lm or cfg.rope_style == "glm1":
        return jnp.asarray(np.atleast_1d(np.asarray(lens, np.int32)))
    return None


def greedy_generate(params, cfg: ModelConfig, prompt_ids: Sequence[int],
                    max_new_tokens: int = 32, max_len: Optional[int] = None,
                    cache_dtype=jnp.bfloat16, stop_at_eos: bool = True):
    """Single-sequence greedy decode. Returns the full id list."""
    prompt = np.asarray(prompt_ids, np.int32)[None, :]          # [1, T]
    T = prompt.shape[1]
    S = max_len or min(cfg.max_seq_len, T + max_new_tokens)
    cache = init_cache(cfg, 1, S, cache_dtype)
    start = jnp.zeros((1,), jnp.int32)
    plen = _plen(cfg, [T])

    logits, cache = prefill_step(params, jnp.asarray(prompt), start, cache,
                                 cfg)
    next_id = int(jnp.argmax(logits[0, -1]))
    out = list(prompt_ids) + [next_id]

    pos = T
    for _ in range(max_new_tokens - 1):
        if stop_at_eos and next_id in cfg.eos_token_ids:
            break
        tok = jnp.asarray([[next_id]], jnp.int32)
        logits, cache = model_step(params, tok,
                                   jnp.asarray([pos], jnp.int32), cache, cfg,
                                   prompt_len=plen)
        next_id = int(jnp.argmax(logits[0, -1]))
        out.append(next_id)
        pos += 1
    return out


def generate(params, cfg: ModelConfig, prompt_ids: Sequence[int],
             sampling: Optional[SamplingParams] = None,
             max_new_tokens: int = 128, max_len: Optional[int] = None,
             seed: int = 0, stop_at_eos: bool = True,
             kv_dtype=jnp.bfloat16):
    """Sampled single-sequence generation (reference Model.generate path
    with the full main_run.cpp:571-600 sampling stack)."""
    sampling = sampling or SamplingParams()
    prompt = np.asarray(prompt_ids, np.int32)[None, :]
    T = prompt.shape[1]
    S = max_len or min(cfg.max_seq_len, T + max_new_tokens)
    cache = init_cache(cfg, 1, S, kv_dtype)
    state = SamplerState.init(1, sampling)
    key = jax.random.PRNGKey(seed)
    plen = _plen(cfg, [T])

    logits, cache = prefill_step(params, jnp.asarray(prompt),
                                 jnp.zeros((1,), jnp.int32), cache, cfg)
    out = list(prompt_ids)
    pos = T
    for i in range(max_new_tokens):
        key, sub = jax.random.split(key)
        if sampling.repeat_last_n <= 0:  # 0 disables penalties (llama.cpp)
            tok, state = sample(logits[:, -1], sub, sampling, state)
        else:
            hist = np.asarray(out[-sampling.repeat_last_n:],
                              np.int32)[None, :]
            tok, state = sample(logits[:, -1], sub, sampling, state,
                                prev_tokens=jnp.asarray(hist))
        next_id = int(tok[0])
        out.append(next_id)
        if stop_at_eos and next_id in cfg.eos_token_ids:
            break
        if i == max_new_tokens - 1 or pos + 1 >= S:
            break
        logits, cache = model_step(params, jnp.asarray([[next_id]], jnp.int32),
                                   jnp.asarray([pos], jnp.int32), cache, cfg,
                                   prompt_len=plen)
        pos += 1
    return out


def pick_decode_blk(cfg: ModelConfig, fill_hint: Optional[int]):
    """Tune the decode-attention S-block size for an expected fill
    (measured crossover ~384 on v5e, scripts/exp_attn_blk.py)."""
    if fill_hint is None:
        return cfg
    import dataclasses
    return dataclasses.replace(cfg,
                               decode_blk_s=128 if fill_hint <= 384 else 512)


@partial(jax.jit, static_argnames=("cfg", "n_steps", "fill_hint"),
         donate_argnums=(3,))
def decode_loop(params, token, pos, cache, cfg: ModelConfig, n_steps: int,
                fill_hint: Optional[int] = None, prompt_len=None):
    """Fully on-device autoregressive greedy decode via lax.scan.

    Unlike the reference (one Python↔C++ crossing per token,
    main_pybind.cpp:609), the whole loop runs on-device: token [B, 1],
    pos [B] → (tokens [n_steps, B], final cache). This is the production
    decode path and the benchmark unit. ``fill_hint`` (static): expected
    KV fill at the end of the run, used to tune the attention kernel's
    block size.
    """
    cfg = pick_decode_blk(cfg, fill_hint)
    params = prepare_params(params)

    def body(carry, _):
        token, pos, cache = carry
        logits, cache = forward(params, token, pos, cache, cfg,
                                logits_dtype=jnp.bfloat16,
                                prompt_len=prompt_len)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        return (nxt[:, None], pos + 1, cache), nxt

    (token, pos, cache), toks = jax.lax.scan(
        body, (token, pos, cache), None, length=n_steps)
    return toks, cache


@partial(jax.jit, static_argnames=("cfg", "n_steps", "sampling",
                                   "fill_hint"),
         donate_argnums=(3,))
def sample_loop(params, token, pos, cache, cfg: ModelConfig, n_steps: int,
                sampling: SamplingParams, key, history,
                history_valid=None, fill_hint: Optional[int] = None,
                prompt_len=None):
    """On-device sampled decode: like decode_loop but with the full sampling
    pipeline per step. ``history`` [B, repeat_last_n] carries the recent
    tokens for penalties (a ring updated on-device); ``history_valid``
    [B, repeat_last_n] bool marks real entries (ragged prompt tails padded
    on the LEFT seed it with False at the pads)."""
    cfg = pick_decode_blk(cfg, fill_hint)
    B = token.shape[0]
    state = SamplerState.init(B, sampling)
    params = prepare_params(params)
    penalties = sampling.repeat_last_n > 0
    if history_valid is None:
        history_valid = jnp.ones(history.shape, bool)

    def body(carry, key):
        token, pos, cache, state, history, hvalid = carry
        logits, cache = forward(params, token, pos, cache, cfg,
                                logits_dtype=jnp.float32,
                                prompt_len=prompt_len)
        tok, state = sample(logits[:, -1], key, sampling, state,
                            prev_tokens=history if penalties else None,
                            prev_valid=hvalid if penalties else None)
        history = jnp.concatenate([history[:, 1:], tok[:, None]], axis=1)
        hvalid = jnp.concatenate(
            [hvalid[:, 1:], jnp.ones((B, 1), bool)], axis=1)
        return (tok[:, None], pos + 1, cache, state, history, hvalid), tok

    keys = jax.random.split(key, n_steps)
    (token, pos, cache, state, history, history_valid), toks = jax.lax.scan(
        body, (token, pos, cache, state, history, history_valid), keys)
    return toks, cache


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3,))
def _prefill_ragged(params, tokens, lens, cache, cfg: ModelConfig):
    """Right-padded batched prefill: tokens [B, Tmax] with per-row real
    lengths ``lens`` [B]. Returns each row's last-real-token logits [B, V]
    and the cache. Pad positions write junk keys at offsets >= lens[b];
    they are never attended (the decode mask is bounded by the per-row
    position) and are overwritten one-per-step as decode advances —
    the same invariant as the serving scheduler's bucketed prefill
    (reference batch padding: neural_speed/__init__.py:439-483)."""
    logits, cache = forward(params, tokens, jnp.zeros(tokens.shape[:1],
                                                      jnp.int32),
                            cache, cfg, prompt_len=lens,
                            logit_positions=lens - 1)
    return logits[:, 0], cache


def batched_generate(params, cfg: ModelConfig, rows, sampling=None,
                     max_new_tokens: int = 128,
                     max_len: Optional[int] = None, seed: int = 0,
                     stop_at_eos: bool = True, kv_dtype=jnp.bfloat16):
    """Ragged multi-prompt generation: ONE padded prefill dispatch + ONE
    on-device decode loop for all rows (the reference batch path pads and
    de-pads around a batched model_eval, __init__.py:439-483 +
    _cont_batching_input). Returns full id lists per row, truncated at the
    first EOS when ``stop_at_eos``.

    Decode cost per step is one [B, 1] model step — at batch 8 this is the
    same weight stream as batch 1, so aggregate throughput scales ~B× until
    attention/KV reads dominate."""
    sampling = sampling or SamplingParams()
    B = len(rows)
    lens = np.asarray([len(r) for r in rows], np.int32)
    Tmax = int(lens.max())
    S = max_len or min(cfg.max_seq_len, Tmax + max_new_tokens)
    if Tmax >= S:
        raise ValueError(f"prompt ({Tmax}) does not fit max_len {S}")
    # like the row-wise path, generation truncates at the cache end
    # instead of erroring (the longest row bounds the whole batch)
    max_new_tokens = min(max_new_tokens, S - Tmax)
    toks = np.zeros((B, Tmax), np.int32)
    for b, r in enumerate(rows):
        toks[b, :len(r)] = r
    cache = init_cache(cfg, B, S, kv_dtype)
    jlens = jnp.asarray(lens)
    logits, cache = _prefill_ragged(params, jnp.asarray(toks), jlens, cache,
                                    cfg)

    key = jax.random.PRNGKey(seed)
    key, sub = jax.random.split(key)
    rl = max(sampling.repeat_last_n, 0)
    state = SamplerState.init(B, sampling)
    if rl > 0:
        hist = np.zeros((B, rl), np.int32)
        valid = np.zeros((B, rl), bool)
        for b, r in enumerate(rows):
            tail = list(r)[-rl:]
            if tail:
                hist[b, -len(tail):] = tail
                valid[b, -len(tail):] = True
        hist, valid = jnp.asarray(hist), jnp.asarray(valid)
        tok0, state = sample(logits, sub, sampling, state,
                             prev_tokens=hist, prev_valid=valid)
    else:
        hist = jnp.zeros((B, 1), jnp.int32)
        valid = jnp.zeros((B, 1), bool)
        tok0, state = sample(logits, sub, sampling, state)

    new = np.asarray(tok0)[:, None]
    if max_new_tokens > 1:
        hist = jnp.concatenate([hist[:, 1:], tok0[:, None]], axis=1)
        valid = jnp.concatenate(
            [valid[:, 1:], jnp.ones((B, 1), bool)], axis=1)
        rest, cache = sample_loop(
            params, tok0[:, None], jlens, cache, cfg, max_new_tokens - 1,
            sampling, key, hist, valid,
            fill_hint=Tmax + max_new_tokens,
            prompt_len=_plen(cfg, lens))
        new = np.concatenate([new, np.asarray(rest).T], axis=1)

    outs = []
    for b, r in enumerate(rows):
        budget = min(max_new_tokens, S - len(r))
        ids = new[b, :budget].tolist()
        if stop_at_eos:
            ids = truncate_at_eos(ids, cfg)
        outs.append(list(r) + ids)
    return outs


def batch_logits(params, cfg: ModelConfig, input_ids: np.ndarray,
                 max_len: Optional[int] = None):
    """Full-sequence logits for a [B, T] batch (teacher-forced eval — the
    reference's Model.__call__ logits path, __init__.py:439-481)."""
    B, T = input_ids.shape
    cache = init_cache(cfg, B, max_len or T)
    start = jnp.zeros((B,), jnp.int32)
    logits, _ = model_step(params, jnp.asarray(input_ids, jnp.int32), start,
                           cache, cfg)
    return logits
