"""shard_map-based tensor/data-parallel execution.

Why shard_map and not plain GSPMD jit: the hot path runs Pallas kernels
(fused dequant matmul), which don't auto-partition under GSPMD — each rank
must run the kernel on its local weight shard, with the layer-boundary
collectives written explicitly (one psum after attention-out, one after
FFN-down — the exact pattern of the reference's NE_OP_ALL_REDUCE nodes,
llama.cpp:592,693; comm backend parallel_context.cpp → here XLA ICI
collectives).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.config import ModelConfig
from ..models.transformer import forward
from .sharding import param_specs, cache_specs


def _aux_specs(params, cfg: ModelConfig):
    specs = param_specs(params, cfg)
    # alibi slopes are per-q-head → sharded over tp
    if "alibi_slopes" in params:
        specs["alibi_slopes"] = P("tp")
    if "rope_inv_freqs" in params:
        specs["rope_inv_freqs"] = P()
    return specs


def make_tp_step(params, cfg: ModelConfig, mesh: Mesh, donate_cache=True):
    """Build a jitted sharded model step.

    Returns step(params, tokens, start, cache) → (logits, cache) where
    params/cache are sharded pytrees (see shard_params/shard_cache) and
    tokens/start are dp-sharded. Logits come back replicated across tp.
    """
    pspecs = _aux_specs(params, cfg)

    cache_tree = cache_specs()
    fn = shard_map(
        partial(forward, cfg=cfg, tp_axis="tp"),
        mesh=mesh,
        in_specs=(pspecs, P("dp", None), P("dp"), cache_tree),
        out_specs=(P("dp", None, None), cache_tree),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(3,) if donate_cache else ())


def make_tp_prefill(params, cfg: ModelConfig, mesh: Mesh, donate_cache=True):
    """Sharded ragged batched prefill: right-padded tokens [B, Tmax] with
    per-row real lengths ``lens`` [B] → (last-real-token logits [B, V],
    cache). The TP analog of runtime.generate._prefill_ragged."""
    pspecs = _aux_specs(params, cfg)
    cache_tree = cache_specs()

    def body(params, tokens, lens, cache):
        logits, cache = forward(
            params, tokens, jnp.zeros(tokens.shape[:1], jnp.int32), cache,
            cfg, tp_axis="tp", prompt_len=lens, logit_positions=lens - 1)
        return logits[:, 0], cache

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(pspecs, P("dp", None), P("dp"), cache_tree),
        out_specs=(P("dp", None), cache_tree),
        check_vma=False)
    return jax.jit(fn, donate_argnums=(3,) if donate_cache else ())


def make_tp_decode_loop(params, cfg: ModelConfig, mesh: Mesh, n_steps: int,
                        sampling=None, donate_cache=True):
    """On-device TP decode loop: the whole ``n_steps`` scan runs inside ONE
    shard_map/jit — per-layer psums ride ICI each step, with no host round
    trip per token (unlike the reference, which crosses Python↔C++ and
    MPI every step: main_run.cpp:571-600 + parallel_context.cpp).

    Greedy (``sampling=None``): fn(params, token, pos, cache) →
    (toks [n_steps, B], cache).

    Sampled: fn(params, token, pos, cache, key, history, hvalid) →
    (toks, cache), with the full sampling stack (penalties over the
    ``history`` ring, top-k/p/TFS/typical/mirostat) evaluated on the
    replicated logits — every tp rank computes the same token, so no
    extra collective is needed. With dp > 1 the per-step key is folded
    with the dp shard index (independent noise per shard); at dp == 1 the
    key stream matches the single-device sample_loop exactly.
    """
    from ..runtime.sampling import SamplerState, sample

    pspecs = _aux_specs(params, cfg)
    cache_tree = cache_specs()
    dp = mesh.shape.get("dp", 1)

    if sampling is None:
        def body_fn(params, token, pos, cache):
            def body(carry, _):
                token, pos, cache = carry
                logits, cache = forward(params, token, pos, cache, cfg,
                                        tp_axis="tp",
                                        logits_dtype=jnp.bfloat16)
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                return (nxt[:, None], pos + 1, cache), nxt

            (_, _, cache), toks = jax.lax.scan(
                body, (token, pos, cache), None, length=n_steps)
            return toks, cache

        fn = shard_map(
            body_fn, mesh=mesh,
            in_specs=(pspecs, P("dp", None), P("dp"), cache_tree),
            out_specs=(P(None, "dp"), cache_tree),
            check_vma=False)
        return jax.jit(fn, donate_argnums=(3,) if donate_cache else ())

    penalties = sampling.repeat_last_n > 0

    def body_fn(params, token, pos, cache, key, history, hvalid):
        B = token.shape[0]
        state = SamplerState.init(B, sampling)
        keys = jax.random.split(key, n_steps)
        if dp > 1:
            keys = jax.vmap(jax.random.fold_in, in_axes=(0, None))(
                keys, jax.lax.axis_index("dp"))

        def body(carry, key):
            token, pos, cache, state, history, hvalid = carry
            logits, cache = forward(params, token, pos, cache, cfg,
                                    tp_axis="tp", logits_dtype=jnp.float32)
            tok, state = sample(logits[:, -1], key, sampling, state,
                                prev_tokens=history if penalties else None,
                                prev_valid=hvalid if penalties else None)
            history = jnp.concatenate([history[:, 1:], tok[:, None]], axis=1)
            hvalid = jnp.concatenate(
                [hvalid[:, 1:], jnp.ones((B, 1), bool)], axis=1)
            return (tok[:, None], pos + 1, cache, state, history, hvalid), tok

        (_, _, cache, _, _, _), toks = jax.lax.scan(
            body, (token, pos, cache, state, history, hvalid), keys)
        return toks, cache

    fn = shard_map(
        body_fn, mesh=mesh,
        in_specs=(pspecs, P("dp", None), P("dp"), cache_tree, P(),
                  P("dp", None), P("dp", None)),
        out_specs=(P(None, "dp"), cache_tree),
        check_vma=False)
    return jax.jit(fn, donate_argnums=(3,) if donate_cache else ())


def tp_generate(params, cfg: ModelConfig, mesh: Mesh, rows,
                sampling=None, max_new_tokens: int = 128,
                max_len: Optional[int] = None, seed: int = 0,
                stop_at_eos: bool = True, kv_dtype=jnp.bfloat16,
                sharded: bool = False):
    """Ragged multi-prompt generation under a (dp, tp) mesh: ONE sharded
    padded prefill + ONE on-device sharded decode loop — the TP analog of
    runtime.generate.batched_generate, and the library entry behind
    run_tp.py / Model.generate(mesh=...). Covers the reference's TP CLI
    generation path (main_run.cpp:571-600 driving the TP graph,
    llama.cpp:117-123,592,693) with the full sampling stack.

    ``rows``: list of prompt id lists; the batch is padded to a multiple
    of dp by repeating the last row (dropped from the output).
    ``sharded=False``: params are host/single-device and get device_put
    with the split table here (every host loads the full checkpoint and
    keeps its shards — model_files.h:1432 analog).
    """
    import numpy as np

    from ..runtime.kvcache import init_cache
    from ..runtime.sampling import SamplerState, SamplingParams, sample
    from .sharding import shard_cache, shard_params

    sampling = sampling or SamplingParams()
    n_rows = len(rows)
    dp = mesh.shape.get("dp", 1)
    pad_rows = (-n_rows) % dp
    rows = list(rows) + [rows[-1]] * pad_rows
    B = len(rows)
    lens = np.asarray([len(r) for r in rows], np.int32)
    Tmax = int(lens.max())
    S = max_len or min(cfg.max_seq_len, Tmax + max_new_tokens)
    if Tmax >= S:
        raise ValueError(f"prompt ({Tmax}) does not fit max_len {S}")
    max_new_tokens = min(max_new_tokens, S - Tmax)
    toks = np.zeros((B, Tmax), np.int32)
    for b, r in enumerate(rows):
        toks[b, :len(r)] = r

    if not sharded:
        params = shard_params(params, cfg, mesh)
    cache = shard_cache(init_cache(cfg, B, S, kv_dtype), mesh)
    jlens = jnp.asarray(lens)

    prefill = make_tp_prefill(params, cfg, mesh)
    logits, cache = prefill(params, jnp.asarray(toks), jlens, cache)

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
        # one sampled loop for greedy and sampled alike (sample() reduces
        # to argmax under greedy) — keeps tp_generate token-exact with the
        # single-device batched_generate path, which also runs sample_loop
        loop = make_tp_decode_loop(params, cfg, mesh, max_new_tokens - 1,
                                   sampling=sampling)
        hist = jnp.concatenate([hist[:, 1:], tok0[:, None]], axis=1)
        valid = jnp.concatenate(
            [valid[:, 1:], jnp.ones((B, 1), bool)], axis=1)
        rest, cache = loop(params, tok0[:, None], jlens, cache, key,
                           hist, valid)
        new = np.concatenate([new, np.asarray(rest).T], axis=1)

    outs = []
    for b in range(n_rows):
        budget = min(max_new_tokens, S - len(rows[b]))
        ids = new[b, :budget].tolist()
        if stop_at_eos:
            from ..runtime.generate import truncate_at_eos
            ids = truncate_at_eos(ids, cfg)
        outs.append(list(rows[b]) + ids)
    return outs
