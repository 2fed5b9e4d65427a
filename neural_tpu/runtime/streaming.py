"""StreamingLLM: attention-sink + shift-RoPE infinite inference.

Reference: docs/infinite_inference.md + the shift-RoPE-K ring
(bestla_reordered_attn_fp32_shift_rope_k mha_dense.h:142,
ne_rope_shift_inplace ne_layers.h:430, ring-full handling llama.cpp:106-109,
cossin cache model_utils.cpp:168-195).

TPU-native design: instead of a ring buffer with wrap-around bookkeeping
(dynamic-shape hostile), overflow triggers a single *compact-and-shift* op:

  - keep the first ``n_keep`` sink tokens;
  - drop the next ``n_discard``;
  - move the remaining keys down by ``n_discard`` slots AND rotate them by
    ``-n_discard`` RoPE steps (rope(x, p)·R(-Δ) == rope(x, p-Δ), exactly),
    so the cache is indistinguishable from one built at the shifted
    positions;
  - values move without rotation; int8 caches move values+scales.

The copy costs one cache rewrite per ``n_discard`` generated tokens —
amortized to ~zero (the reference's ring avoids the copy but pays ring
masks on every step; under XLA the bulk copy is cheaper than dynamic
gather/masking in the hot loop).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..ops.rope import apply_rope, rope_freqs
from .kvcache import KVCache, init_cache
from .generate import model_step
from .sampling import SamplingParams, SamplerState, sample


def shift_cache_impl(cache: KVCache, inv_freqs, cfg: ModelConfig,
                     n_keep: int, n_discard: int) -> KVCache:
    """Compact a FULL cache: [sink | dropped | moved] → [sink | moved | 0].

    K entries in ``moved`` are rotated by -n_discard RoPE steps so their
    stored rotation matches their new absolute positions. Traceable body
    (no jit) so the serving scheduler can apply it to a single sliced
    slot inside its own jitted update.
    """
    k, v, ks, vs = cache
    S = k.shape[3]
    m0 = n_keep + n_discard  # first moved index

    def move(c, rotate: bool):
        sink, moved = c[:, :, :, :n_keep], c[:, :, :, m0:]
        if rotate and cfg.rope_style != "none":
            # dequant → rotate → requant for int8 caches
            if ks is not None:
                from ..ops.attention import quantize_kv
                sc = ks[:, :, :, m0:].astype(jnp.float32)       # [L,B,H,S']
                mf = moved.astype(jnp.float32) * sc[..., None]
            else:
                mf = moved.astype(jnp.float32)
            # [L,B,H,S',Dh] → [L,B,S',H,Dh] for apply_rope's layout
            mf = mf.transpose(0, 1, 3, 2, 4)
            ang = (-float(n_discard)) * inv_freqs                # [d/2]
            cos = jnp.cos(ang)[None, :]                          # [1, d/2]
            sin = jnp.sin(ang)[None, :]
            mf = apply_rope(mf, cos, sin, cfg.rope_style, cfg.rope_dim)
            mf = mf.transpose(0, 1, 3, 2, 4)
            if ks is not None:
                from ..ops.attention import quantize_kv
                mq, msc = quantize_kv(mf)
                moved, new_scale = mq, msc
            else:
                moved, new_scale = mf.astype(c.dtype), None
        else:
            new_scale = None
        pad = jnp.zeros((*c.shape[:3], n_discard, c.shape[4]), c.dtype)
        return jnp.concatenate([sink, moved, pad], axis=3), new_scale

    k_new, k_resc = move(k, rotate=True)
    v_new, _ = move(v, rotate=False)

    def move_scales(sc, resc):
        """sc [L,B,H,S] bf16; resc [L,B,H,S'] (requantized K scales) or
        None (V scales move unchanged)."""
        if sc is None:
            return None
        sink = sc[:, :, :, :n_keep]
        moved = sc[:, :, :, m0:] if resc is None else resc.astype(sc.dtype)
        pad = jnp.zeros((*sc.shape[:3], n_discard), sc.dtype)
        return jnp.concatenate([sink, moved, pad], axis=3)

    if ks is not None:
        ks_new = move_scales(ks, k_resc)
        vs_new = move_scales(vs, None)
    else:
        ks_new = vs_new = None
    return KVCache(k_new, v_new, ks_new, vs_new)


@partial(jax.jit, static_argnames=("cfg", "n_keep", "n_discard"),
         donate_argnums=(0,))
def shift_cache(cache: KVCache, inv_freqs, cfg: ModelConfig,
                n_keep: int, n_discard: int) -> KVCache:
    return shift_cache_impl(cache, inv_freqs, cfg, n_keep, n_discard)


def stream_generate(params, cfg: ModelConfig, prompt_ids: Sequence[int],
                    max_new_tokens: int, max_len: int,
                    n_keep: int = 4, n_discard: Optional[int] = None,
                    sampling: Optional[SamplingParams] = None,
                    seed: int = 0, stop_at_eos: bool = False,
                    kv_dtype=jnp.bfloat16):
    """Infinite generation within a fixed ``max_len`` cache (reference CLI
    shift_roped_k path, main_run.cpp:~490-540). ``n_discard`` defaults to
    half the non-sink window (reference default)."""
    n_discard = n_discard or (max_len - n_keep) // 2
    assert len(prompt_ids) < max_len, "prompt must fit in the cache"
    sampling = sampling or SamplingParams(greedy=True, repeat_penalty=1.0)
    inv_freqs = params.get("rope_inv_freqs")

    cache = init_cache(cfg, 1, max_len, kv_dtype)
    state = SamplerState.init(1, sampling)
    key = jax.random.PRNGKey(seed)

    prompt = jnp.asarray(np.asarray(prompt_ids, np.int32)[None, :])
    logits, cache = model_step(params, prompt, jnp.zeros((1,), jnp.int32),
                               cache, cfg)
    out = list(prompt_ids)
    pos = len(prompt_ids)       # logical position of next write
    for _ in range(max_new_tokens):
        key, sub = jax.random.split(key)
        hist = jnp.asarray(
            np.asarray(out[-sampling.repeat_last_n:], np.int32)[None, :])
        tok, state = sample(logits[:, -1], sub, sampling, state,
                            prev_tokens=hist)
        next_id = int(tok[0])
        out.append(next_id)
        if stop_at_eos and next_id in cfg.eos_token_ids:
            break
        if pos >= max_len:      # cache full → shift (ring-full, llama.cpp:106)
            cache = shift_cache(cache, inv_freqs, cfg, n_keep, n_discard)
            pos -= n_discard
        logits, cache = model_step(params, jnp.asarray([[next_id]], jnp.int32),
                                   jnp.asarray([pos], jnp.int32), cache, cfg)
        pos += 1
    return out
