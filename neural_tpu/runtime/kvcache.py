"""KV-cache allocation and manipulation.

Analog of the reference kv_cache_init (model_utils.cpp:61-196: packed-BTLA /
f16 layout choice, TP head split, shift-RoPE cossin cache) — here a plain
preallocated [L, B, S, Hkv, Dh] pair with static shapes for jit, bf16 by
default, optionally int8 (per-head-token scales) once the Pallas attention
kernel is active.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..models.config import ModelConfig


def init_cache(cfg: ModelConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    shape = (cfg.n_layers, batch, max_len, cfg.n_kv_heads, cfg.head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def cache_nbytes(cfg: ModelConfig, batch: int, max_len: int,
                 dtype=jnp.bfloat16) -> int:
    import numpy as np
    n = cfg.n_layers * batch * max_len * cfg.n_kv_heads * cfg.head_dim
    return 2 * n * np.dtype(dtype).itemsize


def reorder_batch(cache, idx: jnp.ndarray):
    """Reorder the batch dim (beam-search KV reorder:
    reference beam_search_kv_cache_reorder, model_utils.h:423)."""
    k, v = cache
    return jnp.take(k, idx, axis=1), jnp.take(v, idx, axis=1)


def copy_seq(cache, src: int, dst: int):
    """Copy one sequence's KV to another slot (model_kv_cache_seq_cpy,
    model_utils.cpp:2058)."""
    k, v = cache
    k = k.at[:, dst].set(k[:, src])
    v = v.at[:, dst].set(v[:, src])
    return k, v
