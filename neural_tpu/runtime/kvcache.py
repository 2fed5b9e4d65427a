"""KV-cache allocation and manipulation.

Analog of the reference kv_cache_init (model_utils.cpp:61-196: packed-BTLA /
f16 layout choice, TP head split, shift-RoPE cossin cache).

Layout is head-major ``[L, B, Hkv, S, Dh]`` (the TPU analog of the
reference's NTILE-reordered packed KV): per-head contiguous S so the Pallas
attention kernels stream blocks at full HBM bandwidth. Optional int8
quantization stores per-(token, head) scales FLAT ``[L, B, Hkv, S]`` bf16 (value
replicated over the 8-sublane dim for alignment-legal kernel slices).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig


class KVCache(NamedTuple):
    k: jnp.ndarray                   # [L, B, Hkv, S, Dh] bf16/f32 or int8
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray]   # [L, B, Hkv, S] bf16 iff int8
    v_scale: Optional[jnp.ndarray]

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def init_cache(cfg: ModelConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16) -> KVCache:
    """dtype: a jnp float dtype, or the string "int8" for quantized KV
    (reference: NE_TYPE_BTLA packed int8 KV when supported,
    model_utils.cpp:61)."""
    shape = (cfg.n_layers, batch, cfg.n_kv_heads, max_len, cfg.head_dim)
    if dtype == "int8" or dtype == jnp.int8:
        sshape = (cfg.n_layers, batch, cfg.n_kv_heads, max_len)
        return KVCache(jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                       jnp.zeros(sshape, jnp.bfloat16),
                       jnp.zeros(sshape, jnp.bfloat16))
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                   None, None)


def cache_nbytes(cache: KVCache) -> int:
    tot = cache.k.size * cache.k.dtype.itemsize * 2
    if cache.k_scale is not None:
        tot += cache.k_scale.size * cache.k_scale.dtype.itemsize * 2
    return tot


def reorder_batch(cache: KVCache, idx: jnp.ndarray) -> KVCache:
    """Reorder the batch dim (beam-search KV reorder:
    reference beam_search_kv_cache_reorder, model_utils.h:423)."""
    return KVCache(*(None if c is None else jnp.take(c, idx, axis=1)
                     for c in cache))


def copy_seq(cache: KVCache, src: int, dst: int) -> KVCache:
    """Copy one sequence's KV to another slot (model_kv_cache_seq_cpy,
    model_utils.cpp:2058)."""
    return KVCache(*(None if c is None else c.at[:, dst].set(c[:, src])
                     for c in cache))
