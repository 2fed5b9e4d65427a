"""Paged KV cache: fixed-size pages + per-sequence page tables.

TPU-native upgrade over the reference's per-context contiguous KV
(model_utils.cpp:61 ``kv_cache_init`` allocates batch × n_ctx up front;
the continuous-batching scheduler, scheduler.cpp, then lives with that
worst-case reservation). Here the serving cache is a shared pool of
``page_size``-token pages; each slot maps logical S-blocks to physical
pages through a small int32 table, so HBM is reserved per *page actually
filled*, requests of wildly different lengths pack tightly, and the pool
can be sized below worst-case (admission defers when pages run out).

Static-shape discipline (jit): the pool ``[L, P, Hkv, ps, Dh]`` and table
``[B, MAXP]`` never change shape; allocation/free is host-side bookkeeping
(PageAllocator) and the table row is rewritten on admission. The Pallas
decode kernel consumes the table as a prefetched scalar and DMAs only the
pages a sequence actually fills (ops/paged_attention.py).
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig


class PagedKVCache(NamedTuple):
    k: jnp.ndarray                   # [L, P, Hkv, ps, Dh] bf16 or int8
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray]   # [L, P, Hkv, ps] bf16 iff int8
    v_scale: Optional[jnp.ndarray]
    table: jnp.ndarray               # [B, MAXP] int32 physical page ids

    @property
    def page_size(self) -> int:
        return self.k.shape[-2]

    @property
    def n_pages(self) -> int:
        return self.k.shape[1]

    @property
    def max_len(self) -> int:
        return self.table.shape[1] * self.k.shape[-2]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def init_paged_cache(cfg: ModelConfig, batch: int, max_len: int,
                     n_pages: Optional[int] = None, page_size: int = 256,
                     dtype=jnp.bfloat16) -> PagedKVCache:
    """Pool of ``n_pages`` (default: worst case batch·max_len/ps) pages.

    ``max_len`` bounds any single sequence (table width MAXP); the pool may
    hold fewer pages than batch·MAXP — that under-reservation is the point.
    """
    assert max_len % page_size == 0, (max_len, page_size)
    maxp = max_len // page_size
    if n_pages is None:
        n_pages = batch * maxp
    shape = (cfg.n_layers, n_pages, cfg.n_kv_heads, page_size, cfg.head_dim)
    table = jnp.zeros((batch, maxp), jnp.int32)
    if dtype == "int8" or dtype == jnp.int8:
        sshape = (cfg.n_layers, n_pages, cfg.n_kv_heads, page_size)
        return PagedKVCache(
            jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
            jnp.zeros(sshape, jnp.bfloat16), jnp.zeros(sshape, jnp.bfloat16),
            table)
    return PagedKVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                        None, None, table)


class PageAllocator:
    """Host-side free-list over the physical page pool."""

    def __init__(self, n_pages: int):
        self.n_pages = n_pages
        self.free: List[int] = list(range(n_pages))[::-1]

    @property
    def n_free(self) -> int:
        return len(self.free)

    def alloc(self, n: int) -> Optional[List[int]]:
        """n pages, or None if the pool can't satisfy the request."""
        if n > len(self.free):
            return None
        pages = [self.free.pop() for _ in range(n)]
        return pages

    def release(self, pages: Sequence[int]):
        self.free.extend(pages)
        assert len(self.free) <= self.n_pages


def pages_needed(n_tokens: int, page_size: int) -> int:
    return -(-n_tokens // page_size)
