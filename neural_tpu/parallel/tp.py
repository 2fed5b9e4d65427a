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

    from ..runtime.kvcache import KVCache
    cs = cache_specs()
    cache_tree = KVCache(cs, cs, cs, cs)
    fn = shard_map(
        partial(forward, cfg=cfg, tp_axis="tp"),
        mesh=mesh,
        in_specs=(pspecs, P("dp", None), P("dp"), cache_tree),
        out_specs=(P("dp", None, None), cache_tree),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(3,) if donate_cache else ())
