"""Expert parallelism: MoE experts sharded over an ``ep`` mesh axis.

The reference computes MoE (Mixtral/Grok) entirely on-device via gathered
expert matmuls (ne_mul_mat_id, llama.cpp:622-693) with NO expert sharding
(SURVEY.md §2.6: EP ❌). TPU-native design: the [E, ...] expert stacks are
sharded on their leading axis over ``ep`` (E/ep experts per rank); tokens
are routed with a fixed-capacity dispatch and exchanged with TWO
``lax.all_to_all`` collectives per MoE layer (dispatch + combine) — the
standard Switch/GShard pattern, static shapes throughout so the whole layer
jits. Overflowing assignments beyond the per-expert capacity are dropped
(capacity_factor sizes the buffers; capacity_factor >= E/k keeps every
token and makes the layer exactly equal to the dense mixture — how the
unit test pins it to the single-device oracle).

Router weights stay replicated; within each expert the MLP may additionally
be tensor-parallel over ``tp`` (column-split gate/up, row-split down, one
psum), composing EP x TP in one shard_map.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.config import ModelConfig


def ep_param_specs(params, cfg: ModelConfig, tp: bool = True):
    """TP split-table specs with the stacked [L, E, ...] expert leaves'
    E dim sharded over 'ep' (router and non-expert leaves unchanged)."""
    from .sharding import param_specs
    specs = param_specs(params, cfg)

    def epify(s):
        if not isinstance(s, P):
            return s
        elems = list(s) + [None] * max(0, 2 - len(s))
        elems[1] = "ep"
        if not tp:
            elems = [None if a == "tp" else a for a in elems]
        return P(*elems)

    specs["layers"]["experts"] = jax.tree.map(
        epify, specs["layers"]["experts"],
        is_leaf=lambda x: isinstance(x, P))
    if not tp:
        def untp(s):
            if not isinstance(s, P):
                return s
            return P(*(None if a == "tp" else a for a in s))
        specs = jax.tree.map(untp, specs, is_leaf=lambda x: isinstance(x, P))
    return specs


def expert_capacity(n_tokens: int, n_experts: int, top_k: int,
                    capacity_factor: float) -> int:
    c = math.ceil(n_tokens * top_k / n_experts * capacity_factor)
    return max(8, -(-c // 8) * 8)  # sublane-aligned


def ep_moe(x, lp: Dict[str, Any], cfg: ModelConfig, ep_axis: str,
           tp_axis: Optional[str] = None, capacity_factor: float = 2.0):
    """Expert-parallel MoE MLP (per-rank code, inside shard_map).

    x: [B, T, D] (this rank's tokens — dp/sp shard or replicated);
    lp["experts"] leaves are LOCAL shards [E/ep, ...]; lp["router"] is
    replicated [D, E]. Returns [B, T, D].
    """
    from ..models.transformer import linear, _act

    B, T, D = x.shape
    S = B * T
    k = cfg.n_experts_active
    E = cfg.n_experts
    ep = jax.lax.psum(1, ep_axis)
    E_loc = E // ep
    C = expert_capacity(S, E, k, capacity_factor)

    logits = linear(x, lp["router"]).astype(jnp.float32)       # [B, T, E]
    top_w, top_idx = jax.lax.top_k(logits, k)
    if cfg.moe_norm_topk:
        top_w = jax.nn.softmax(top_w, axis=-1)
    else:
        top_w = jnp.take_along_axis(jax.nn.softmax(logits, axis=-1),
                                    top_idx, axis=-1)

    xf = x.reshape(S, D)
    eid = top_idx.reshape(S * k)                               # [S*k]
    w = top_w.reshape(S * k).astype(jnp.float32)
    tok = jnp.arange(S * k) // k

    # position of each assignment within its expert's capacity buffer
    oh = jax.nn.one_hot(eid, E, dtype=jnp.int32)               # [S*k, E]
    pos = jnp.sum((jnp.cumsum(oh, axis=0) - 1) * oh, axis=1)   # [S*k]
    keep = pos < C
    slot = jnp.where(keep, pos, C)                             # C = drop row

    disp = jnp.zeros((E, C + 1, D), x.dtype).at[eid, slot].set(
        jnp.take(xf, tok, axis=0))[:, :C]                      # [E, C, D]

    # dispatch: send each expert's buffer to its owner rank; receive, for
    # my local experts, the buffers every rank built for them (tiled
    # all_to_all: split E into ep chunks, concat received by source rank)
    recv = jax.lax.all_to_all(
        disp, ep_axis, split_axis=0, concat_axis=1,
        tiled=True)                                            # [E_loc, ep*C, D]

    ex = lp["experts"]
    from ..core.qtensor import QTensor
    if any(isinstance(v, QTensor) for v in ex.values()):
        # quantized experts: per-local-expert fused dequant GEMMs.
        # lax.map slices the [E_loc, ...] QTensor stacks into
        # self-consistent per-expert QTensors (the same leading-axis
        # mechanics as the layer scan), so each expert's projections run
        # through qmatmul's Pallas dequant kernels on its gathered tokens
        # (capability analog of the reference's quantized ne_mul_mat_id,
        # ne_layers.h:265-271 — which has no EP at all).
        import dataclasses
        from ..models.transformer import _mlp
        ecfg = dataclasses.replace(cfg, n_experts=0)
        exq = dict(ex)
        # down-proj bias joins AFTER the tp partial-sum reduction
        # (replicated over tp; inside _mlp it would count tp times)
        bd = exq.pop("b_down", None) if tp_axis is not None else None

        def one(args):
            e_params, h = args
            return _mlp(h[None], e_params, ecfg, tp_axis=None)[0]

        out_e = jax.lax.map(one, (exq, recv)).astype(jnp.float32)
        if tp_axis is not None:
            out_e = jax.lax.psum(out_e, tp_axis)
            if bd is not None:
                out_e = out_e + bd.astype(jnp.float32)[:, None, :]
    else:
        def edot(h, wkey, bias=True):
            we = ex[wkey]                                      # [E_loc, K, N]
            y = jnp.einsum("ecd,edn->ecn", h.astype(jnp.bfloat16),
                           we.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            b = ex.get("b" + wkey[1:])                         # b_gate/b_up/…
            if bias and b is not None:
                y = y + b.astype(jnp.float32)[:, None, :]
            return y

        if cfg.mlp_gated:
            h = _act(edot(recv, "w_gate"), cfg.act) * edot(recv, "w_up")
        else:
            h = _act(edot(recv, "w_up"), cfg.act)
        # down bias joins AFTER the tp partial-sum reduction (replicated
        # over tp; adding pre-psum would count it tp times)
        out_e = edot(h.astype(jnp.bfloat16), "w_down",
                     bias=tp_axis is None)                     # [E_loc, ep*C, D]
        if tp_axis is not None:
            out_e = jax.lax.psum(out_e, tp_axis)
            bd = ex.get("b_down")
            if bd is not None:
                out_e = out_e + bd.astype(jnp.float32)[:, None, :]

    # combine: route results back to the token owners (split the source-
    # rank-major ep*C dim, concat by owner rank → global expert order)
    back = jax.lax.all_to_all(
        out_e, ep_axis, split_axis=1, concat_axis=0,
        tiled=True)                                            # [E, C, D]

    y = jnp.take(back.reshape(E * C, D),
                 eid * C + jnp.minimum(pos, C - 1), axis=0)    # [S*k, D]
    y = y * (w * keep.astype(jnp.float32))[:, None]
    out = jnp.zeros((S, D), jnp.float32).at[tok].add(y)
    return out.reshape(B, T, D).astype(x.dtype)
