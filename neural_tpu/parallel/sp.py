"""Sequence (context) parallelism: ring attention over an ``sp`` mesh axis.

The reference has NO sequence parallelism (SURVEY.md §2.6: long context is
handled single-device via StreamingLLM). On TPU the natural scale-out for
long sequences is context sharding: each rank holds ``T/sp`` tokens; MLPs,
norms and projections are embarrassingly parallel over tokens, and attention
runs as a **ring**: K/V blocks ``ppermute`` around the sp axis while every
rank accumulates flash-style online-softmax statistics for its local
queries. After ``sp`` hops each query has attended to the full sequence.
Comm rides ICI neighbor links (ppermute), overlapping with the per-hop
einsums under XLA's latency-hiding scheduler.

Causality comes from GLOBAL positions carried with each block, so the hop
order never matters. The single-device oracle is
``models.transformer._attend_nocache`` (tests/test_sp.py).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.config import ModelConfig


def ring_attend(q, kt, vt, positions, cfg: ModelConfig, axis: str,
                slopes=None, sliding=None):
    """Ring attention for one sequence shard.

    q: [B, Tl, Hq, Dh] local queries; kt/vt: [B, Hkv, Tl, Dh] local K/V
    block; positions: [B, Tl] global positions of the local tokens.
    Returns [B, Tl, Hq*Dh] (f32), exactly matching _attend_nocache run on
    the gathered sequence.
    """
    B, Tl, Hq, Dh = q.shape
    Hkv = kt.shape[1]
    G = Hq // Hkv
    sp = jax.lax.psum(1, axis)
    scale = cfg.attn_scale if cfg.attn_scale is not None else Dh ** -0.5

    qh = (q.reshape(B, Tl, Hkv, G, Dh).transpose(0, 2, 3, 1, 4)
          .astype(jnp.float32) * scale)                    # [B,Hkv,G,Tl,Dh]
    q_pos = positions[:, :, None]                          # [B, Tl, 1]

    m0 = jnp.full((B, Hkv, G, Tl), -1e30, jnp.float32)
    l0 = jnp.zeros((B, Hkv, G, Tl), jnp.float32)
    a0 = jnp.zeros((B, Hkv, G, Tl, Dh), jnp.float32)
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    def hop(carry, _):
        kb, vb, pb, m, l, acc = carry
        from ..models.transformer import masked_scores
        s, mask = masked_scores(qh, kb, q_pos, pb[:, None, :], cfg,
                                slopes, sliding)

        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.exp(s - m_new[..., None])
        # fully-masked block rows: m_new stays -1e30 → p rows are exp(0)=1
        # garbage; zero them via the mask sum instead of the exp
        p = jnp.where(mask[:, None, None, :, :], p, 0.0)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + p.sum(axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhgts,bhsd->bhgtd", p, vb.astype(jnp.float32))
        kb, vb, pb = (jax.lax.ppermute(t, axis, perm) for t in (kb, vb, pb))
        return (kb, vb, pb, m_new, l, acc), None

    (_, _, _, _, l, acc), _ = jax.lax.scan(
        hop, (kt, vt, positions, m0, l0, a0), None, length=sp)
    out = acc / jnp.maximum(l[..., None], 1e-30)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, Tl, Hq * Dh)


def sequence_sharded_forward(params, tokens, cfg: ModelConfig, mesh: Mesh,
                             tp_axis: Optional[str] = None,
                             logits_dtype=jnp.float32):
    """Full-sequence (cache-free) forward with tokens sharded over "sp".

    tokens: [B, T] with T divisible by sp. Returns logits [B, T, V]
    sequence-sharded the same way. Norms/MLP/projections act per-token so
    they need no communication; attention is the ring above.
    """
    from ..models.transformer import forward
    from .sharding import param_specs

    sp = mesh.shape["sp"]
    pspecs = param_specs(params, cfg)
    if "alibi_slopes" in params:
        pspecs["alibi_slopes"] = P(tp_axis) if tp_axis else P()
    if "rope_inv_freqs" in params:
        pspecs["rope_inv_freqs"] = P()

    def fn(p, toks):
        Tl = toks.shape[1]
        # global start offset of this rank's shard
        shard0 = jax.lax.axis_index("sp") * Tl
        start = jnp.full((toks.shape[0],), shard0, jnp.int32)
        logits, _ = forward(p, toks, start, None, cfg,
                            logits_dtype=logits_dtype,
                            tp_axis=tp_axis, sp_axis="sp")
        return logits

    return jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(pspecs, P(None, "sp")),
        out_specs=P(None, "sp", None),
        check_vma=False))(params, tokens)
