"""Pipeline parallelism: GPipe microbatch schedule over a ``pp`` mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.6: PP ❌ — enum
stubs only). TPU-native design: the layer stack [L, ...] is sharded on its
leading axis over ``pp`` (each stage holds L/pp contiguous layers, the
natural pipeline analog of the reference's per-tensor split table); a
microbatch ring runs inside one ``shard_map``: every tick each stage runs
its local layers on the activation received from its predecessor and
``ppermute``s the result forward. M microbatches drain in M + pp - 1
ticks (the GPipe bubble). Activations ride ICI neighbor links; under one
jit, XLA overlaps the ppermute with the next tick's compute.

Composition with the other axes inside the same shard_map:
- ``dp``: batch-sharded inputs, gradient psum (transpose-correct).
- ``tp``: per-layer tensor parallelism via the split table
  (parallel/sharding.py) with explicit psums in models/transformer.py.

Gradient correctness under ``check_vma=False``: cotangents that cross
collectives (psum/ppermute/all_gather) are routed exactly by their
transposes; what AD canNOT know is that an in_spec-replicated leaf (norm
weights, embed, rope tables) received only a PARTIAL cotangent on each
rank. The fix is uniform: for every grad leaf, psum over exactly the mesh
axes absent from its PartitionSpec (``fix_replicated_grads``) — sharded
leaves arrive complete, replicated leaves are disjoint partials that sum
to the true gradient (the scalar loss is constructed to be counted ONCE
across the mesh, see ``make_pp_train_step``).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.config import ModelConfig


def pp_param_specs(params, cfg: ModelConfig, tp: bool = True):
    """TP split-table specs with the stacked-layer leading dim over 'pp'."""
    from .sharding import param_specs
    specs = param_specs(params, cfg)

    def pipeline(s):
        if not isinstance(s, P):
            return s
        if len(s) == 0:
            return P("pp")
        return P("pp", *s[1:])

    specs["layers"] = jax.tree.map(
        pipeline, specs["layers"], is_leaf=lambda x: isinstance(x, P))
    if "alibi_slopes" in params:
        specs["alibi_slopes"] = P("tp") if tp else P()
    if "rope_inv_freqs" in params:
        specs["rope_inv_freqs"] = P()
    return specs


def _spec_axes(s: P):
    out = set()
    for e in s:
        if e is None:
            continue
        for a in (e if isinstance(e, tuple) else (e,)):
            out.add(a)
    return out


def fix_replicated_grads(grads, specs, mesh_axes):
    """psum each grad leaf over the mesh axes absent from its spec.

    Replicated (unmentioned-axis) leaves carry per-rank PARTIAL cotangents
    under shard_map AD; summing the disjoint partials reconstructs the true
    gradient. Sharded leaves (axis in spec) arrived complete through
    collective transposes and are left alone.
    """
    def fix(g, s):
        named = _spec_axes(s) if isinstance(s, P) else set()
        missing = tuple(a for a in mesh_axes if a not in named)
        return jax.lax.psum(g, missing) if missing else g
    return jax.tree.map(fix, grads, specs,
                        is_leaf=lambda x: isinstance(x, P))


def pipeline_apply(layers, x_mb, positions, cfg: ModelConfig, inv_freqs,
                   slopes, n_stages: int, tp_axis: Optional[str] = None):
    """Run the microbatch pipeline (per-rank code, inside shard_map).

    layers: this stage's local layer stack ([L/pp, ...] leaves);
    x_mb: [M, mb, T, D] microbatched activations (consumed by stage 0);
    returns [M, mb, T, D] final-stage activations, replicated over pp.
    """
    from ..models.transformer import _block

    M = x_mb.shape[0]
    stage = jax.lax.axis_index("pp")

    def run_stage(x):
        def body(h, lp):
            h, *_ = _block(h, lp, cfg, None, None, None, None,
                           jnp.int32(0),
                           jnp.zeros((h.shape[0],), jnp.int32),
                           positions, inv_freqs, slopes, tp_axis)
            return h, None
        return jax.lax.scan(body, x, layers)[0]

    fwd = [(i, i + 1) for i in range(n_stages - 1)]
    out0 = jnp.zeros_like(x_mb)
    recv0 = jnp.zeros_like(x_mb[0])

    def tick(carry, t):
        recv, outbuf = carry
        x0 = jax.lax.dynamic_index_in_dim(
            x_mb, jnp.clip(t, 0, M - 1), 0, keepdims=False)
        xin = jnp.where(stage == 0, x0, recv)
        y = run_stage(xin)
        sent = jax.lax.ppermute(y, "pp", fwd) if n_stages > 1 else y
        mo = t - (n_stages - 1)
        upd = jax.lax.dynamic_update_index_in_dim(
            outbuf, y, jnp.clip(mo, 0, M - 1), 0)
        outbuf = jnp.where(mo >= 0, upd, outbuf)
        return (sent, outbuf), None

    (_, outbuf), _ = jax.lax.scan(
        tick, (recv0, out0), jnp.arange(M + n_stages - 1))
    # broadcast the last stage's buffer to every stage
    last = (stage == n_stages - 1).astype(outbuf.dtype)
    return jax.lax.psum(outbuf * last, "pp")


def make_pp_train_step(params, cfg: ModelConfig, mesh: Mesh,
                       n_microbatches: int, lr: float = 1e-3):
    """Build a jitted dp+pp+tp training step (CE loss, SGD update).

    params: DENSE (unquantized) pytree with stacked [L, ...] layers;
    tokens: [B, T+1] int32, B divisible by dp * n_microbatches.
    Returns step(params, tokens) -> (loss, new_params), params/grads
    sharded per ``pp_param_specs``.
    """
    from ..models.transformer import _norm, linear

    S = mesh.shape["pp"]
    tp = mesh.shape.get("tp", 1)
    dp = mesh.shape.get("dp", 1)
    tp_axis = "tp" if tp > 1 else None
    assert cfg.n_layers % S == 0, (cfg.n_layers, S)
    specs = pp_param_specs(params, cfg, tp=tp > 1)
    M = n_microbatches

    def loss_fn(p, toks):
        B, T1 = toks.shape
        T = T1 - 1
        x = jnp.take(p["embed"], toks[:, :-1], axis=0).astype(jnp.bfloat16)
        if cfg.embed_scale != 1.0:
            x = x * jnp.asarray(cfg.embed_scale, x.dtype)
        positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
        if cfg.learned_pos_emb:
            x = x + jnp.take(p["pos_embed"], positions + cfg.pos_offset,
                             axis=0).astype(x.dtype)
        mb = B // M
        x_mb = x.reshape(M, mb, T, -1)
        pos_mb = positions[:mb]
        y = pipeline_apply(p["layers"], x_mb, pos_mb, cfg,
                           p.get("rope_inv_freqs"), p.get("alibi_slopes"),
                           S, tp_axis)
        y = y.reshape(B, T, -1)
        if cfg.final_norm:
            y = _norm(y, p["final_norm_w"], p.get("final_norm_b"), cfg)
        if p.get("lm_head") is None:
            logits = jnp.dot(y, p["embed"].astype(y.dtype).T,
                             preferred_element_type=jnp.float32)
        else:
            logits = linear(y, p["lm_head"], p.get("lm_head_b"),
                            out_dtype=jnp.float32)
            if tp_axis:
                logits = jax.lax.all_gather(logits, tp_axis, axis=-1,
                                            tiled=True)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(lp, toks[:, 1:, None], axis=-1).mean()
        # Count the loss ONCE across the mesh (only last stage, tp rank 0
        # contributes) and return it as a whole-mesh pmean. Why: with
        # check_vma=False, shard_map AD seeds the scalar's cotangent as 1
        # on EVERY rank, so per-rank grads are partials of Σ_ranks(loss_r);
        # with loss_r = (Σ contrib)/N that sum telescopes to the true loss,
        # making fix_replicated_grads' psum-the-partials rule exact.
        mine = ((jax.lax.axis_index("pp") == S - 1) &
                ((jax.lax.axis_index("tp") == 0) if tp > 1 else True))
        contrib = jnp.where(mine, nll / dp, 0.0)
        n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        return jax.lax.psum(contrib, mesh.axis_names) / n

    n_mesh = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))

    def train_step(p, toks):
        loss, grads = jax.value_and_grad(loss_fn)(p, toks)
        loss = loss * n_mesh  # undo the pmean division in the scalar value
        grads = fix_replicated_grads(grads, specs, mesh.axis_names)
        new_p = jax.tree.map(lambda w, g: w - lr * g.astype(w.dtype),
                             p, grads)
        return loss, new_p

    in_tok = P("dp", None)
    fn = jax.shard_map(train_step, mesh=mesh,
                       in_specs=(specs, in_tok),
                       out_specs=(P(), specs),
                       check_vma=False)
    return jax.jit(fn)
