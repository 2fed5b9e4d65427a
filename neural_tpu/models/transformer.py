"""The unified functional decoder graph.

One graph for every decoder-only family in the reference zoo (the reference
builds one C++ NE graph per arch — e.g. neural_speed/models/llama/llama.cpp:53
``llama_model_eval_internal``; here the equivalent of that whole directory
family is this module + a per-family config mapping).

Design (TPU-first):
- functional: ``forward(params, tokens, start, cache, cfg)`` — pure, jittable,
  shardable with NamedSharding on the params/cache pytrees.
- layers are STACKED along a leading L axis and executed with ``lax.scan``
  (compile time O(1) in depth; XLA pipelines the per-layer collectives).
- KV cache: preallocated [L, B, S, H_kv, Dh] ring written with
  per-batch dynamic offsets (static shapes under jit; the reference's
  kv_cache_init analog is runtime/kvcache.py).
- every linear weight may be a QTensor (→ Pallas fused dequant matmul) or a
  plain array (→ MXU bf16 matmul), decided per-tensor at load/quantize time
  exactly like the reference's per-layer quant config
  (quant_config.h:180 ``quant_layer_base``).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.qtensor import QTensor
from ..ops.qmatmul import qmatmul, qmatmul_fused
from ..ops.norms import rms_norm, layer_norm
from ..ops.rope import rope_freqs, rope_cos_sin, apply_rope, alibi_slopes
from ..ops.attention import attend, quantize_kv
from .config import ModelConfig

Params = Dict[str, Any]


def linear(x: jnp.ndarray, w, b=None, out_dtype=None,
           lidx=None) -> jnp.ndarray:
    """Dispatch: QTensor → fused dequant matmul (``lidx`` selects the layer
    when w is a [L, ...] stack, streamed zero-copy); array → MXU matmul."""
    out_dtype = out_dtype or x.dtype
    if isinstance(w, QTensor):
        y = qmatmul(x, w, out_dtype=out_dtype, lidx=lidx)
    else:
        y = jnp.dot(x, w.astype(x.dtype),
                    preferred_element_type=jnp.float32).astype(out_dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def _norm(x, w, b, cfg: ModelConfig):
    if cfg.norm_type == "rmsnorm":
        return rms_norm(x, w, cfg.norm_eps, cfg.norm_offset)
    return layer_norm(x, w, b, cfg.norm_eps)


def _fuse_mode() -> str:
    """NTPU_FUSED_DECODE: "0" (default) / "1" (TPU) / "interpret" (CPU
    tests run the fused Pallas kernels in interpreter mode).

    Default OFF — measured NEGATIVE on the 7B decode step (v5e, round 4):
    device-time A/B gave 4.96 ms/tok unfused vs 5.07 fused at q4_j
    (g128) and 5.289 vs 5.295 at q4_0. The removed XLA fusions cost only
    ~1.2 us each (~0.07 ms/tok total), while feeding the MXU a COMPUTED
    x (norm output) instead of a direct ref read makes the 225 Pallas
    kernels ~0.8 us/call slower (+0.19 ms/tok). Kept as an opt-in lab
    path; revisit if Mosaic learns to keep computed operands in place."""
    import os
    return os.environ.get("NTPU_FUSED_DECODE", "0")


def _fuse_interpret() -> bool:
    return _fuse_mode() == "interpret"


def _can_fuse_block(x, cfg: ModelConfig, tp_axis) -> bool:
    """Decode-step elementwise fusion eligibility (see qmatmul_fused).

    The fused path folds pre-norms, the gated activation and the residual
    adds into the weight-streaming kernels — the decode step's XLA op
    count drops from ~39/layer to ~15/layer (measured round 4: each
    standalone fusion costs ~8 us of launch overhead against a 5 ms
    step). Only the plain serial-residual RMS-norm shape qualifies;
    everything else keeps the general graph. TP is excluded because the
    residual must be added AFTER the psum."""
    mode = _fuse_mode()
    if mode == "0":
        return False
    if not (jax.default_backend() == "tpu" or mode == "interpret"):
        return False
    B, T, _ = x.shape
    if B * T > 16 or tp_axis is not None:
        return False
    return (cfg.norm_type == "rmsnorm" and not cfg.parallel_residual
            and cfg.residual_alpha == 1.0 and not cfg.post_attn_norm
            and not cfg.post_ffn_norm)


def _lin_norm(x, w, b, norm_w, cfg: ModelConfig, lidx):
    """linear(rmsnorm(x)) with the norm fused into the kernel prologue when
    the shape/config allows; exact fallback otherwise (the duplicate
    rms_norm across q/k/v falls out via CSE under jit)."""
    B, T, D = x.shape
    if isinstance(w, QTensor) and b is None:
        y = qmatmul_fused(x.reshape(-1, D), w, out_dtype=x.dtype, lidx=lidx,
                          norm=(norm_w, cfg.norm_eps, cfg.norm_offset),
                          interpret=_fuse_interpret())
        if y is not None:
            return y.reshape(B, T, -1)
    return linear(_norm(x, norm_w, None, cfg), w, b, lidx=lidx)


def _act(x, kind: str):
    if kind == "silu":
        return jax.nn.silu(x)
    if kind == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if kind == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    if kind == "relu":
        return jax.nn.relu(x)
    raise ValueError(kind)


def _psum(x, tp_axis):
    return jax.lax.psum(x, tp_axis) if tp_axis else x


def _mlp(x, lp: Params, cfg: ModelConfig, tp_axis=None, lidx=None,
         ep_axis=None, pre_norm=None, res=None):
    """Under shard_map TP, w_gate/w_up are column-split (local output slice)
    and w_down is row-split → the down-proj result is a partial sum, reduced
    here with one psum (the reference's post-FFN ne_all_reduce,
    llama.cpp:693).

    Decode-fusion mode (_can_fuse_block): ``x`` is the RAW residual stream
    and ``pre_norm`` the ffn-norm weight (fused into the gate/up kernels);
    ``res`` makes the return value INCLUDE the residual, and the gated
    activation act(g)*u rides the w_down kernel's prologue.
    """
    if pre_norm is not None and cfg.is_moe:
        # MoE routing consumes the normed stream directly; norm outside
        x = _norm(x, pre_norm, None, cfg)
        pre_norm = None
    if cfg.is_moe:
        if ep_axis is not None:
            from ..parallel.ep import ep_moe
            down = ep_moe(x, lp, cfg, ep_axis, tp_axis=tp_axis)
        else:
            down = _moe_mlp(x, lp, cfg, tp_axis)
        return down if res is None else res + down
    gu_pair = None
    if cfg.mlp_gated:
        if "w_gateup" in lp:  # fused gate|up GEMM (fuse_layer_weights)
            if pre_norm is not None:
                gu = _lin_norm(x, lp["w_gateup"], lp.get("b_gateup"),
                               pre_norm, cfg, lidx)
            else:
                gu = linear(x, lp["w_gateup"], lp.get("b_gateup"), lidx=lidx)
            ng = lp["w_gateup"].N // 2
            gu_pair = (gu[..., :ng], gu[..., ng:])
        else:
            if pre_norm is not None:
                g = _lin_norm(x, lp["w_gate"], lp.get("b_gate"), pre_norm,
                              cfg, lidx)
                u = _lin_norm(x, lp["w_up"], lp.get("b_up"), pre_norm,
                              cfg, lidx)
            else:
                g = linear(x, lp["w_gate"], lp.get("b_gate"), lidx=lidx)
                u = linear(x, lp["w_up"], lp.get("b_up"), lidx=lidx)
            gu_pair = (g, u)
    else:
        if pre_norm is not None:
            h = _act(_lin_norm(x, lp["w_up"], lp.get("b_up"), pre_norm,
                               cfg, lidx), cfg.act)
        else:
            h = _act(linear(x, lp["w_up"], lp.get("b_up"), lidx=lidx),
                     cfg.act)
    # down projection: fold the residual into the kernel epilogue. The
    # gated activation STAYS an XLA op by default: in-kernel silu on the
    # [tm, I] stripe measured +0.2 ms/tok on a 7B decode (exp per N-tile)
    # while the XLA fusion it replaces costs ~1.2 us — the scratch-
    # persisted variant (NTPU_FUSE_GLU=1) recovers most but not all of it.
    import os as _os
    fuse_ok = (res is not None and tp_axis is None
               and lp.get("b_down") is None
               and isinstance(lp["w_down"], QTensor)
               and cfg.act in ("silu", "gelu_tanh", "relu"))
    if gu_pair is not None:
        g, u = gu_pair
        B, T, I = g.shape
        if fuse_ok and _os.environ.get("NTPU_FUSE_GLU") == "1":
            y = qmatmul_fused((g.reshape(B * T, I), u.reshape(B * T, I)),
                              lp["w_down"], out_dtype=x.dtype, lidx=lidx,
                              glu=cfg.act, res=res.reshape(B * T, -1),
                              interpret=_fuse_interpret())
            if y is not None:
                return y.reshape(B, T, -1)
        h = _act(g, cfg.act) * u
        if fuse_ok:
            y = qmatmul_fused(h.reshape(B * T, I), lp["w_down"],
                              out_dtype=x.dtype, lidx=lidx,
                              res=res.reshape(B * T, -1),
                              interpret=_fuse_interpret())
            if y is not None:
                return y.reshape(B, T, -1)
    elif fuse_ok:
        B, T, I = h.shape
        y = qmatmul_fused(h.reshape(B * T, I), lp["w_down"],
                          out_dtype=x.dtype, lidx=lidx,
                          res=res.reshape(B * T, -1),
                          interpret=_fuse_interpret())
        if y is not None:
            return y.reshape(B, T, -1)
    down = linear(h, lp["w_down"], lidx=lidx)
    down = _psum(down, tp_axis)
    if lp.get("b_down") is not None:
        down = down + lp["b_down"].astype(down.dtype)
    return down if res is None else res + down


def _moe_mlp(x, lp: Params, cfg: ModelConfig, tp_axis=None):
    """Mixtral/Grok-style top-k routed experts.

    Reference computes this with gathered per-token expert matmuls
    (ne_mul_mat_id / ne_mul_id_ffn_silu, llama.cpp:622-693). Two TPU-native
    strategies:
    - **grouped (megablocks-style)**: sort the B·T·k (token, expert)
      assignments by expert and run one ``lax.ragged_dot`` per projection —
      FLOPs ∝ k/E of the dense mixture. Used for prefill-sized batches
      with dense (unquantized) expert weights.
    - **dense mixture**: run every expert on all tokens and mask by router
      weight — static shapes, no gather; used for decode (tiny token
      counts) and QTensor experts (Pallas consumes the packed [E, ...]
      stacks directly; dequantizing all experts for ragged_dot would cost
      more HBM than the saved FLOPs).
    """
    B, T, D = x.shape
    logits = linear(x, lp["router"]).astype(jnp.float32)      # [B, T, E]
    top_w, top_idx = jax.lax.top_k(logits, cfg.n_experts_active)
    if cfg.moe_norm_topk:
        top_w = jax.nn.softmax(top_w, axis=-1)
    else:
        top_w = jnp.take_along_axis(jax.nn.softmax(logits, axis=-1),
                                    top_idx, axis=-1)

    ex = lp["experts"]
    dense_experts = all(not isinstance(v, QTensor) for v in ex.values())
    no_bias = not any(k.startswith("b_") for k in ex)
    if dense_experts and no_bias and B * T >= 8:
        return _moe_grouped(x, ex, top_w, top_idx, cfg, tp_axis)

    # dense expert mixture weights [B, T, E]
    mix = jnp.zeros_like(logits).at[
        jnp.arange(B)[:, None, None], jnp.arange(T)[None, :, None], top_idx
    ].set(top_w)

    def one_expert(e_params):
        ecfg = dataclasses.replace(cfg, n_experts=0)
        # defer the TP psum: sum partials over experts first, reduce once
        return _mlp(x, e_params, ecfg, tp_axis=None)          # [B, T, D]

    outs = jax.lax.map(one_expert, lp["experts"])             # [E, B, T, D]
    out = jnp.einsum("ebtd,bte->btd", outs.astype(jnp.float32), mix)
    return _psum(out, tp_axis).astype(x.dtype)


def _moe_grouped(x, ex: Params, top_w, top_idx, cfg: ModelConfig,
                 tp_axis=None):
    """Megablocks-style grouped expert MLP via lax.ragged_dot.

    Assignments sorted by expert id form contiguous row groups; each
    projection is ONE ragged matmul over [S·k, D] with per-group expert
    weights [E, D, I] — the MXU analog of the reference's ne_mul_mat_id
    gather-matmul (ne_layers.h:265), with static shapes (group sizes are
    data, not shape).
    """
    B, T, D = x.shape
    S = B * T
    k = cfg.n_experts_active
    E = cfg.n_experts
    xf = x.reshape(S, D)
    eid = top_idx.reshape(S * k)
    tok = jnp.repeat(jnp.arange(S), k)
    order = jnp.argsort(eid, stable=True)
    tok_sorted = tok[order]
    xs = jnp.take(xf, tok_sorted, axis=0)                     # [S*k, D]
    gsz = jnp.bincount(eid, length=E).astype(jnp.int32)

    def rdot(lhs, w):
        return jax.lax.ragged_dot(
            lhs.astype(jnp.bfloat16), w.astype(jnp.bfloat16), gsz,
            preferred_element_type=jnp.float32)

    if cfg.mlp_gated:
        h = _act(rdot(xs, ex["w_gate"]), cfg.act) * rdot(xs, ex["w_up"])
    else:
        h = _act(rdot(xs, ex["w_up"]), cfg.act)
    d = rdot(h, ex["w_down"])                                 # [S*k, D] f32
    w_sorted = top_w.reshape(S * k)[order].astype(jnp.float32)
    out = jnp.zeros((S, D), jnp.float32).at[tok_sorted].add(
        d * w_sorted[:, None])
    return _psum(out, tp_axis).reshape(B, T, D).astype(x.dtype)


def masked_scores(qh, kb, q_pos, kv_pos, cfg: ModelConfig, slopes=None,
                  sliding=None):
    """Masked attention scores for one KV block, shared by the cache-free
    oracle below and ring attention (parallel/sp.py — MUST stay a single
    implementation so the ring matches its oracle exactly).

    qh: [B, Hkv, G, Tq, Dh] f32 PRE-SCALED queries; kb: [B, Hkv, Ts, Dh];
    q_pos [B, Tq, 1] / kv_pos [B, 1, Ts] global positions. Returns
    (scores [B, Hkv, G, Tq, Ts] with -1e30 at masked slots, mask)."""
    Hkv, G = qh.shape[1], qh.shape[2]
    s = jnp.einsum("bhgtd,bhsd->bhgts", qh, kb.astype(jnp.float32))
    if cfg.attn_softcap:
        s = cfg.attn_softcap * jnp.tanh(s / cfg.attn_softcap)
    mask = kv_pos <= q_pos
    if cfg.sliding_window and sliding is not None:
        mask = mask & ((kv_pos > q_pos - cfg.sliding_window)
                       | jnp.logical_not(sliding))
    elif cfg.sliding_window:
        mask = mask & (kv_pos > q_pos - cfg.sliding_window)
    if cfg.use_alibi and slopes is not None:
        dist = (kv_pos - q_pos).astype(jnp.float32)
        s = s + (slopes.reshape(Hkv, G)[None, :, :, None, None]
                 * dist[:, None, None, :, :])
    s = jnp.where(mask[:, None, None, :, :], s, jnp.float32(-1e30))
    return s, mask


def _attend_nocache(q, kt, vt, positions, cfg: ModelConfig, slopes=None,
                    sliding=None):
    """Cache-free causal attention over the current block (training path).

    q: [B, T, Hq, Dh]; kt/vt: [B, Hkv, T, Dh]; positions: [B, T] global.
    f32 softmax; GQA by head-group reshape. The inference paths (attend /
    flash_decode) never hit this — it exists for the training step and as
    the single-device oracle for ring attention (parallel/sp.py)."""
    B, T, Hq, Dh = q.shape
    Hkv = kt.shape[1]
    G = Hq // Hkv
    scale = cfg.attn_scale if cfg.attn_scale is not None else Dh ** -0.5
    qh = (q.reshape(B, T, Hkv, G, Dh).transpose(0, 2, 3, 1, 4)
          .astype(jnp.float32) * scale)
    s, _ = masked_scores(qh, kt, positions[:, :, None], positions[:, None, :],
                         cfg, slopes, sliding)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgts,bhsd->bhgtd", p, vt.astype(jnp.float32))
    return o.transpose(0, 3, 1, 2, 4).reshape(B, T, Hq * Dh)


def _attention(x, lp: Params, cfg: ModelConfig, k_all, v_all, ks_all, vs_all,
               lidx, start, positions, inv_freqs, slopes, tp_axis=None,
               sliding=None, table=None, sp_axis=None, prompt_len=None,
               pre_norm=None, res=None):
    """x: [B, T, D]; k_all/v_all: FULL stacked caches [L, B, Hkv, S, Dh]
    (head-major, bf16 or int8 with flat bf16 scales [L, B, Hkv, S]); ``lidx`` is
    this layer's index; start: [B] int32.

    Mirrors the per-layer attention block of llama.cpp:217-592 (fused QKV →
    rope → KV append (ne_flash_attn_update_k/v) → fused attention → output
    proj). The caches are carried WHOLE and only the new tokens' slots are
    written (16KB, not a rewrite of the layer's cache slice): under a
    donated lax.scan carry XLA updates them in place, which is what keeps
    decode HBM traffic at just the attention KV read.

    Decode-fusion mode (_can_fuse_block): ``x`` is the RAW residual stream
    and ``pre_norm`` the attn-norm weight — the RMS norm rides the q/k/v
    kernels' prologue; ``res`` makes the return value INCLUDE the residual
    (fused into the wo kernel's epilogue).
    """
    B, T, D = x.shape
    Dh = cfg.head_dim

    def proj(wn, bn):
        if pre_norm is not None:
            return _lin_norm(x, lp[wn], lp.get(bn), pre_norm, cfg, lidx)
        return linear(x, lp[wn], lp.get(bn), lidx=lidx)

    def proj_out(out):
        """wo projection (+psum/bias) with the block residual fused into
        the kernel epilogue when ``res`` is set."""
        if res is not None and lp.get("bo") is None \
                and isinstance(lp["wo"], QTensor):
            y = qmatmul_fused(out.reshape(B * T, -1), lp["wo"],
                              out_dtype=x.dtype, lidx=lidx,
                              res=res.reshape(B * T, -1),
                              interpret=_fuse_interpret())
            if y is not None:
                return y.reshape(B, T, -1)
        o = linear(out, lp["wo"], lidx=lidx)
        o = _psum(o, tp_axis)
        if lp.get("bo") is not None:
            o = o + lp["bo"].astype(o.dtype)
        if res is not None:
            o = res + o
        return o

    if "wqkv" in lp:
        # fused projection (runtime.generate.fuse_layer_weights; reference
        # fused-QKV op ne_bestla.h:42) — single-device layout, so the
        # segment widths come from cfg.
        qkv = proj("wqkv", "bqkv")
        nq = cfg.n_heads * Dh
        nkv = cfg.n_kv_heads * Dh
        q = qkv[..., :nq]
        k = qkv[..., nq:nq + nkv]
        v = qkv[..., nq + nkv:]
    else:
        q = proj("wq", "bq")
        k = proj("wk", "bk")
        v = proj("wv", "bv")
    # head counts derived from (possibly TP-sharded) local widths: under
    # shard_map each rank holds n_heads/tp heads (reference analog:
    # llama.cpp:117-123 n_head /= world_size).
    Hq, Hkv = q.shape[-1] // Dh, k.shape[-1] // Dh
    q = q.reshape(B, T, Hq, Dh)
    k = k.reshape(B, T, Hkv, Dh)
    v = v.reshape(B, T, Hkv, Dh)

    if cfg.qk_norm:
        q = rms_norm(q, lp["q_norm_w"], cfg.norm_eps)
        k = rms_norm(k, lp["k_norm_w"], cfg.norm_eps)

    if cfg.rope_style == "glm1":
        # ChatGLM v1's 2-D GLM RoPE (position + generation-block halves)
        from ..ops.rope import apply_rope_glm1
        q = apply_rope_glm1(q, positions, prompt_len, inv_freqs)
        k = apply_rope_glm1(k, positions, prompt_len, inv_freqs)
    elif cfg.rope_style != "none":
        cos, sin = rope_cos_sin(positions, inv_freqs)  # [B, T, d/2]
        q = apply_rope(q, cos, sin, cfg.rope_style, cfg.rope_dim)
        k = apply_rope(k, cos, sin, cfg.rope_style, cfg.rope_dim)

    # append ONLY the new tokens to the full stacked cache at (lidx, b, :,
    # start_b). The batch dim is unrolled into B direct dynamic_update_slice
    # ops: a vmapped dus (per-batch traced offsets) cannot lower to a real
    # dus — XLA rebuilt each layer's whole [Hkv, S, Dh] slice through a
    # select (measured 4.2 ms/tok of copies on a 7B, ~30% of decode).
    kt = k.transpose(0, 2, 1, 3)                     # [B, Hkv, T, Dh]
    vt = v.transpose(0, 2, 1, 3)
    if k_all is None:
        # cache-free full-sequence attention (training / sequence-parallel
        # path): attend within the current block only, causal over global
        # `positions`. With sp_axis set, K/V blocks ring over the mesh
        # (parallel/sp.py) so each rank only ever holds 1/sp of the sequence.
        if sp_axis is not None:
            from ..parallel.sp import ring_attend
            out = ring_attend(q, kt, vt, positions, cfg, sp_axis,
                              slopes=slopes, sliding=sliding)
        else:
            out = _attend_nocache(q, kt, vt, positions, cfg, slopes, sliding)
        out = out.astype(x.dtype)
        return proj_out(out), None, None, None, None
    if table is not None:
        # paged pool [(L,) P, Hkv, ps, Dh]: page-table writes + paged
        # attention (ops/paged_attention.py)
        from ..ops.paged_attention import paged_update_kv, attend_paged
        k_all, v_all, ks_all, vs_all = paged_update_kv(
            k_all, v_all, ks_all, vs_all, kt, vt, table, start, lidx)
        out = attend_paged(q, k_all, v_all, ks_all, vs_all, table, positions,
                           cfg, slopes=slopes, sliding=sliding,
                           lidx=lidx).astype(x.dtype)
        return proj_out(out), k_all, v_all, ks_all, vs_all
    if ks_all is not None:  # int8 KV (reference packed int8 KV layouts)
        kt, ks_new = quantize_kv(kt)                 # scales [B, Hkv, T]
        vt, vs_new = quantize_kv(vt)

        def upds(sc_all, new, starts):                # sc_all [L,B,Hkv,S]
            B_, H_, T_ = new.shape
            new = new.astype(sc_all.dtype)
            for b in range(B_):
                sc_all = jax.lax.dynamic_update_slice(
                    sc_all, new[b][None, None],
                    (lidx, b, 0, starts[b]))
            return sc_all
        ks_all = upds(ks_all, ks_new, start)
        vs_all = upds(vs_all, vs_new, start)

    def upd(cache, new, starts):                      # cache [L,B,Hkv,S,Dh]
        new = new.astype(cache.dtype)
        for b in range(new.shape[0]):
            cache = jax.lax.dynamic_update_slice(
                cache, new[b][None, None], (lidx, b, 0, starts[b], 0))
        return cache
    k_all = upd(k_all, kt, start)
    v_all = upd(v_all, vt, start)

    # caches stay STACKED: the Pallas decode kernel streams layer lidx
    # directly; the XLA fallback slices inside attend (fused, no copy).
    out = attend(q, k_all, v_all, ks_all, vs_all, positions, cfg,
                 slopes=slopes, sliding=sliding, lidx=lidx,
                 prefix_len=prompt_len if cfg.prefix_lm else None
                 ).astype(x.dtype)
    # wo is row-split under TP → partial sums; one psum here is the
    # reference's post-attention ne_all_reduce (llama.cpp:592).
    return proj_out(out), k_all, v_all, ks_all, vs_all


def _block(x, lp: Params, cfg: ModelConfig, k_all, v_all, ks_all, vs_all,
           lidx, start, positions, inv_freqs, slopes, tp_axis=None,
           table=None, sp_axis=None, ep_axis=None, prompt_len=None):
    if _can_fuse_block(x, cfg, tp_axis):
        # decode fast path: norms/activation/residuals ride the Pallas
        # weight kernels (see _can_fuse_block); bit-identical to the
        # general path below
        x, k_all, v_all, ks_all, vs_all = _attention(
            x, lp, cfg, k_all, v_all, ks_all, vs_all, lidx, start,
            positions, inv_freqs, slopes, tp_axis,
            sliding=lp.get("use_sliding"), table=table, sp_axis=sp_axis,
            prompt_len=prompt_len, pre_norm=lp["attn_norm_w"], res=x)
        x = _mlp(x, lp, cfg, tp_axis, lidx, ep_axis,
                 pre_norm=lp["ffn_norm_w"], res=x)
        return x, k_all, v_all, ks_all, vs_all
    h = _norm(x, lp["attn_norm_w"], lp.get("attn_norm_b"), cfg)
    attn_out, k_all, v_all, ks_all, vs_all = _attention(
        h, lp, cfg, k_all, v_all, ks_all, vs_all, lidx, start, positions,
        inv_freqs, slopes, tp_axis, sliding=lp.get("use_sliding"),
        table=table, sp_axis=sp_axis, prompt_len=prompt_len)
    if cfg.post_attn_norm:
        attn_out = _norm(attn_out, lp["post_attn_norm_w"],
                         lp.get("post_attn_norm_b"), cfg)
    if cfg.residual_alpha != 1.0:
        # ChatGLM v1 / GLM DeepNorm-style residuals: the NORMED branch
        # input (scaled by alpha = sqrt(2L)) is the residual base, not x
        # (reference: chatglm.cpp:237-238, 263-264 ne_scale alpha).
        alpha = jnp.asarray(cfg.residual_alpha, x.dtype)
        x = h * alpha + attn_out
        h2 = _norm(x, lp["ffn_norm_w"], lp.get("ffn_norm_b"), cfg)
        mlp_out = _mlp(h2, lp, cfg, tp_axis, lidx, ep_axis)
        x = h2 * alpha + mlp_out
    elif cfg.parallel_residual:
        # gptj/gptneox/phi: mlp(norm2(x)) + attn(norm1(x)) + x;
        # gptj shares one norm (params tie attn/ffn norm at conversion).
        h2 = _norm(x, lp["ffn_norm_w"], lp.get("ffn_norm_b"), cfg) \
            if "ffn_norm_w" in lp else h
        x = x + attn_out + _mlp(h2, lp, cfg, tp_axis, lidx, ep_axis)
    else:
        x = x + attn_out
        h2 = _norm(x, lp["ffn_norm_w"], lp.get("ffn_norm_b"), cfg)
        mlp_out = _mlp(h2, lp, cfg, tp_axis, lidx, ep_axis)
        if cfg.post_ffn_norm:
            mlp_out = _norm(mlp_out, lp["post_ffn_norm_w"],
                            lp.get("post_ffn_norm_b"), cfg)
        x = x + mlp_out
    return x, k_all, v_all, ks_all, vs_all


def forward(params: Params, tokens: jnp.ndarray, start: jnp.ndarray,
            cache: Tuple[jnp.ndarray, jnp.ndarray], cfg: ModelConfig,
            logits_dtype=jnp.float32, tp_axis: Optional[str] = None,
            sp_axis: Optional[str] = None, ep_axis: Optional[str] = None,
            prompt_len: Optional[jnp.ndarray] = None,
            logit_positions: Optional[jnp.ndarray] = None,
            unroll_layers: bool = False):
    """Run the decoder.

    tokens: [B, T] int32; start: [B] int32 (write offset in the KV cache =
    number of tokens already processed per row); cache: KVCache with
    head-major [L, B, Hkv, S, Dh] k/v (+ scales if int8), or None for the
    cache-free full-sequence path (training / sp ring attention — with
    ``sp_axis`` set, tokens are the rank's sequence shard and ``start``
    must already include the shard offset). ``prompt_len`` [B]: the
    per-request prompt size, required by prefix-LM archs (ChatGLM v1 —
    2-D GLM RoPE anchor + bidirectional-prefix mask); defaults to
    start+T on the first call (prefill) when omitted. ``logit_positions``
    [B]: per-row token index whose logits are wanted (ragged batched
    prefill); the lm_head then runs on [B, 1, D] instead of [B, T, D] —
    for a 2k prompt that skips ~0.5 TFLOP of dead vocab matmul and the
    [B, T, V] f32 materialization. Returns (logits [B, T, V] — or
    [B, 1, V] with logit_positions — , new_cache). Analog of model_eval
    (llama.cpp:790) for prefill and decode alike.
    """
    from ..runtime.kvcache import KVCache
    if cache is None:
        k_all = v_all = ks_all = vs_all = table = None
    else:
        k_all, v_all = cache[0], cache[1]
        ks_all = cache.k_scale if hasattr(cache, "k_scale") else None
        vs_all = cache.v_scale if hasattr(cache, "v_scale") else None
        table = getattr(cache, "table", None)  # paged pool (runtime/paged.py)
    B, T = tokens.shape
    positions = start[:, None] + jnp.arange(T)[None, :]        # [B, T]
    if (cfg.prefix_lm or cfg.rope_style == "glm1") and prompt_len is None:
        prompt_len = start + T   # prefill convention: the whole call is the prompt

    x = jnp.take(params["embed"], tokens, axis=0)              # [B, T, D]
    x = x.astype(jnp.bfloat16)
    if cfg.embed_scale != 1.0:
        x = x * jnp.asarray(cfg.embed_scale, x.dtype)
    if cfg.learned_pos_emb:
        x = x + jnp.take(params["pos_embed"], positions + cfg.pos_offset,
                         axis=0).astype(x.dtype)
    if "embed_norm_w" in params:  # bloom word_embeddings_layernorm
        x = layer_norm(x, params["embed_norm_w"], params.get("embed_norm_b"),
                       cfg.norm_eps)

    inv_freqs = params.get("rope_inv_freqs")
    slopes = params.get("alibi_slopes")

    # The caches travel in the scan CARRY (only the new tokens' slots are
    # written each layer). QTensor weights are NOT scan xs: they stay
    # closed-over stacks and the Pallas kernel streams layer `lidx`
    # directly from the stacked HBM buffers (scan xs slicing would
    # materialize a full copy of every weight, every step — measured at
    # ~9 ms/step on a 7B). Small per-layer leaves (norms, biases, flags)
    # are sliced in-body; those slices fuse.
    def make_lp(layers, lidx):
        lp: Dict[str, Any] = {}
        for name, v in layers.items():
            if isinstance(v, QTensor):
                lp[name] = v                       # stacked; lidx at matmul
            elif isinstance(v, dict):              # experts subtree
                lp[name] = jax.tree.map(
                    lambda a: jax.lax.dynamic_index_in_dim(
                        a, lidx, 0, keepdims=False), v)
            else:
                lp[name] = jax.lax.dynamic_index_in_dim(
                    v, lidx, 0, keepdims=False)
        return lp

    if isinstance(params["layers"], (list, tuple)):
        # unrolled layers (opt-in decode mode): weights are separate
        # loop-invariant buffers
        for l, lp in enumerate(params["layers"]):
            x, k_all, v_all, ks_all, vs_all = _block(
                x, lp, cfg, k_all, v_all, ks_all, vs_all,
                jnp.int32(l), start, positions, inv_freqs, slopes, tp_axis,
                table, sp_axis, ep_axis, prompt_len)
    elif unroll_layers:
        # UNROLLED over STACKED layers: the decode path for native-at-rest
        # weights — each layer's Pallas call streams its slice straight
        # from the [L, ...] HBM stacks via the prefetched index (make_lp
        # keeps QTensors stacked), so the executable holds NO weight
        # copies and no lax.scan carry can sink the stacks into staging
        # buffers (the measured 4.2 ms/tok scan pathology).
        layers = params["layers"]
        L = jax.tree.leaves(layers)[0].shape[0]
        for l in range(L):
            lp = make_lp(layers, jnp.int32(l))
            x, k_all, v_all, ks_all, vs_all = _block(
                x, lp, cfg, k_all, v_all, ks_all, vs_all,
                jnp.int32(l), start, positions, inv_freqs, slopes, tp_axis,
                table, sp_axis, ep_axis, prompt_len)
    else:
        layers = params["layers"]
        L = jax.tree.leaves(layers)[0].shape[0]

        def body(carry, lidx):
            x, k_all, v_all, ks_all, vs_all = carry
            lp = make_lp(layers, lidx)
            x, k_all, v_all, ks_all, vs_all = _block(
                x, lp, cfg, k_all, v_all, ks_all, vs_all, lidx, start,
                positions, inv_freqs, slopes, tp_axis, table, sp_axis,
                ep_axis, prompt_len)
            return (x, k_all, v_all, ks_all, vs_all), None

        (x, k_all, v_all, ks_all, vs_all), _ = jax.lax.scan(
            body, (x, k_all, v_all, ks_all, vs_all), jnp.arange(L))

    if logit_positions is not None:
        # gather the wanted rows BEFORE the final norm (norm is per-token,
        # so slice-then-norm == norm-then-slice — and the norm then runs
        # on [B, 1, D] instead of the whole prefill)
        x = x[jnp.arange(B)[:, None], logit_positions[:, None]]  # [B, 1, D]
    lm_head = params.get("lm_head")
    logits = None
    if cfg.final_norm:
        if (lm_head is not None and isinstance(lm_head, QTensor)
                and params.get("final_norm_b") is None
                and params.get("lm_head_b") is None
                and _can_fuse_block(x, cfg, tp_axis)):
            # decode fast path: final norm rides the lm_head kernel
            Bx, Tx, Dx = x.shape
            y = qmatmul_fused(
                x.reshape(-1, Dx), lm_head, out_dtype=jnp.float32,
                norm=(params["final_norm_w"], cfg.norm_eps,
                      cfg.norm_offset),
                interpret=_fuse_interpret())
            if y is not None:
                logits = y.reshape(Bx, Tx, -1)
        if logits is None:
            x = _norm(x, params["final_norm_w"], params.get("final_norm_b"),
                      cfg)
    if logits is None:
        if lm_head is None:  # tied embeddings
            logits = jnp.dot(x.astype(jnp.bfloat16),
                             params["embed"].astype(jnp.bfloat16).T,
                             preferred_element_type=jnp.float32)
        else:
            # lm_head is column(vocab)-split under TP; gather vocab shards
            logits = linear(x, lm_head, params.get("lm_head_b"),
                            out_dtype=jnp.float32)
            if tp_axis:
                logits = jax.lax.all_gather(logits, tp_axis, axis=-1,
                                            tiled=True)
    logits = logits.astype(jnp.float32)
    if cfg.logit_softcap:
        logits = cfg.logit_softcap * jnp.tanh(logits / cfg.logit_softcap)
    if table is not None:
        from ..runtime.paged import PagedKVCache
        new_cache = PagedKVCache(k_all, v_all, ks_all, vs_all, table)
    elif k_all is None:
        new_cache = None
    else:
        new_cache = KVCache(k_all, v_all, ks_all, vs_all)
    return logits.astype(logits_dtype), new_cache
