"""Fused attention with (optionally int8-quantized) KV cache.

TPU-native replacement for the reference's fused-MHA stack
(neural_speed/core/layers/mha_dense.h:24-150 ``bestla_reordered_attn_fp32_*``
+ mha_dense_wrapper.h:546 ``mha_interface_t``: flash-style softmax(QK^T)V
over a packed, optionally int8 KV cache, GQA/MQA, ALiBi, causal masks).

Cache layout is head-major ``[B, Hkv, S, Dh]`` (the analog of the
reference's NTILE-reordered packed KV, mha_dense.h:35 ATTN_FWD_LAYOUT):
per-head KV is contiguous, so Pallas S-blocks tile legally and stream at
full HBM bandwidth. int8 KV scales are stored FLAT ``[B, Hkv, S]`` in
bf16 — 2 bytes per (token, head) next to 128 bytes of int8 codes (~1.6%
overhead). Tile legality comes from batching KV heads per grid step: the
scale block is [hb, blk_s] with hb a multiple of 8 (or the full Hkv), so
the (Hkv, S) trailing dims tile legally. (The previous layout replicated
an f32 scale across 8 sublanes — 32 B/token-head, 25% of the int8 KV
stream; reference packed int8-KV layouts: mha_dense.h:125-142.)

Paths:
- ``attend_xla``: jnp reference (runs everywhere; the test oracle — analog
  of ``bestla_fusion_attn_forward_ref``, mha_dense_wrapper.h:1371).
- ``flash_decode``: Pallas online-softmax kernel for T=1 decode with the
  int8 dequant folded into score columns / probability rows.
- ``attend``: dispatcher (reference analog: ne_bestla.cpp:205 dispatch).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def quantize_kv(x: jnp.ndarray):
    """[..., Dh] → (int8 values, bf16 scales [...]). Per-token-head absmax.

    The scale is rounded to bf16 FIRST and the codes quantized against the
    rounded value, so (codes, scale) stay a consistent pair — the bf16
    storage adds no systematic dequant bias on top of the int8 rounding."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = (absmax / 127.0 + 1e-9).astype(jnp.bfloat16)
    q = jnp.clip(jnp.round(x.astype(jnp.float32)
                           / scale.astype(jnp.float32)[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def _i8f(x):
    """int8 → f32 via int32 (Mosaic lacks direct sub-word float casts)."""
    return x.astype(jnp.int32).astype(jnp.float32)


def attend_xla(q, k_cache, v_cache, k_scale, v_scale, positions, cfg,
               slopes=None, sliding=None, prefix_len=None):
    """Reference attention (jnp). q: [B, T, Hq, Dh]; k/v_cache:
    [B, Hkv, S, Dh] (bf16 or int8, scales [B, Hkv, S]);
    positions [B, T]; ``prefix_len`` [B] enables the GLM prefix-LM mask
    (keys before prefix_len-1 are visible to every query — reference:
    chatglm.cpp:205-216). Returns [B, T, Hq*Dh] (f32 accumulation)."""
    B, T, Hq, Dh = q.shape
    Hkv, S = k_cache.shape[1], k_cache.shape[2]
    G = Hq // Hkv

    if k_scale is not None:
        kh = k_cache.astype(jnp.float32) * \
            k_scale.astype(jnp.float32)[..., None]
        vh = v_cache.astype(jnp.float32) * \
            v_scale.astype(jnp.float32)[..., None]
    else:
        kh = k_cache.astype(jnp.float32)
        vh = v_cache.astype(jnp.float32)
    qh = q.reshape(B, T, Hkv, G, Dh).transpose(0, 2, 3, 1, 4)  # [B,Hkv,G,T,Dh]
    scale = cfg.attn_scale if cfg.attn_scale is not None else Dh ** -0.5
    scores = jnp.einsum("bhgtd,bhsd->bhgts",
                        qh.astype(jnp.float32) * scale, kh)
    if cfg.attn_softcap:
        scores = cfg.attn_softcap * jnp.tanh(scores / cfg.attn_softcap)

    s_idx = jnp.arange(S)[None, None, :]
    q_abs = positions[:, :, None]
    mask = s_idx <= q_abs
    if prefix_len is not None:
        mask = mask | (s_idx < prefix_len[:, None, None] - 1)
    if cfg.sliding_window and sliding is not None:
        mask = mask & ((s_idx > q_abs - cfg.sliding_window)
                       | jnp.logical_not(sliding))
    elif cfg.sliding_window:
        mask = mask & (s_idx > q_abs - cfg.sliding_window)
    if cfg.use_alibi and slopes is not None:
        dist = (s_idx - q_abs).astype(jnp.float32)
        scores = scores + (slopes.reshape(Hkv, G)[None, :, :, None, None]
                           * dist[:, None, None, :, :])
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgts,bhsd->bhgtd", probs, vh)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, T, Hq * Dh)


# ---------------------------------------------------------------------------
# Pallas decode kernel (T = 1)
# ---------------------------------------------------------------------------


def _decode_kernel(lens_ref, win_ref, *refs, blk_s: int,
                   kv_int8: bool = False, hb: int = 1,
                   softcap: float, scale: float,
                   has_slopes: bool = False, stacked: bool = False):
    """Grid (B, Hkv/hb, S/blk_s) with S innermost; online softmax in
    scratch. ``hb`` KV heads ride each grid step (one big DMA, a static
    in-kernel loop) — per-step fixed costs dominate at low fill with
    single-head steps. In stacked mode an extra prefetched layer-index
    scalar precedes the tensor refs (consumed by the block index maps)
    and cache tiles carry a leading length-1 layer dim.

    ``win_ref`` is a prefetched scalar sliding window (0 = full-context):
    dynamic so Gemma-2's per-layer sliding flag stays a traced value under
    the layer scan (reference fuses the same flags into mha_dense,
    mha_dense.h:62). ``has_slopes`` adds an ALiBi slopes operand
    [Hkv, G8] and the distance bias term (reference:
    attn_fwd_args_t::is_alibi, mha_dense.h:62)."""
    if stacked:
        refs = refs[1:]              # drop lidx_ref
    i = 0
    q_ref = refs[i]; i += 1          # [1, hb, G8, Dh]
    if has_slopes:
        sl_ref = refs[i]; i += 1     # [hb, G8]
    k_ref = refs[i]; i += 1          # [(1,) 1, hb, blk_s, Dh]
    v_ref = refs[i]; i += 1
    if kv_int8:
        ks_ref = refs[i]; i += 1     # [(1,) 1, hb, blk_s] bf16
        vs_ref = refs[i]; i += 1
    out_ref = refs[i]                # [1, hb, G8, Dh]
    m_ref, l_ref, acc_ref = refs[i + 1], refs[i + 2], refs[i + 3]

    b = pl.program_id(0)
    sblk = pl.program_id(2)

    @pl.when(sblk == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    length = lens_ref[b]
    win = win_ref[0]
    lower = jnp.where(win > 0, length - win, 0)      # first valid key pos
    blk_start = sblk * blk_s
    G8, Dh = q_ref.shape[2], q_ref.shape[3]

    @pl.when(jnp.logical_and(blk_start < length, blk_start + blk_s > lower))
    def _process():
        qs_all = q_ref[...].reshape(hb, G8, Dh)
        ks_all = k_ref[...].reshape(hb, blk_s, Dh)
        vs_all = v_ref[...].reshape(hb, blk_s, Dh)
        if kv_int8:
            kssc = ks_ref[...].reshape(hb, blk_s)
            vssc = vs_ref[...].reshape(hb, blk_s)
        if has_slopes:
            sl_all = sl_ref[...].astype(jnp.float32)  # [hb, G8]
        pos = blk_start + jax.lax.broadcasted_iota(jnp.int32, (G8, blk_s),
                                                   1)
        mask = jnp.logical_and(pos < length, pos >= lower)
        if has_slopes:
            dist = (pos - (length - 1)).astype(jnp.float32)  # <= 0 in-mask
        for h in range(hb):
            row = slice(h * G8, (h + 1) * G8)
            q = qs_all[h].astype(jnp.float32)
            if kv_int8:
                # quantize q per row and dot int8×int8 on the MXU: the k
                # tile never takes the int8→int32→f32 cast chain (the VPU
                # cost that ate int8 KV's bandwidth win). q's extra
                # rounding is ~0.4% on pre-softmax scores — under the int8
                # KV noise itself.
                qa = jnp.max(jnp.abs(q), axis=-1, keepdims=True) + 1e-9
                q8 = jnp.round(q * (127.0 / qa)).astype(jnp.int8)
                d = jax.lax.dot_general(q8, ks_all[h],
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                ks = kssc[h:h + 1, :].astype(jnp.float32)     # [1, blk_s]
                s = d.astype(jnp.float32) * (qa * (scale / 127.0)) * ks
            else:
                # bf16 MXU dot, f32 accumulation (f32 dots run as multiple
                # MXU passes); scale applied to the f32 scores
                s = jax.lax.dot_general(q.astype(jnp.bfloat16),
                                        ks_all[h].astype(jnp.bfloat16),
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32
                                        ) * scale
            if softcap:
                s = softcap * jnp.tanh(s / softcap)
            if has_slopes:
                s = s + sl_all[h][:, None] * dist
            s = jnp.where(mask, s, NEG)

            m_prev = m_ref[row, :]                             # [G8, 1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)                             # [G8, blk_s]
            l_ref[row, :] = l_ref[row, :] * alpha + jnp.sum(
                p, -1, keepdims=True)
            if kv_int8:
                p = p * vssc[h:h + 1, :].astype(jnp.float32)
                v = _i8f(vs_all[h])
                pv = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
            else:
                pv = jax.lax.dot_general(p.astype(jnp.bfloat16),
                                         vs_all[h].astype(jnp.bfloat16),
                                         (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
            acc_ref[row, :] = acc_ref[row, :] * alpha + pv
            m_ref[row, :] = m_new

    @pl.when(sblk == pl.num_programs(2) - 1)
    def _finalize():
        out = acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)
        out_ref[...] = out.reshape(out_ref.shape).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("blk_s", "softcap", "scale", "interpret", "hb"))
def flash_decode(q, k_cache, v_cache, k_scale, v_scale, lengths,
                 slopes=None, blk_s=512, softcap=0.0, scale=None,
                 window=0, interpret=False, lidx=None, hb=None):
    """q: [B, Hq, Dh]; caches [B, Hkv, S, Dh] — or the FULL stacked
    [L, B, Hkv, S, Dh] with ``lidx`` selecting the layer via a prefetched
    index (zero-copy under a layer scan); scales [(L,) B, Hkv, S] bf16 or
    None; lengths [B] (keys valid at positions < length) → [B, Hq, Dh].

    ``window`` may be a python int OR a traced int32 scalar (Gemma-2's
    per-layer sliding flag under the layer scan); ``slopes`` [Hq] enables
    the fused ALiBi bias (MPT/BLOOM decode)."""
    B, Hq, Dh = q.shape
    stacked = k_cache.ndim == 5
    Hkv, S = k_cache.shape[-3], k_cache.shape[-2]
    G = Hq // Hkv
    G8 = max(8, G)
    scale = Dh ** -0.5 if scale is None else float(scale)
    kv_int8 = k_scale is not None
    has_slopes = slopes is not None
    assert stacked == (lidx is not None)
    blk_s = min(blk_s, S)
    assert S % blk_s == 0, (S, blk_s)
    n_sblk = S // blk_s
    lead = (1,) if stacked else ()

    qg = q.reshape(B, Hkv, G, Dh)
    if G8 != G:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, G8 - G), (0, 0)))
    if has_slopes:
        sl = slopes.astype(jnp.float32).reshape(Hkv, G)
        if G8 != G:
            sl = jnp.pad(sl, ((0, 0), (0, G8 - G)))

    # batch KV heads per grid step: fewer, larger DMAs (per-step fixed
    # costs dominate at low fill with single-head steps). k+v working-set
    # targets from the v5e sweep (scripts/exp_attn_blk.py): ~1 MB/step at
    # blk 128 (hb=16 for Dh=128), ~2 MB at blk >= 256 (hb=8 at blk 512).
    # head batch per grid step, from the v5e sweeps
    # (scripts/exp_attn_blk.py, bf16 and NTPU_EXP_INT8=1): hb=16 wins
    # everywhere except bf16 blk>=512, where the 4 MB k+v working set
    # stops double-buffering cleanly and hb=8 is faster.
    if hb is None or hb > Hkv or Hkv % hb:
        want = 8 if (not kv_int8 and blk_s >= 512) else 16
        hb = next((h for h in (want, 16, 8, 4, 2, 1) if h <= want
                   and Hkv % h == 0), 1)
    if kv_int8 and hb % 8 and hb != Hkv:
        # the flat [Hkv, S] scale tiles need the head block to be a
        # multiple of 8 sublanes (or the whole head dim)
        hb = next((h for h in (16, 8) if Hkv % h == 0), Hkv)

    def cmap(f):
        # cache block index map; stacked mode prepends the layer index,
        # which arrives as the THIRD prefetched scalar (after lengths and
        # the window). The S-block index is CLAMPED to the valid range
        # [lower-window block, last filled block]: outside it the map
        # repeats a previous block, so Pallas skips the DMA entirely (the
        # kernel already skips the compute) — attention HBM reads scale
        # with the window/fill, not the allocated S.
        def m(b, h, s, lens, win, *l_ref):
            smax = jnp.maximum((lens[b] + blk_s - 1) // blk_s - 1, 0)
            smin = jnp.where(win[0] > 0,
                             jnp.maximum((lens[b] - win[0]) // blk_s, 0), 0)
            idx = f(b, h, jnp.minimum(jnp.maximum(s, smin), smax))
            return (l_ref[0][0], *idx) if stacked else idx
        return m

    in_specs = [
        pl.BlockSpec((1, hb, G8, Dh), lambda b, h, s, *_: (b, h, 0, 0)),
    ]
    operands = [qg]
    if has_slopes:
        in_specs.append(pl.BlockSpec((hb, G8), lambda b, h, s, *_: (h, 0)))
        operands.append(sl)
    in_specs += [
        pl.BlockSpec((*lead, 1, hb, blk_s, Dh),
                     cmap(lambda b, h, s: (b, h, s, 0))),
        pl.BlockSpec((*lead, 1, hb, blk_s, Dh),
                     cmap(lambda b, h, s: (b, h, s, 0))),
    ]
    operands += [k_cache, v_cache]
    if kv_int8:
        in_specs += [
            pl.BlockSpec((*lead, 1, hb, blk_s),
                         cmap(lambda b, h, s: (b, h, s))),
            pl.BlockSpec((*lead, 1, hb, blk_s),
                         cmap(lambda b, h, s: (b, h, s)))]
        operands += [k_scale, v_scale]
    scalars = [lengths.astype(jnp.int32),
               jnp.asarray(window, jnp.int32).reshape(1)]
    if stacked:
        scalars.append(jnp.asarray(lidx, jnp.int32).reshape(1))

    kern = functools.partial(
        _decode_kernel, blk_s=blk_s, kv_int8=kv_int8, hb=hb,
        softcap=float(softcap), scale=scale, has_slopes=has_slopes,
        stacked=stacked)

    # Iterating all S/blk_s blocks at low fill burns ~0.2 us per empty grid
    # step (measured 22 us/layer at S=2048, fill=128 on a 7B — ~10% of
    # decode). Mosaic supports DYNAMIC grid bounds: clamp the S-block count
    # to the actual fill so attention cost tracks fill, not allocation.
    if interpret:
        nd = n_sblk  # interpreter needs a concrete trip count
    else:
        need = (jnp.max(lengths).astype(jnp.int32) + blk_s - 1) // blk_s
        nd = jnp.clip(need, 1, n_sblk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(B, Hkv // hb, nd),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hb, G8, Dh),
                               lambda b, h, s, *_: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hb * G8, 1), jnp.float32),
            pltpu.VMEM((hb * G8, 1), jnp.float32),
            pltpu.VMEM((hb * G8, Dh), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G8, Dh), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*scalars, *operands)
    return out[:, :, :G, :].reshape(B, Hq, Dh)


def attend(q, k_cache, v_cache, k_scale, v_scale, positions, cfg,
           slopes=None, sliding=None, force=None, interpret=False,
           lidx=None, prefix_len=None):
    """Dispatcher: Pallas decode kernel when T==1 on TPU (and the config's
    sliding flag is layer-static), XLA reference otherwise.

    Caches may be the FULL [L, ...] stacks with ``lidx`` selecting the
    layer: the Pallas kernel consumes them zero-copy; the XLA path slices
    (XLA fuses the slice into its attention reads). ``prefix_len`` [B]
    enables the GLM prefix-LM mask for T > 1 (decode is mask-identical to
    causal — every cached key is visible)."""
    B, T, Hq, Dh = q.shape
    stacked = k_cache.ndim == 5
    S = k_cache.shape[-2]
    backend = jax.default_backend()
    use_pallas = (force == "pallas" or interpret
                  or (force is None and backend == "tpu"))
    # window: python int when the config's flag is layer-static, a traced
    # int32 scalar when the per-layer sliding flag rides the layer scan
    # (Gemma-2 alternates sliding/global layers).
    if not cfg.sliding_window:
        window = 0
    elif sliding is None:
        window = int(cfg.sliding_window)
    else:
        window = jnp.where(sliding, jnp.int32(cfg.sliding_window),
                           jnp.int32(0))
    slopes_arg = slopes if cfg.use_alibi else None
    blk_s = cfg.decode_blk_s or 512
    if k_scale is not None:
        # int8 KV: half the bytes per block → 256-token blocks beat 512 at
        # every fill (0.997 vs 1.305 ms at fill 1984 on a 7B, v5e sweep)
        blk_s = min(blk_s, 256)
    if (use_pallas and T == 1 and Dh % 128 == 0 and S % 512 == 0
            and S % blk_s == 0 and force != "xla"):
        out = flash_decode(
            q[:, 0], k_cache, v_cache, k_scale, v_scale,
            lengths=positions[:, 0] + 1, slopes=slopes_arg, blk_s=blk_s,
            softcap=cfg.attn_softcap, window=window,
            scale=(cfg.attn_scale if cfg.attn_scale is not None
                   else Dh ** -0.5),
            interpret=interpret, lidx=lidx if stacked else None)
        return out.reshape(B, 1, Hq * Dh)
    if stacked:
        sl = lambda c: None if c is None else \
            jax.lax.dynamic_index_in_dim(c, lidx, 0, keepdims=False)
        k_cache, v_cache = sl(k_cache), sl(v_cache)
        k_scale, v_scale = sl(k_scale), sl(v_scale)
    if (use_pallas and T > 8 and Dh % 128 == 0 and S % 512 == 0
            and force != "xla"):
        Tp = -(-T // 128) * 128
        qp = q if Tp == T else jnp.pad(q, ((0, 0), (0, Tp - T), (0, 0),
                                           (0, 0)))
        # tiles from the v5e sweep (scripts/exp_prefill_tiles.py): 1024-
        # square tiles amortize per-grid-step overhead (22.3 -> 13.6 ms of
        # attention on a 2048-token 7B prefill vs 256x512)
        bt = next(t for t in (1024, 512, 256, 128) if Tp % t == 0)
        bs = next(t for t in (1024, 512) if S % t == 0)
        out = flash_prefill(
            qp, k_cache, v_cache, k_scale, v_scale, starts=positions[:, 0],
            slopes=slopes_arg, blk_t=bt, blk_s=bs, softcap=cfg.attn_softcap,
            window=window,
            scale=(cfg.attn_scale if cfg.attn_scale is not None
                   else Dh ** -0.5),
            interpret=interpret, prefix_len=prefix_len)
        return out[:, :T].reshape(B, T, Hq * Dh)
    return attend_xla(q, k_cache, v_cache, k_scale, v_scale, positions, cfg,
                      slopes, sliding, prefix_len=prefix_len)


# ---------------------------------------------------------------------------
# Pallas prefill kernel (causal, T > 1)
# ---------------------------------------------------------------------------


def _prefill_kernel(starts_ref, win_ref, sl_ref, pref_ref, *refs, blk_t: int,
                    blk_s: int, n_sblk: int, softcap: float, scale: float,
                    group: int, kv_int8: bool, has_slopes: bool):
    """Grid (B*Hq, T/blk_t, S/blk_s), S innermost; flash online softmax.

    Query head bh = b*Hq + h reads KV head h // group. Causal: key pos
    s <= start_b + q_row. Skips fully-masked S-blocks (above the causal
    diagonal, or below the sliding window). ``win_ref`` is the dynamic
    sliding window (0 = off); ``sl_ref`` the per-(b,h) ALiBi slope.

    int8 KV folds the dequant into the score/probability matrices exactly
    like the decode kernel: q is dynamically quantized per row and QK^T
    runs as an int8 MXU dot (2x bf16 rate); the k scale multiplies score
    COLUMNS and the v scale probability COLUMNS — the [blk_s, Dh] tiles
    never take the int8→f32 cast chain (reference int8-KV prefill analog:
    mha_dense.h:125-142 bestla_reordered_attn_fp32 int8 layouts).
    """
    i = 0
    q_ref = refs[i]; i += 1
    k_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    if kv_int8:
        ks_ref = refs[i]; i += 1     # [1, 1, blk_s] bf16 (per-q-head row)
        vs_ref = refs[i]; i += 1
    out_ref = refs[i]
    m_ref, l_ref, acc_ref = refs[i + 1], refs[i + 2], refs[i + 3]

    bh = pl.program_id(0)
    tb = pl.program_id(1)
    sb = pl.program_id(2)

    @pl.when(sb == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    start = starts_ref[bh]
    win = win_ref[0]
    # prefix-LM (GLM): keys < pref-1 visible to every query (0 = disabled)
    pref = pref_ref[bh]
    pref_m1 = jnp.where(pref > 0, pref - 1, jnp.int32(-(1 << 30)))
    # absolute positions of this tile's queries / keys
    q0 = start + tb * blk_t
    max_q_pos = q0 + blk_t - 1
    max_key = jnp.maximum(max_q_pos, pref_m1 - 1)
    # union of the tile's valid key range: [q0 - win + 1, max_key]
    low_key = jnp.where(win > 0, q0 - win + 1, 0)

    @pl.when(jnp.logical_and(sb * blk_s <= max_key,
                             (sb + 1) * blk_s > low_key))
    def _process():
        Dh = q_ref.shape[-1]
        # bf16 MXU dots with f32 accumulation: an f32 matmul runs as
        # multiple MXU passes (~35 TF/s measured vs ~150 bf16 on v5e) and
        # made prefill attention 59 ms of a 216 ms 7B TTFT. Softmax
        # statistics stay f32.
        q = q_ref[...].reshape(blk_t, Dh)
        k = k_ref[...].reshape(blk_s, Dh)
        if kv_int8:
            qf = q.astype(jnp.float32)
            qa = jnp.max(jnp.abs(qf), axis=-1, keepdims=True) + 1e-9
            q8 = jnp.round(qf * (127.0 / qa)).astype(jnp.int8)
            d = jax.lax.dot_general(q8, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            ks = ks_ref[...].reshape(1, blk_s).astype(jnp.float32)
            sc = d.astype(jnp.float32) * (qa * (scale / 127.0)) * ks
        else:
            sc = jax.lax.dot_general(
                q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
        if softcap:
            sc = softcap * jnp.tanh(sc / softcap)
        qpos = q0 + jax.lax.broadcasted_iota(jnp.int32, sc.shape, 0)
        kpos = sb * blk_s + jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1)
        if has_slopes:
            sc = sc + sl_ref[bh] * (kpos - qpos).astype(jnp.float32)
        # window as a scalar select (Mosaic can't legalize vector<i1>
        # selects): win == 0 → effectively infinite window.
        win_eff = jnp.where(win > 0, win, jnp.int32(1 << 30))
        mask = jnp.logical_and(kpos <= qpos, kpos > qpos - win_eff)
        # GLM prefix-LM: bidirectional over the prompt minus its last
        # token's key (pref_m1 is -inf-like when disabled)
        mask = jnp.logical_or(mask, kpos < pref_m1)
        sc = jnp.where(mask, sc, NEG)

        m_prev = m_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(sc, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(sc - m_new)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, -1, keepdims=True)
        if kv_int8:
            vs = vs_ref[...].reshape(1, blk_s).astype(jnp.float32)
            p = p * vs                                  # fold v scale
        v = v_ref[...].reshape(blk_s, Dh)
        if kv_int8:
            v = _i8f(v).astype(jnp.bfloat16)
        else:
            v = v.astype(jnp.bfloat16)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[...] = m_new

    @pl.when(sb == n_sblk - 1)
    def _finalize():
        out = acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)
        out_ref[...] = out.reshape(out_ref.shape).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("blk_t", "blk_s", "softcap", "scale", "interpret"))
def flash_prefill(q, k_cache, v_cache, k_scale=None, v_scale=None,
                  starts=None, slopes=None, blk_t=256, blk_s=512,
                  softcap=0.0, scale=None, window=0, interpret=False,
                  prefix_len=None):
    """Causal flash attention for prefill. q: [B, T, Hq, Dh];
    caches [B, Hkv, S, Dh] (bf16 or int8 with scales [B, Hkv, S] bf16;
    already containing this prefill's keys); starts [B] (query row t sits
    at absolute position starts[b]+t); ``window`` may be a python int or a
    traced scalar; ``slopes`` [Hq] enables fused ALiBi; ``prefix_len`` [B]
    the GLM prefix-LM mask (keys < prefix_len-1 visible to every query).
    → [B, T, Hq, Dh] f32. Never materializes the [T, S] score matrix in
    HBM (reference analog: the fused-attention prefill win,
    docs/fused_attention.md)."""
    B, T, Hq, Dh = q.shape
    Hkv, S = k_cache.shape[1], k_cache.shape[2]
    G = Hq // Hkv
    scale = Dh ** -0.5 if scale is None else float(scale)
    kv_int8 = k_scale is not None
    blk_t = min(blk_t, T)
    blk_s = min(blk_s, S)
    assert T % blk_t == 0 and S % blk_s == 0, (T, blk_t, S, blk_s)

    # per-(b,h) query streams: [B*Hq, T, Dh]
    qs = q.transpose(0, 2, 1, 3).reshape(B * Hq, T, Dh)
    starts_bh = jnp.repeat(starts.astype(jnp.int32), Hq)
    if slopes is not None:
        slopes_bh = jnp.tile(slopes.astype(jnp.float32), B)   # [B*Hq]
    else:
        slopes_bh = jnp.zeros((B * Hq,), jnp.float32)
    if prefix_len is not None:
        pref_bh = jnp.repeat(prefix_len.astype(jnp.int32), Hq)
    else:
        pref_bh = jnp.zeros((B * Hq,), jnp.int32)

    grid = (B * Hq, T // blk_t, S // blk_s)

    # query stream bh = b*Hq + h_q reads KV head (bh % Hq) // G of batch
    # row bh // Hq. The S-block index is CLAMPED to the causal diagonal of
    # this query tile (and to the sliding-window floor; extended to the
    # prefix under prefix-LM): out-of-range steps repeat the previous
    # block, so their K/V DMAs are elided (the kernel already skips the
    # compute) — ~half the KV stream at full-context prefill, and
    # O(window) reads under sliding.
    def clamp_s(bh, tb, sb, starts, win, pref):
        smax = (starts[bh] + (tb + 1) * blk_t - 1) // blk_s
        smax = jnp.maximum(
            smax, jnp.where(pref[bh] > 0, (pref[bh] - 2) // blk_s, 0))
        smin = jnp.where(
            win[0] > 0,
            jnp.maximum((starts[bh] + tb * blk_t - win[0] + 1) // blk_s, 0),
            0)
        return jnp.minimum(jnp.maximum(sb, smin), jnp.maximum(smax, 0))

    def kv_map(bh, tb, sb, starts, win, _sl, pref, *_):
        return (bh // Hq, (bh % Hq) // G,
                clamp_s(bh, tb, sb, starts, win, pref), 0)

    def sc_map(bh, tb, sb, starts, win, _sl, pref, *_):
        return (bh, 0, clamp_s(bh, tb, sb, starts, win, pref))
    in_specs = [
        pl.BlockSpec((1, blk_t, Dh), lambda bh, tb, sb, *_: (bh, tb, 0)),
        pl.BlockSpec((1, 1, blk_s, Dh), kv_map),
        pl.BlockSpec((1, 1, blk_s, Dh), kv_map),
    ]
    operands = [qs.astype(jnp.bfloat16), k_cache, v_cache]
    if kv_int8:
        # flat [B, Hkv, S] bf16 scales pre-gathered per QUERY head into
        # [B*Hq, 1, S] (a ~T*Hq*2-byte copy — trivial next to the KV
        # stream) so the per-q-head grid can take a tile-legal
        # [1, 1, blk_s] block (the middle length-1 dim keeps the trailing
        # (1, S) tile alignment-free)
        ks_bh = jnp.repeat(k_scale, G, axis=1).reshape(B * Hq, 1, S)
        vs_bh = jnp.repeat(v_scale, G, axis=1).reshape(B * Hq, 1, S)
        in_specs += [pl.BlockSpec((1, 1, blk_s), sc_map),
                     pl.BlockSpec((1, 1, blk_s), sc_map)]
        operands += [ks_bh, vs_bh]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, blk_t, Dh),
                               lambda bh, tb, sb, *_: (bh, tb, 0)),
        scratch_shapes=[
            pltpu.VMEM((blk_t, 1), jnp.float32),
            pltpu.VMEM((blk_t, 1), jnp.float32),
            pltpu.VMEM((blk_t, Dh), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _prefill_kernel, blk_t=blk_t, blk_s=blk_s, n_sblk=S // blk_s,
        softcap=float(softcap), scale=scale, group=G, kv_int8=kv_int8,
        has_slopes=slopes is not None)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * Hq, T, Dh), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(starts_bh, jnp.asarray(window, jnp.int32).reshape(1), slopes_bh,
      pref_bh, *operands)
    return out.reshape(B, Hq, T, Dh).transpose(0, 2, 1, 3)
