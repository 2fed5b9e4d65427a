"""Paged-KV attention: page-table indirection at the DMA level.

The decode kernel reuses the flash online-softmax body of
``ops.attention._decode_kernel`` unchanged; only the *block index maps*
differ — each S-block's physical location comes from a prefetched page
table (``table[b, p]``), and pages past a sequence's fill are clamped to
the last valid page so their DMAs are elided (same fill-proportional trick
as the contiguous kernel). This is the TPU-native analog of the
reference's packed per-context KV views (mha_dense.h:24-150) generalized
to a shared page pool: indirection costs index-map scalar reads, not data
movement.

Layouts (runtime/paged.py): pools ``[(L,) P, Hkv, ps, Dh]``, int8 scales
FLAT ``[(L,) P, Hkv, ps]`` bf16 (2 B per token-head; the head block hb is
a multiple of 8 or the full Hkv so the (Hkv, ps) trailing dims tile
legally), table ``[B, MAXP]`` int32, logical position of page ordinal
p = ``p*ps + row``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _decode_kernel, attend_xla, flash_prefill, quantize_kv


def _paged_decode_kernel(lens_ref, win_ref, table_ref, *refs, **kw):
    # table_ref is consumed only by the block index maps
    del table_ref
    _decode_kernel(lens_ref, win_ref, *refs, **kw)


@functools.partial(
    jax.jit, static_argnames=("softcap", "scale", "interpret"))
def paged_flash_decode(q, k_pool, v_pool, k_scale, v_scale, table, lengths,
                       slopes=None, softcap=0.0, scale=None, window=0,
                       interpret=False, lidx=None):
    """q: [B, Hq, Dh]; pools [(L,) P, Hkv, ps, Dh] (+ scales) with ``lidx``
    selecting the layer when stacked; table [B, MAXP] int32; lengths [B];
    ``window`` int or traced scalar, ``slopes`` [Hq] for fused ALiBi.
    → [B, Hq, Dh] f32."""
    B, Hq, Dh = q.shape
    stacked = k_pool.ndim == 5
    Hkv, ps = k_pool.shape[-3], k_pool.shape[-2]
    MAXP = table.shape[1]
    G = Hq // Hkv
    G8 = max(8, G)
    scale = Dh ** -0.5 if scale is None else float(scale)
    kv_int8 = k_scale is not None
    has_slopes = slopes is not None
    assert stacked == (lidx is not None)
    lead = (1,) if stacked else ()

    qg = q.reshape(B, Hkv, G, Dh)
    if G8 != G:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, G8 - G), (0, 0)))
    if has_slopes:
        sl = slopes.astype(jnp.float32).reshape(Hkv, G)
        if G8 != G:
            sl = jnp.pad(sl, ((0, 0), (0, G8 - G)))

    # batch KV heads per grid step (same rationale as flash_decode: fewer,
    # larger DMAs); the flat [Hkv, ps] scale tiles additionally need hb to
    # be a multiple of 8 sublanes or the whole head dim.
    hb = next((h for h in (16, 8, 4, 2, 1) if Hkv % h == 0), 1)
    if kv_int8 and hb % 8 and hb != Hkv:
        hb = next((h for h in (16, 8) if Hkv % h == 0), Hkv)

    def cmap(f):
        # physical page = table[b, clamp(p, first-window-page,
        # last-filled-page)]: ordinals outside the valid range repeat a
        # previous block → Pallas skips the DMA (the kernel body already
        # skips the compute).
        def m(b, h, p, lens, win, tab, *l_ref):
            nv = (lens[b] + ps - 1) // ps
            pmin = jnp.where(win[0] > 0,
                             jnp.maximum((lens[b] - win[0]) // ps, 0), 0)
            pc = jnp.minimum(jnp.maximum(p, pmin), jnp.maximum(nv - 1, 0))
            idx = f(tab[b, pc], h)
            return (l_ref[0][0], *idx) if stacked else idx
        return m

    in_specs = [
        pl.BlockSpec((1, hb, G8, Dh), lambda b, h, p, *_: (b, h, 0, 0)),
    ]
    operands = [qg]
    if has_slopes:
        in_specs.append(pl.BlockSpec((hb, G8), lambda b, h, p, *_: (h, 0)))
        operands.append(sl)
    in_specs += [
        pl.BlockSpec((*lead, 1, hb, ps, Dh), cmap(lambda pg, h: (pg, h, 0, 0))),
        pl.BlockSpec((*lead, 1, hb, ps, Dh), cmap(lambda pg, h: (pg, h, 0, 0))),
    ]
    operands += [k_pool, v_pool]
    if kv_int8:
        in_specs += [
            pl.BlockSpec((*lead, 1, hb, ps), cmap(lambda pg, h: (pg, h, 0))),
            pl.BlockSpec((*lead, 1, hb, ps), cmap(lambda pg, h: (pg, h, 0)))]
        operands += [k_scale, v_scale]

    kernel = functools.partial(
        _paged_decode_kernel, blk_s=ps, kv_int8=kv_int8, hb=hb,
        softcap=float(softcap), scale=scale, has_slopes=has_slopes,
        stacked=stacked)

    scalars = [lengths.astype(jnp.int32),
               jnp.asarray(window, jnp.int32).reshape(1),
               table.astype(jnp.int32)]
    if stacked:
        scalars.append(jnp.asarray(lidx, jnp.int32).reshape(1))
    # dynamic grid bound: iterate only the pages the longest sequence
    # actually fills (empty grid steps cost ~0.2 us each; see
    # ops/attention.flash_decode)
    if interpret:
        npg = MAXP
    else:
        need = (jnp.max(lengths).astype(jnp.int32) + ps - 1) // ps
        npg = jnp.clip(need, 1, MAXP)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(B, Hkv // hb, npg),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hb, G8, Dh),
                               lambda b, h, p, *_: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hb * G8, 1), jnp.float32),
            pltpu.VMEM((hb * G8, 1), jnp.float32),
            pltpu.VMEM((hb * G8, Dh), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G8, Dh), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*scalars, *operands)
    return out[:, :, :G, :].reshape(B, Hq, Dh)


# ---------------------------------------------------------------------------
# XLA path: gather pages → contiguous view (oracle; prefill)
# ---------------------------------------------------------------------------


def gather_pages(pool, table):
    """[P, Hkv, ps, Dh] + [B, MAXP] → contiguous [B, Hkv, MAXP*ps, Dh]."""
    g = jnp.take(pool, table, axis=0)          # [B, MAXP, Hkv, ps, Dh]
    B, MP, H, ps, Dh = g.shape
    return g.transpose(0, 2, 1, 3, 4).reshape(B, H, MP * ps, Dh)


def gather_scales(spool, table):
    """[P, Hkv, ps] + [B, MAXP] → [B, Hkv, MAXP*ps]."""
    g = jnp.take(spool, table, axis=0)         # [B, MAXP, Hkv, ps]
    B, MP, H, ps = g.shape
    return g.transpose(0, 2, 1, 3).reshape(B, H, MP * ps)


def attend_paged(q, k_pool, v_pool, k_scale, v_scale, table, positions, cfg,
                 slopes=None, sliding=None, force=None, interpret=False,
                 lidx=None):
    """Paged dispatcher, mirroring ops.attention.attend: Pallas paged
    decode kernel for T==1 on TPU; prefill (T>1) gathers the slot's pages
    into a contiguous [B, Hkv, S, Dh] view and runs the Pallas
    ``flash_prefill`` kernel over it — the gather is one KV-sized HBM copy,
    while the former attend_xla route materialized the full
    [B, Hkv, G, T, S] score tensor (the exact cost the reference's fused
    prefill eliminates, docs/fused_attention.md 9748→1476 ms). XLA
    reference attention remains the fallback off-TPU / for odd shapes."""
    B, T, Hq, Dh = q.shape
    stacked = k_pool.ndim == 5
    ps = k_pool.shape[-2]
    backend = jax.default_backend()
    use_pallas = (force == "pallas" or interpret
                  or (force is None and backend == "tpu"))
    if not cfg.sliding_window:
        window = 0
    elif sliding is None:
        window = int(cfg.sliding_window)
    else:
        window = jnp.where(sliding, jnp.int32(cfg.sliding_window),
                           jnp.int32(0))
    if (use_pallas and T == 1 and Dh % 128 == 0 and ps % 256 == 0
            and force != "xla"):
        out = paged_flash_decode(
            q[:, 0], k_pool, v_pool, k_scale, v_scale, table,
            lengths=positions[:, 0] + 1,
            slopes=slopes if cfg.use_alibi else None,
            softcap=cfg.attn_softcap, window=window,
            scale=(cfg.attn_scale if cfg.attn_scale is not None
                   else Dh ** -0.5),
            interpret=interpret, lidx=lidx if stacked else None)
        return out.reshape(B, 1, Hq * Dh)
    if stacked:
        sl = lambda c: None if c is None else \
            jax.lax.dynamic_index_in_dim(c, lidx, 0, keepdims=False)
        k_pool, v_pool = sl(k_pool), sl(v_pool)
        k_scale, v_scale = sl(k_scale), sl(v_scale)
    k = gather_pages(k_pool, table)
    v = gather_pages(v_pool, table)
    ks = None if k_scale is None else gather_scales(k_scale, table)
    vs = None if v_scale is None else gather_scales(v_scale, table)
    S = k.shape[2]
    if (use_pallas and T > 8 and Dh % 128 == 0 and S % 256 == 0
            and force != "xla"):
        Tp = -(-T // 128) * 128
        qp = q if Tp == T else jnp.pad(q, ((0, 0), (0, Tp - T), (0, 0),
                                           (0, 0)))
        bt = next(t for t in (1024, 512, 256, 128) if Tp % t == 0)
        bs = next(t for t in (1024, 512, 256) if S % t == 0)
        out = flash_prefill(
            qp, k, v, ks, vs, starts=positions[:, 0],
            slopes=slopes if cfg.use_alibi else None, blk_t=bt, blk_s=bs,
            softcap=cfg.attn_softcap, window=window,
            scale=(cfg.attn_scale if cfg.attn_scale is not None
                   else Dh ** -0.5),
            interpret=interpret)
        return out[:, :T].reshape(B, T, Hq * Dh)
    return attend_xla(q, k, v, ks, vs, positions, cfg, slopes, sliding)


# ---------------------------------------------------------------------------
# KV writes into the page pool
# ---------------------------------------------------------------------------


def paged_update_kv(k_pool, v_pool, ks_pool, vs_pool, k_new, v_new, table,
                    start, lidx):
    """Append new tokens' K/V to the page pool.

    k_new/v_new: [B, Hkv, T, Dh] (pre-transposed, pre-RoPE'd). For T == 1
    the write lands at (table[b, start//ps], start % ps); for T > 1 the
    start must be page-aligned (serving prefills from 0) and the chunks
    stream page by page. Per-batch python loop = B direct
    dynamic_update_slice ops (the vmap/select trap — models/transformer.py
    _attention note).
    """
    ps = k_pool.shape[-2]
    B, H, T, Dh = k_new.shape
    quantized = ks_pool is not None
    if quantized:
        k_new, ks_new = quantize_kv(k_new)          # scales [B, Hkv, T]
        v_new, vs_new = quantize_kv(v_new)

    def upd(pool, new):
        new = new.astype(pool.dtype)
        if T == 1:
            for b in range(B):
                page = table[b, start[b] // ps]
                row = start[b] % ps
                pool = jax.lax.dynamic_update_slice(
                    pool, new[b][None, None], (lidx, page, 0, row, 0))
            return pool
        npages = -(-T // ps)
        for b in range(B):
            for j in range(npages):
                chunk = new[b][:, j * ps:(j + 1) * ps]   # [Hkv, cs, Dh]
                page = table[b, start[b] // ps + j]
                pool = jax.lax.dynamic_update_slice(
                    pool, chunk[None, None], (lidx, page, 0, 0, 0))
        return pool

    def upds(spool, snew):
        # flat [L, P, Hkv, ps] scales: one row per token-head
        snew = snew.astype(spool.dtype)
        if T == 1:
            for b in range(B):
                page = table[b, start[b] // ps]
                row = start[b] % ps
                spool = jax.lax.dynamic_update_slice(
                    spool, snew[b][None, None], (lidx, page, 0, row))
            return spool
        npages = -(-T // ps)
        for b in range(B):
            for j in range(npages):
                chunk = snew[b][:, j * ps:(j + 1) * ps]   # [Hkv, cs]
                page = table[b, start[b] // ps + j]
                spool = jax.lax.dynamic_update_slice(
                    spool, chunk[None, None], (lidx, page, 0, 0))
        return spool

    k_pool = upd(k_pool, k_new)
    v_pool = upd(v_pool, v_new)
    if quantized:
        ks_pool = upds(ks_pool, ks_new)
        vs_pool = upds(vs_pool, vs_new)
    return k_pool, v_pool, ks_pool, vs_pool
