"""Fused dequantize + matmul Pallas kernels.

TPU-native replacement for the reference's BesTLA weight-only GEMM stack
(bestla/bestla/bestla_wrapper.h:263 ``LauncherBase`` / :547
``LauncherIntKBlock``: PrologueB unpack/dequant + JIT GemmCore + Epilogue,
bestla_gemm.h kblock variants with in-kernel per-group dequant). Here a single
Pallas kernel unpacks bit-plane-packed codes, applies per-group scales /
zero-points (or an nf4/fp4 LUT, or native fp8 casts), and feeds bf16 tiles
straight into the MXU, accumulating in f32.

The weight never materializes in HBM at full precision: dequantization
happens on the VMEM tile inside the kernel, so HBM traffic is the quantized
bytes — the same reason BesTLA beats fp32 GEMM on memory-bound decode.

Layout recap (see neural_tpu.core.qtensor): W is [K, N]; codes are packed
along K in planes of 4/2/1 bits (8/p values per byte); scales [K/g, N].
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.dtypes import QuantConfig
from ..core.qtensor import (QTensor, npack_codes_per_byte, plane_shifts,
                            unpack_codes, pack_chunk)


def _cdiv(a, b):
    return -(-a // b)


def _round_up(a, b):
    return _cdiv(a, b) * b


def _lut_select(codes: jnp.ndarray, lut: np.ndarray) -> jnp.ndarray:
    """16-entry LUT lookup as a binary select tree (VPU-friendly, no gather)."""
    c = codes.astype(jnp.int32)
    cur = [jnp.where((c & 1) == 0, jnp.float32(lut[2 * i]), jnp.float32(lut[2 * i + 1]))
           for i in range(8)]
    bit = 2
    while len(cur) > 1:
        cur = [jnp.where((c & bit) == 0, cur[2 * i], cur[2 * i + 1])
               for i in range(len(cur) // 2)]
        bit <<= 1
    return cur[0]


def _bitcast4(tile_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 [R, N] → int4 [2R, N] in-register reinterpret (native-pack
    storage): row r of the input becomes rows 2r (low nibble) and 2r+1
    (high nibble) — verified hardware + interpreter semantics. Feeds the
    TPU's hardware int4→f32 convert with ZERO unpack arithmetic."""
    return pltpu.bitcast(tile_u8, jnp.int4)


def _bitcast2(tile_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 [R, N] → int2 [4R, N] in-register reinterpret: row r becomes
    rows 4r..4r+3, LSB 2-bit field first (hardware-verified,
    scripts/exp_int2_r4.py: byte 0b00000001 → rows 1, 0, 0, 0; 0b10 →
    -2, 0, 0, 0). The native-int2 decode path streams HALF the weight
    bytes of int4 containers — the TPU materialization of the
    reference's production int2&int4 mixed recipe (core/README.md:252)."""
    return pltpu.bitcast(tile_u8, jnp.int2)


def _bitcast_npack(tile_u8: jnp.ndarray, bits: int) -> jnp.ndarray:
    return _bitcast2(tile_u8) if bits == 2 else _bitcast4(tile_u8)


def _dequant_tile(plane_tiles, scales_tile, zeros_tile, cfg: QuantConfig,
                  group_size: int, chunk: int,
                  out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Dequantize one [TK, TN] weight tile inside the kernel.

    All integer arithmetic in int32 (Mosaic has no sub-word vector shifts);
    unpacking is the chunk-local scheme from qtensor, shared with the oracle.
    """
    if cfg.native_pack:
        plane_tiles = [_bitcast_npack(plane_tiles[0], cfg.bits)]
    if cfg.kind.startswith("fp8"):
        vals = plane_tiles[0].astype(jnp.float32)
    elif plane_tiles[0].dtype in (jnp.int4, jnp.uint4, jnp.int8, jnp.int2):
        # native sub-byte plane: Mosaic's hardware int4/int2 convert (no
        # VPU shift/mask unpacking) — measured ~1.5x the packed-u8 path
        vals = plane_tiles[0].astype(jnp.float32)
        TK, TN = vals.shape
        vg = vals.reshape(TK // group_size, group_size, TN)
        if cfg.kind == "int" and not cfg.sym:
            if zeros_tile.dtype == jnp.uint8:
                zf = zeros_tile.astype(jnp.int32).astype(jnp.float32)
            else:
                zf = zeros_tile.astype(jnp.float32)
            vg = vg - zf[:, None, :]
        w = vg * scales_tile.astype(jnp.float32)[:, None, :]
        return w.reshape(TK, TN).astype(out_dtype)
    else:
        codes = unpack_codes(tuple(plane_tiles), cfg.bits, chunk)  # int32
        if cfg.kind in ("nf4", "fp4"):
            vals = _lut_select(codes, cfg.lut)
        elif cfg.bits == 1:
            vals = codes.astype(jnp.float32) * 2.0 - 1.0
        elif cfg.sym:
            vals = (codes - (1 << (cfg.bits - 1))).astype(jnp.float32)
        else:
            vals = codes.astype(jnp.float32)  # zp subtracted below per group

    TK, TN = vals.shape
    G = TK // group_size
    vg = vals.reshape(G, group_size, TN)
    if cfg.kind == "int" and not cfg.sym and cfg.bits != 1:
        if zeros_tile.dtype == jnp.uint8:
            # uint8 -> i32 -> f32: Mosaic has no direct u8->f32 cast.
            zf = zeros_tile.astype(jnp.int32).astype(jnp.float32)
        else:  # float zero-points (GGUF Q4_1/Q5_1 style: w = q*d + m)
            zf = zeros_tile.astype(jnp.float32)
        vg = vg - zf[:, None, :]
    w = vg * scales_tile.astype(jnp.float32)[:, None, :]
    return w.reshape(TK, TN).astype(out_dtype)


def quantize_act_i8(x: jnp.ndarray, gd: int):
    """Dynamic per-row per-K-group symmetric int8 activation quantization.

    TPU-native analog of the reference's ``ActivationKBlockQuantize``
    prologue (bestla/bestla/bestla_prologue_a.h:105): x [M, K] → int8 codes
    plus f32 scales [M, K//gd]. Runs as plain XLA (one fused memory-bound
    pass); the int8 codes then feed the MXU's 2x-rate int8 dot in
    :func:`_qmm_a8_kernel`.
    """
    M, K = x.shape
    assert K % gd == 0, (K, gd)
    xg = x.astype(jnp.float32).reshape(M, K // gd, gd)
    absmax = jnp.max(jnp.abs(xg), axis=2) + 1e-9          # [M, G]
    sa = absmax / 127.0
    q = jnp.round(xg / sa[:, :, None]).astype(jnp.int8)
    return q.reshape(M, K), sa


def _sel_row(sa, g):
    """sa [TM, G] → column ``g`` as [TM, 1]. One-hot masked sum: Mosaic has
    no dynamic slicing of loaded values."""
    G = sa.shape[1]
    oh = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1) == g
    return jnp.sum(jnp.where(oh, sa, 0.0), axis=1, keepdims=True)


def _sel_col(sw, g):
    G = sw.shape[0]
    oh = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0) == g
    return jnp.sum(jnp.where(oh, sw, 0.0), axis=0, keepdims=True)


def _qmm_a8_kernel(*refs, cfg: QuantConfig, group_size: int, chunk: int,
                   n_planes: int, has_zeros: bool, gd: int, out_dtype,
                   stacked: bool = False, in_quant: bool = False):
    """int8-compute (w4a8/w8a8) matmul kernel.

    Grid (M/tm, N/tn, K/tk), K innermost. Per K-tile: unpack the weight
    codes (int32 shift/mask), cast to int8, and run one int8 MXU dot per
    ``gd``-sized K-group — int8 MXU throughput is ~2x bf16 on v5e (measured
    213 TF/s pre-unpacked / 199 TF/s end-to-end with in-kernel unpack vs
    141 bf16, scripts/exp_w4a8{,b}.py + tile sweep). Per-group f32 rescale
    ``d * (sa_g ⊗ sw_g)`` accumulates into f32 scratch.

    Asymmetric weights dot the RAW unsigned codes and fold the zero-point
    into the accumulator *initialization*: since
    ``Σ_g sa_g·(x_g·(c_g−zp_g))·sw_g = Σ_g sa_g·(x_g·c_g)·sw_g − (sa⊙xs)@(zp⊙sw)``,
    the whole correction is one rank-G f32 MXU dot per output tile at
    kt == 0 (reference analog: bestla_epilogue.h:278 ZpDequantInt32ToFp32's
    reduce-sum compensation). ``xsa = sa*rowsum_g(x_i8)`` and
    ``zwp = zp*sw`` (repeated to gd groups) are computed outside.

    Ref order: [lidx], x_i8, planes..., w_scales, [zwp, xsa], sa, out, acc.
    Scale stripes arrive full-K; selected one-hot per group (Mosaic has no
    dynamic value slicing).

    ``in_quant`` (sym only): x arrives as the RAW bf16/f32 tile and the
    per-row-group quantization runs IN-KERNEL per gd-chunk — the true
    analog of the reference's fused ActivationKBlockQuantize prologue
    (bestla_prologue_a.h:105). Feeding the kernel XLA-prequantized int8
    pays a ~0.8 ms/layer relayout copy at 7B prefill shapes (the fused
    quantize's output layout never matches the custom call's operand
    constraint; measured: K=11264 combined 1.63 ms vs 0.76 kernel +
    0.08 quantize alone). Two flavors:

    - ``True``: quantize locally per (j, k) grid step — recomputed for
      every N-tile, so only dispatched when N/tn is small (x is also
      re-streamed as bf16 per N-tile).
    - ``"scratch"``: scales still come from the XLA-side quantize (the
      tiny f32 [M, Ga] operand carries no relayout tax — only the int8
      codes did), but the CODES are computed once per (i, k) at the
      first N-tile into a [Ga, tm, gd] int8 VMEM scratch and reused for
      all later N-tiles; the x block map collapses to a fixed tile for
      j > 0 so its DMA is elided. Removes the relayout, the per-N-tile
      recompute, AND the per-N-tile x re-reads — the mode for
      many-N-tile GEMMs (lm_head N/tn=125, gate/up N/tn=11). Requires
      the j grid dim to be "arbitrary" (sequential) so j == 0 fills
      before j > 0 reads.

    Both are bit-identical to quantize_act_i8 (same absmax/127 scale,
    same round; x read at original dtype).
    """
    if stacked:
        refs = refs[1:]

    def tile(r):
        a = r[...]
        return a.reshape(a.shape[-2:])

    x_ref = refs[0]
    plane_tiles = [tile(refs[1 + i]) for i in range(n_planes)]
    idx = 1 + n_planes
    sw_ref = refs[idx]
    idx += 1
    if has_zeros:
        zwp_ref, xsa_ref = refs[idx], refs[idx + 1]
        idx += 2
    if in_quant is True:
        sa_ref = None
        out_ref, acc_ref = refs[idx], refs[idx + 1]
    elif in_quant == "scratch":
        sa_ref = refs[idx]
        out_ref, acc_ref, xq_ref = refs[idx + 1], refs[idx + 2], refs[idx + 3]
    else:
        sa_ref = refs[idx]
        out_ref, acc_ref = refs[idx + 1], refs[idx + 2]

    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _zero():
        if has_zeros:
            acc_ref[...] = -jax.lax.dot_general(
                xsa_ref[...], tile(zwp_ref), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            acc_ref[...] = jnp.zeros_like(acc_ref)

    pt = plane_tiles[0]
    if cfg.native_pack:
        # centered sub-byte codes at rest: reinterpret and widen to int8
        w8 = _bitcast_npack(pt, cfg.bits).astype(jnp.int8)
    elif pt.dtype == jnp.uint8:
        codes = unpack_codes(tuple(plane_tiles), cfg.bits, chunk)  # int32
        if cfg.sym:
            codes = codes - (1 << (cfg.bits - 1))
        w8 = codes.astype(jnp.int8)                                # [TK, TN]
    elif pt.dtype == jnp.uint4 and cfg.sym:
        w8 = (pt.astype(jnp.int32) - (1 << (cfg.bits - 1))).astype(jnp.int8)
    else:
        # native planes: int4/int8 already centered (sym), uint4 raw (asym)
        w8 = pt.astype(jnp.int8)
    x = x_ref[...]
    TK = w8.shape[0]
    sw_f = tile(sw_ref).astype(jnp.float32)
    sa_f = None if in_quant is True else sa_ref[...].astype(jnp.float32)
    jt = pl.program_id(1)
    # weight-scale groups per dot group (gd == group_size unless g == -1,
    # where one weight group spans all of K)
    sub = TK // gd
    r = max(group_size // gd, 1) if group_size > 0 else (1 << 30)
    for j in range(sub):
        ga = kt * sub + j
        if in_quant is True:
            xg = x[:, j * gd:(j + 1) * gd].astype(jnp.float32)
            a = (jnp.max(jnp.abs(xg), axis=1, keepdims=True) + 1e-9) / 127.0
            xq = jnp.round(xg / a).astype(jnp.int8)
            row_scale = a
        elif in_quant == "scratch":
            row_scale = _sel_row(sa_f, ga)

            @pl.when(jt == 0)
            def _fill(j=j, row_scale=row_scale):
                xg = x[:, j * gd:(j + 1) * gd].astype(jnp.float32)
                q = jnp.round(xg / row_scale).astype(jnp.int8)
                xq_ref[pl.dslice(kt * sub + j, 1)] = q[None]
            xq = xq_ref[pl.dslice(ga, 1)].reshape(x.shape[0], gd)
        else:
            xq = x[:, j * gd:(j + 1) * gd]
            row_scale = _sel_row(sa_f, ga)
        d = jax.lax.dot_general(xq, w8[j * gd:(j + 1) * gd, :],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        gw = ga // r if group_size > 0 else 0
        acc_ref[...] += d.astype(jnp.float32) * (row_scale
                                                 * _sel_col(sw_f, gw))

    @pl.when(kt == pl.num_programs(2) - 1)
    def _store():
        out_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("tm", "tn", "tk", "gd", "out_dtype",
                              "interpret", "mode"))
def _qmatmul_a8_pallas(x_i8, sa, qt: QTensor, tm, tn, tk, gd, out_dtype,
                       interpret, lidx=None, mode=None):
    """int8-compute fused matmul. ``mode`` selects the act-quant flavor
    (see _qmm_a8_kernel):

    - None (default): ``x_i8``/``sa`` from :func:`quantize_act_i8`.
    - True: raw x, ``sa=None`` — full in-kernel quantize per grid step.
    - "scratch": raw x + XLA ``sa``; codes quantized once per (m, k)
      tile into VMEM scratch at the first N-tile and reused.

    Stacked mode streams layer ``lidx`` from [L, ...] HBM stacks; the
    small zero-point correction operands are sliced to the layer up
    front (they're rank-G — the copy is trivial)."""
    in_quant = mode if mode is not None else (True if sa is None else False)
    M, K = x_i8.shape
    N = qt.N
    cfg = qt.cfg
    grid = (M // tm, N // tn, K // tk)
    stacked = lidx is not None
    lead = (1,) if stacked else ()

    def wmap(f):
        if stacked:
            return lambda i, j, k, l_ref: (l_ref[0], *f(i, j, k))
        return f

    if in_quant == "scratch":
        # x is consumed only at the first N-tile (codes cached in VMEM
        # scratch after that); collapsing the map for j > 0 makes the
        # block index repeat, so Pallas elides the x DMA entirely —
        # x streams ONCE instead of N/tn times
        def xmap(i, j, k, *a):
            return (i, jnp.where(j == 0, k, 0))
    else:
        def xmap(i, j, k, *a):
            return (i, k)

    def smap(i, j, k, *a):
        return (i, 0)

    def nmap(i, j, k, *a):
        return (0, j)

    in_specs = [pl.BlockSpec((tm, tk), xmap)]
    if cfg.native_pack:
        pack_rows = [tk // npack_codes_per_byte(cfg.bits)]
    elif qt.planes[0].dtype in (jnp.int4, jnp.uint4, jnp.int8):
        pack_rows = [tk]
    else:
        pack_rows = [tk * p // 8 for p, _ in plane_shifts(cfg.bits)]
    for rows in pack_rows:
        in_specs.append(pl.BlockSpec((*lead, rows, tn),
                                     wmap(lambda i, j, k: (k, j))))
    G = qt.scales.shape[-2]
    Ga = K // gd
    in_specs.append(pl.BlockSpec((*lead, G, tn),
                                 wmap(lambda i, j, k: (0, j))))
    operands = [x_i8, *qt.planes, qt.scales]
    has_zeros = qt.zeros is not None
    assert not (in_quant and has_zeros), \
        "in-kernel act quant is sym-only (zp compensation needs x_i8 sums)"
    if has_zeros:
        zeros, scales = qt.zeros, qt.scales
        if stacked:
            l = jnp.asarray(lidx, jnp.int32)
            zeros = jax.lax.dynamic_index_in_dim(zeros, l, 0, keepdims=False)
            scales = jax.lax.dynamic_index_in_dim(scales, l, 0,
                                                  keepdims=False)
        if zeros.dtype == jnp.uint8:
            zf = zeros.astype(jnp.int32).astype(jnp.float32)
        else:
            zf = zeros.astype(jnp.float32)
        zwp = zf * scales.astype(jnp.float32)                     # [G, N]
        if G != Ga:
            zwp = jnp.repeat(zwp, Ga // G, axis=0)                # [Ga, N]
        xs = x_i8.astype(jnp.float32).reshape(M, Ga, gd).sum(axis=2)
        xsa = xs * sa                                             # [M, Ga]
        in_specs.append(pl.BlockSpec((Ga, tn), nmap))
        operands.append(zwp)
        in_specs.append(pl.BlockSpec((tm, Ga), smap))
        operands.append(xsa)
    if in_quant is not True:
        in_specs.append(pl.BlockSpec((tm, Ga), smap))
        operands.append(sa)

    kernel = functools.partial(
        _qmm_a8_kernel, cfg=cfg, group_size=cfg.group_size,
        chunk=pack_chunk(cfg, K), n_planes=len(qt.planes),
        has_zeros=has_zeros, gd=gd, out_dtype=out_dtype, stacked=stacked,
        in_quant=in_quant)

    scratch_shapes = [pltpu.VMEM((tm, tn), jnp.float32)]
    if in_quant == "scratch":
        scratch_shapes.append(pltpu.VMEM((Ga, tm, gd), jnp.int8))
    # scratch mode needs j sequential (j == 0 fills the code scratch)
    dims = ("parallel",
            "arbitrary" if in_quant == "scratch" else "parallel",
            "arbitrary")
    bytes_accessed = (x_i8.size * x_i8.dtype.itemsize + qt.nbytes()
                      + M * N * np.dtype(out_dtype).itemsize)
    common = dict(
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=dims),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K, bytes_accessed=bytes_accessed,
            transcendentals=0),
        interpret=interpret,
    )
    if stacked:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=pl.BlockSpec((tm, tn), lambda i, j, k, l_ref: (i, j)),
            scratch_shapes=scratch_shapes)
        return pl.pallas_call(kernel, grid_spec=grid_spec, **common)(
            jnp.asarray(lidx, jnp.int32).reshape(1), *operands)
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),
        scratch_shapes=scratch_shapes,
        **common)(*operands)


def _pick_a8(M, K, N, cfg: QuantConfig):
    """(tm, tn, tk, gd) for the int8-compute path, or None.

    Worth it only when compute-bound (prefill, M >= 256) and when the dot
    group is MXU-efficient: gd % 128 == 0. group_size 32/64 configs fall
    back to bf16 compute (their act_bits=8 stays advisory) — a K=32 int8
    sub-dot wastes 3/4 of the 128-wide MXU and loses to bf16.
    """
    if cfg.kind != "int" or cfg.act_bits != 8 or cfg.bits < 2:
        return None
    if M < 256:
        return None
    g = K if cfg.group_size == -1 else cfg.group_size
    gd = min(g, 512)
    if gd % 128 or g % gd or K % gd:
        return None
    # tiles from the hardware sweep (scripts/exp_w4a8b.py + prod sweep,
    # v5e M=2048 K=N=4096): tm=512/tn=2048/tk=512 → 199 TF/s end-to-end
    # (incl. the dynamic act-quant pass) vs 141 TF/s bf16 dequant path.
    tm = 512 if M >= 512 else 256
    tn = next((t for t in (2048, 1024, 512, 256, 128) if N % t == 0), None)
    if tn is None:
        return None
    tk = gd
    while tk * 2 <= 512 and K % (tk * 2) == 0 and (g % (tk * 2) == 0
                                                   or (tk * 2) % g == 0):
        tk *= 2
    if K % tk:
        return None
    # packed plane rows per step must stay sublane-aligned
    from ..core.dtypes import bit_planes
    min_plane = min(bit_planes(cfg.bits))
    if (tk * min_plane // 8) % 8:
        return None
    return tm, tn, tk, gd


def matmul_a8_ref(x: jnp.ndarray, qt: QTensor, gd: int, dtype=None):
    """Oracle for the int8-compute path: quantize activations, then exact
    f32 arithmetic over the same integer values the kernel sees."""
    import dataclasses as _dc

    from ..core.qtensor import dequantize

    out_dtype = dtype or x.dtype
    *lead, K = x.shape
    x2 = x.reshape(-1, K)
    if qt.perm is not None:
        # quantization groups follow the STORED (act-order) row order, as in
        # the kernel path (x gathered before quantize_act_i8)
        x2 = jnp.take(x2, qt.perm, axis=1)
        qt = _dc.replace(qt, perm=None)
    x_i8, sa = quantize_act_i8(x2, gd)
    xd = x_i8.astype(jnp.float32).reshape(-1, K // gd, gd) * sa[:, :, None]
    w = dequantize(qt, jnp.float32)
    out = xd.reshape(-1, K) @ w
    return out.astype(out_dtype).reshape(*lead, qt.N)


def _qmm_kernel(*refs, cfg: QuantConfig, group_size: int, chunk: int,
                n_planes: int, has_zeros: bool, groups_per_step: int,
                out_dtype, stacked: bool = False):
    """Grid (M/TM, N/TN, K/TK), K innermost; accumulate into f32 scratch.

    Ref order: [lidx (scalar prefetch, stacked mode)], x, planes...,
    scales, [zeros], out, acc_scratch. In stacked mode the weight operands
    are the full [L, ...] stacks and every tile carries a leading
    length-1 layer dim (selected by the prefetched index in the block
    index maps) — this is what lets a lax.scan over layers stream weights
    straight from HBM with NO per-step slice copy.
    Scales/zeros arrive as the full-K stripe (G may be < 8 rows per step,
    below the sublane tile, so we can't block them); slice per k-step here.
    """
    if stacked:
        refs = refs[1:]  # drop lidx_ref (only used by index maps)

    def tile(r):
        a = r[...]
        return a.reshape(a.shape[-2:])  # squeeze leading layer dim

    x_ref = refs[0]
    plane_tiles = [tile(refs[1 + i]) for i in range(n_planes)]
    G_total = refs[1 + n_planes].shape[-2]
    if groups_per_step == G_total:
        sl = slice(None)
    else:
        # tile selection guarantees groups_per_step % 8 == 0 here, so the
        # dynamic row offset is provably sublane-aligned.
        kidx = pl.program_id(2)
        gstart = pl.multiple_of(kidx * groups_per_step, groups_per_step)
        sl = pl.ds(gstart, groups_per_step)

    def stripe(r):
        if len(r.shape) == 3:      # stacked: [1, G, tn]
            return r[0, sl, :]
        return r[sl, :]

    scales_tile = stripe(refs[1 + n_planes])
    idx = 2 + n_planes
    zeros_tile = stripe(refs[idx]) if has_zeros else None
    if has_zeros:
        idx += 1
    out_ref, acc_ref = refs[idx], refs[idx + 1]

    @pl.when(pl.program_id(2) == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = _dequant_tile(plane_tiles, scales_tile, zeros_tile, cfg, group_size,
                      chunk)
    acc_ref[...] += jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _store():
        out_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("tm", "tn", "tk", "out_dtype", "interpret"))
def _qmatmul_pallas(x, qt: QTensor, tm, tn, tk, out_dtype, interpret,
                    lidx=None):
    """Fused dequant matmul. If ``lidx`` is given, qt's arrays are the FULL
    [L, ...] stacks and the kernel streams layer ``lidx`` directly from HBM
    via prefetched-index block maps (zero-copy under a layer scan)."""
    M, K = x.shape
    N = qt.N
    cfg = qt.cfg
    g = qt.group_size
    grid = (M // tm, N // tn, K // tk)
    stacked = lidx is not None
    lead = (1,) if stacked else ()

    def wmap(f):
        # weight index map; stacked mode prepends the prefetched layer idx
        if stacked:
            return lambda i, j, k, l_ref: (l_ref[0], *f(i, j, k))
        return f

    def xmap(i, j, k, *a):
        return (i, k)

    in_specs = [pl.BlockSpec((tm, tk), xmap)]
    if cfg.native_pack:
        pack_rows = [tk // npack_codes_per_byte(cfg.bits)]
    elif cfg.kind.startswith("fp8") or \
            qt.planes[0].dtype in (jnp.int4, jnp.uint4):
        pack_rows = [tk]
    else:
        pack_rows = [tk * p // 8 for p, _ in plane_shifts(cfg.bits)]
    for rows in pack_rows:
        in_specs.append(pl.BlockSpec((*lead, rows, tn),
                                     wmap(lambda i, j, k: (k, j))))
    # scales/zeros: full-K stripe (G rows may be < sublane tile per k-step).
    G = qt.scales.shape[-2]
    in_specs.append(pl.BlockSpec((*lead, G, tn),
                                 wmap(lambda i, j, k: (0, j))))
    operands = [x, *qt.planes, qt.scales]
    has_zeros = qt.zeros is not None
    if has_zeros:
        in_specs.append(pl.BlockSpec((*lead, G, tn),
                                     wmap(lambda i, j, k: (0, j))))
        operands.append(qt.zeros)

    kernel = functools.partial(
        _qmm_kernel, cfg=cfg, group_size=g, chunk=pack_chunk(cfg, K),
        n_planes=len(qt.planes), has_zeros=has_zeros,
        groups_per_step=tk // g, out_dtype=out_dtype, stacked=stacked)

    bytes_accessed = (x.size * x.dtype.itemsize + qt.nbytes()
                      + M * N * np.dtype(out_dtype).itemsize)
    common = dict(
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K, bytes_accessed=bytes_accessed,
            transcendentals=0),
        interpret=interpret,
    )
    if stacked:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=pl.BlockSpec((tm, tn), lambda i, j, k, l_ref: (i, j)),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)])
        return pl.pallas_call(kernel, grid_spec=grid_spec, **common)(
            jnp.asarray(lidx, jnp.int32).reshape(1), *operands)
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        **common)(*operands)


def _qmm4_kernel(*refs, group_size: int, has_zeros: bool, out_dtype,
                 stacked: bool, npack: bool = False, npack_bits: int = 4,
                 m1: bool = False, fuse: tuple = ()):
    """Native-int4 decode kernel: one full-K stripe per grid step.

    Measured on v5e (K=N=4096, q4_0): the hardware int4→f32 convert plus an
    f32 group-scale multiply feeding an f32 MXU dot streams weights at
    ~660 GB/s vs ~230 GB/s for shift/mask unpacking and ~900 GB/s for the
    unscaled-convert roofline (scripts/exp_kernels.py). Zero-points never
    touch the [K, tn] tile: they fold into a rank-G compensation matmul
    ``out -= xs @ (z·s)`` (the analog of the reference's zero-point
    compensation epilogue, bestla_epilogue.h:278 ``ZpDequantInt32ToFp32``),
    where ``xs`` are per-group sums of x computed outside the kernel.

    ``fuse`` (static, sym-only) folds the decode step's elementwise
    neighbours into the weight-streaming kernel — the TPU analog of the
    reference's fused prologue/epilogue chain (bestla_prologue_a.h /
    bestla_epilogue.h): each entry is one of
      ("rms", eps, offset)  — RMS-norm the activation in-prologue
                              (x_ref holds the RAW residual stream)
      ("glu", act)          — x is TWO refs g, u; prologue computes
                              act(g) * u (gated-MLP input fusion)
      ("res",)              — epilogue adds a residual tile to the output
    The prologue math runs in f32 and rounds to bf16 exactly like the
    standalone ops (ops/norms.py, models/transformer._act), so fused and
    unfused paths agree bit-for-bit; it is recomputed per N-tile, which is
    VPU-free under the weight DMA (measured: the removed per-layer XLA
    fusions were ~8 us launch overhead each on a 7B decode step).

    Ref order: [lidx (scalar prefetch, stacked)], x | (g, u), [norm_w],
    codes, scales, [zeros, xs], [res], out. Grid (M/tm, N/tn); no K loop,
    no accumulator.
    """
    if stacked:
        refs = refs[1:]

    def tile(r):
        a = r[...]
        return a.reshape(a.shape[-2:])

    fkinds = tuple(f[0] for f in fuse)
    refs = list(refs)
    has_glu = "glu" in fkinds
    scratch_ref = refs.pop() if has_glu else None
    if has_glu:
        g_ref, u_ref = refs.pop(0), refs.pop(0)
    else:
        x_ref = refs.pop(0)
    nw_ref = refs.pop(0) if "rms" in fkinds else None

    if has_glu:
        # transcendental (exp) prologue work runs ONCE (first N-tile)
        # into VMEM scratch, not per grid step — recomputing silu on an
        # [8, 11264] stripe per tile measured +0.2 ms/tok on a 7B decode
        act = next(f[1] for f in fuse if f[0] == "glu")

        @pl.when(pl.program_id(1) == 0)
        def _fill():
            gf = g_ref[...].astype(jnp.float32)
            uf = u_ref[...].astype(jnp.float32)
            if act == "silu":
                hf = gf * jax.nn.sigmoid(gf) * uf
            elif act == "gelu":
                hf = jax.nn.gelu(gf, approximate=False) * uf
            elif act == "gelu_tanh":
                hf = jax.nn.gelu(gf, approximate=True) * uf
            elif act == "relu":
                hf = jnp.maximum(gf, 0.0) * uf
            else:
                raise ValueError(act)
            scratch_ref[...] = hf.astype(jnp.bfloat16).astype(jnp.float32)
        x_val = scratch_ref[...]
    else:
        x_val = x_ref[...].astype(jnp.float32)
    if nw_ref is not None:
        # RMS norm recomputed per N-tile: mean+rsqrt+mul on a [tm, K]
        # stripe is ~0.15 us of VPU per tile — cheaper than carrying
        # scratch state (which forces sequential grid semantics)
        _, eps, offset = next(f for f in fuse if f[0] == "rms")
        var = jnp.mean(x_val * x_val, axis=-1, keepdims=True)
        x_val = x_val * jax.lax.rsqrt(var + eps)
        x_val = (x_val * (nw_ref[...].astype(jnp.float32) + offset)
                 ).astype(jnp.bfloat16).astype(jnp.float32)
    w_ref, s_ref = refs[0], refs[1]
    idx = 2
    if has_zeros:
        z_ref, xs_ref = refs[idx], refs[idx + 1]
        idx += 2
    res_ref = None
    if "res" in fkinds:
        res_ref = refs[idx]
        idx += 1
    out_ref = refs[idx]

    wu = tile(w_ref)                                 # [K(/cpb), tn]
    if npack:  # uint8 at rest → int4/int2 reinterpret (zero unpack cost)
        w = _bitcast_npack(wu, npack_bits).astype(jnp.float32)
    else:
        w = wu.astype(jnp.float32)                   # [K, tn]
    s = tile(s_ref).astype(jnp.float32)              # [G, tn]
    tn = wu.shape[1]
    K = wu.shape[0] * (npack_codes_per_byte(npack_bits) if npack else 1)
    G = s.shape[0]
    xf = x_val
    TMk = xf.shape[0]
    if m1:
        # M=1 (single-stream decode): pack 8 GROUPS into the 8 sublanes.
        # Rows of x8 hold x (row 0) masked to the 8 group windows of a
        # 8g-row chunk, so P8 = x8 @ Wchunk yields the 8 group partials
        # as ROWS and the per-group scale costs one [8, tn] FMA per
        # EIGHT groups — 8x less VPU than scaling an [8, tn] partial per
        # group — while the dots run 8g deep (MXU-efficient). Measured
        # (v5e, K=N=4096 g=32 q4_0): 1017 GB/s effective weight stream
        # vs 828 for the grouped-partial path, 1157 unscaled ceiling
        # (scripts/exp_dec4b.py win8). Output rows are 8 broadcast
        # copies of the single real row; callers slice [:M].
        cw = 8 * group_size
        C = K // cw
        rem = K - C * cw            # trailing short chunk (< 8 groups);
        rem_g = rem // group_size   # e.g. llama w_down K=11008 at g=128
        rowmask = (jax.lax.broadcasted_iota(jnp.int32, (8, cw), 1)
                   // group_size
                   == jax.lax.broadcasted_iota(jnp.int32, (8, cw), 0))
        x0 = xf[0:1, :]
        accs = [jnp.zeros((8, tn), jnp.float32) for _ in range(2)]
        for c in range(C):
            xc = jnp.broadcast_to(x0[:, cw * c:cw * (c + 1)], (8, cw))
            x8 = jnp.where(rowmask, xc, 0.0)
            P8 = jnp.dot(x8, w[cw * c:cw * (c + 1), :],
                         preferred_element_type=jnp.float32)
            accs[c % 2] = accs[c % 2] + P8 * s[8 * c:8 * (c + 1), :]
        if rem:
            # same masked-sublane trick on the tail: rows >= rem_g of x8
            # are all-zero (the iota row index never matches a group) and
            # the scale rows were zero-padded to a multiple of 8 by the
            # caller, so the extra rows contribute exactly 0.
            rmask = (jax.lax.broadcasted_iota(jnp.int32, (8, rem), 1)
                     // group_size
                     == jax.lax.broadcasted_iota(jnp.int32, (8, rem), 0))
            xc = jnp.broadcast_to(x0[:, C * cw:K], (8, rem))
            x8 = jnp.where(rmask, xc, 0.0)
            P8 = jnp.dot(x8, w[C * cw:K, :],
                         preferred_element_type=jnp.float32)
            accs[C % 2] = accs[C % 2] + P8 * s[8 * C:8 * C + 8, :]
        total = jnp.sum(accs[0] + accs[1], axis=0, keepdims=True)
        if res_ref is not None:
            out_ref[...] = (total.astype(out_dtype)
                            + res_ref[...].astype(out_dtype))
            return
        if has_zeros:
            z = tile(z_ref)
            if z.dtype == jnp.uint8:
                zf = z.astype(jnp.int32).astype(jnp.float32)
            else:
                zf = z.astype(jnp.float32)
            total = total - jnp.dot(xs_ref[...][0:1, :], zf * s,
                                    preferred_element_type=jnp.float32)
        # out_ref is a TRUE [1, tn] block: no row padding to slice away
        # afterwards (the [8, N] -> [1, N] slices showed up as ~1 ms/tok
        # of standalone DMA ops on a 7B decode step)
        out_ref[...] = total.astype(out_dtype)
        return
    if G <= 256:
        # grouped-partial scaling: dot each group UNSCALED and apply the
        # per-group scale to the [tm, tn] partial — tm/g of the VPU
        # multiplies of scaling the weight tile itself. Measured (v5e,
        # M=8, K=4096, tn=2048, g=32): 480 GB/s effective weight stream
        # vs 339 for scale-the-weights, 537 no-scale ceiling
        # (scripts/exp_kernels.py unroll1 variant). Measured negative
        # results for the native-pack variants (7B attn squares, v5e):
        # per-group bitcast 6.31 ms/tok, bf16 convert 6.76, vs 6.16 for
        # the whole-block f32 bitcast here. TWO interleaved accumulators
        # break the serial add chain across the G iterations (VPU ILP).
        nacc = 2 if G % 2 == 0 else 1
        accs = [jnp.zeros((xf.shape[0], tn), jnp.float32)
                for _ in range(nacc)]
        for gi in range(G):
            part = jnp.dot(xf[:, gi * group_size:(gi + 1) * group_size],
                           w[gi * group_size:(gi + 1) * group_size, :],
                           preferred_element_type=jnp.float32)
            accs[gi % nacc] = accs[gi % nacc] + part * s[gi].reshape(1, tn)
        acc = accs[0] if nacc == 1 else accs[0] + accs[1]
    else:
        wg = (w.astype(jnp.float32).reshape(G, group_size, tn)
              * s[:, None, :]).reshape(K, tn)
        acc = jnp.dot(xf.astype(jnp.float32), wg,
                      preferred_element_type=jnp.float32)
    if has_zeros:
        z = tile(z_ref)
        if z.dtype == jnp.uint8:
            zf = z.astype(jnp.int32).astype(jnp.float32)
        else:
            zf = z.astype(jnp.float32)
        acc = acc - jnp.dot(xs_ref[...], zf * s,
                            preferred_element_type=jnp.float32)
    if res_ref is not None:
        out_ref[...] = acc.astype(out_dtype) + res_ref[...].astype(out_dtype)
    else:
        out_ref[...] = acc.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("tm", "tn", "out_dtype", "interpret", "m1",
                              "fuse"))
def _qmatmul4_pallas(x, qt: QTensor, tm, tn, out_dtype, interpret, lidx=None,
                     m1: bool = False, fuse: tuple = (), norm_w=None,
                     x2=None, res=None):
    """Native-int4 fused matmul for small M (decode). x: [M, K] with M % tm
    == 0 (or [1, K] in m1 mode — no row padding). Stacked mode streams
    layer ``lidx`` from [L, ...] HBM stacks. ``fuse``/``norm_w``/``x2``/
    ``res`` fold the neighbouring elementwise ops into the kernel (see
    _qmm4_kernel); with ("glu", act) in fuse, ``x`` is the gate input and
    ``x2`` the up input."""
    M, K = x.shape
    N = qt.N
    g = qt.group_size
    stacked = lidx is not None
    lead = (1,) if stacked else ()

    def wmap(f):
        if stacked:
            return lambda i, j, l_ref: (l_ref[0], *f(i, j))
        return f

    def xmap(i, j, *a):
        return (i, 0)

    G = qt.scales.shape[-2]
    npack = qt.cfg.native_pack
    m1 = m1 and K % g == 0
    grid = (1 if m1 else M // tm, N // tn)
    x_tm = tm  # x arrives row-padded to tm even in m1 mode (Mosaic
    #            rejects 1-row bf16 input blocks: "Invalid input layout";
    #            the pad ops measured ~6 us/tok total — keep them)
    scales = qt.scales
    zeros = qt.zeros
    has_zeros = zeros is not None
    if m1 and G % 8:
        # the m1 kernel consumes scales 8 group-rows at a time; zero-pad
        # the trailing rows (loop-invariant: hoisted out of the decode
        # scan, one padded copy per executable)
        Gp = _round_up(G, 8)
        pad = [(0, 0)] * scales.ndim
        pad[-2] = (0, Gp - G)
        scales = jnp.pad(scales, pad)
        if has_zeros:
            zeros = jnp.pad(zeros, pad)
        G = Gp
    in_specs = [pl.BlockSpec((x_tm, K), xmap)]
    operands = [x]
    if x2 is not None:                                # glu: (gate, up)
        in_specs.append(pl.BlockSpec((x_tm, K), xmap))
        operands.append(x2)
    if norm_w is not None:
        in_specs.append(pl.BlockSpec((1, K), lambda i, j, *a: (0, 0)))
        operands.append(norm_w.astype(jnp.float32).reshape(1, K))
    cpb = npack_codes_per_byte(qt.cfg.bits)
    in_specs += [
        pl.BlockSpec((*lead, K // cpb if npack else K, tn),
                     wmap(lambda i, j: (0, j))),
        pl.BlockSpec((*lead, G, tn), wmap(lambda i, j: (0, j))),
    ]
    operands += [qt.planes[0], scales]
    if has_zeros:
        in_specs.append(pl.BlockSpec((*lead, G, tn), wmap(lambda i, j: (0, j))))
        operands.append(zeros)
        xs = x.astype(jnp.float32).reshape(M, -1, g).sum(axis=2)  # [M, G0]
        if xs.shape[1] != G:
            xs = jnp.pad(xs, ((0, 0), (0, G - xs.shape[1])))
        in_specs.append(pl.BlockSpec((x_tm, G), xmap))
        operands.append(xs)

    Mout = 1 if m1 else M
    out_tm = 1 if m1 else tm
    if res is not None:
        # the kernel's res epilogue writes out and RETURNS before the
        # zero-point compensation — valid only for symmetric tensors
        # (qmatmul_fused rejects qt.zeros; keep future callers honest)
        assert not has_zeros, "res epilogue requires a symmetric QTensor"
        in_specs.append(pl.BlockSpec((out_tm, tn), lambda i, j, *a: (i, j)))
        operands.append(res.reshape(Mout, N))
    kernel = functools.partial(
        _qmm4_kernel, group_size=g, has_zeros=has_zeros,
        out_dtype=out_dtype, stacked=stacked, npack=npack,
        npack_bits=qt.cfg.bits, m1=m1, fuse=fuse)
    bytes_accessed = (x.size * x.dtype.itemsize + qt.nbytes()
                      + Mout * N * np.dtype(out_dtype).itemsize)
    # Roofline note (round-4 measured): with the m1 kernel the 7B decode
    # step is HBM-BOUND END-TO-END — per-step traffic (3.37 GB int4
    # codes + 0.42 GB bf16 scales + KV) over the 819 GB/s roofline
    # accounts for the measured 5.28 ms/tok to within ~2%. XLA reacts to
    # the freed kernel time by staging some weight operands into VMEM
    # via async slices (memory-space assignment); wall time is unchanged
    # because the bottleneck is total HBM bytes, not any kernel. Do NOT
    # chase those slices (tried: internal_scratch claims, disabling the
    # memory-bound loop optimizer via compiler options — both neutral).
    has_glu = any(f[0] == "glu" for f in fuse)
    common = dict(
        out_shape=jax.ShapeDtypeStruct((Mout, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            # glu scratch carries state across N-tiles → the j dim must
            # be sequential ("arbitrary"); other kernels stay parallel
            dimension_semantics=("parallel",
                                 "arbitrary" if has_glu else "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mout * N * K, bytes_accessed=bytes_accessed,
            transcendentals=0),
        interpret=interpret,
    )
    scratch = [pltpu.VMEM((x_tm, K), jnp.float32)] if has_glu else []
    if stacked:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=pl.BlockSpec((out_tm, tn),
                                   lambda i, j, l_ref: (i, j)),
            scratch_shapes=scratch)
        return pl.pallas_call(kernel, grid_spec=grid_spec, **common)(
            jnp.asarray(lidx, jnp.int32).reshape(1), *operands)
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((out_tm, tn), lambda i, j: (i, j)),
        scratch_shapes=scratch,
        **common)(*operands)


def _pick_decode_tiles(M, K, N, g, code_bits=4, npack=False):
    """(tm, tn) for the native-code decode kernel, or None.

    Single K stripe per grid step: K must be sublane-tileable and small
    enough that the code block (K*tn*code_bits/8 bytes) double-buffers in
    VMEM. tn is the largest 128-multiple divisor of N under that cap. M
    caps at 16: beyond that the f32 MXU dot stops hiding under the HBM
    stream. (native-pack tn sweep on the 7B attn squares: tn=1024 gave
    6.21 ms/tok vs 6.16 at 2048 — the uniform cap stands.)

    Cap 6 MB (double-buffered 12 MB of ~16 MB VMEM): the round-4 sweep
    measured the 7B w_down shape (K=11264, N=4096) at 820 GB/s with
    tn=1024 (5.8 MB blocks) vs 784 GB/s at the old 4 MB cap's tn=512,
    and int8 w_down picks 512 instead of 256 (scripts/exp_dec4b.py).
    """
    if M > 16 or K % 32 or K % g:
        return None
    cap = (6 << 20) * 8 // (K * code_bits)
    for tn in (2048, 1024, 640, 512, 384, 256, 128):
        if tn <= cap and N % tn == 0:
            return _round_up(max(M, 8), 8), tn
    return None


def qmatmul_fused(x, qt: QTensor, out_dtype=None, lidx=None, norm=None,
                  glu=None, res=None, interpret: bool = False):
    """Decode-step matmul with the neighbouring elementwise ops folded into
    the weight-streaming Pallas kernel (the TPU analog of the reference's
    prologue/epilogue fusion chain, bestla_prologue_a.h / bestla_epilogue.h
    — there the fused ops ride the same cache-resident tile, here they ride
    the same kernel launch, removing ~8 us of launch overhead per fused
    XLA op on a decode step).

    x: [M, K] activation — the RAW residual stream when ``norm`` is set, or
    a TUPLE (gate, up) when ``glu`` is set. norm: (weight[K], eps, offset)
    RMS-norm prologue. glu: activation name ("silu"/"gelu"/"gelu_tanh"/
    "relu") gated-MLP prologue. res: [M, N] residual added to the output in
    ``out_dtype``. All fused math matches the standalone ops bit-for-bit
    (f32 compute, bf16 rounding at the same points).

    Returns the [M, N] result, or **None** when this shape/config can't run
    the fused kernel (caller must fall back to the unfused op chain).
    """
    if glu is not None:
        g_in, u_in = x
        x = g_in
    if x.ndim != 2:
        return None
    M, K = x.shape
    backend = jax.default_backend()
    if not (backend == "tpu" or interpret):
        return None
    if qt.zeros is not None or qt.perm is not None:
        return None
    if not (qt.planes[0].dtype in (jnp.int4, jnp.uint4, jnp.int8)
            or qt.cfg.native_pack):
        return None
    if qt.planes[0].ndim == 2:
        lidx = None
    elif lidx is None:
        return None
    code_bits = (8 if qt.planes[0].dtype == jnp.int8 else
                 8 // npack_codes_per_byte(qt.cfg.bits)
                 if qt.cfg.native_pack else 4)
    dec = _pick_decode_tiles(M, K, qt.N, qt.group_size, code_bits,
                             npack=qt.cfg.native_pack)
    if dec is None:
        return None
    tm, tn = dec
    out_dtype = out_dtype or x.dtype
    fuse = []
    x2 = None
    if glu is not None:
        fuse.append(("glu", glu))
        x2 = u_in.astype(jnp.bfloat16)
    if norm is not None:
        nw, eps, offset = norm
        fuse.append(("rms", float(eps), float(offset)))
    else:
        nw = None
    if res is not None:
        fuse.append(("res",))
    m1 = M == 1
    Mp = _round_up(max(M, tm), tm)
    if Mp != M:
        pad = ((0, Mp - M), (0, 0))
        x = jnp.pad(x, pad)
        if x2 is not None:
            x2 = jnp.pad(x2, pad)
        if res is not None and not m1:  # m1 output stays [1, N]
            res = jnp.pad(res.reshape(M, qt.N), pad)
    out = _qmatmul4_pallas(x.astype(jnp.bfloat16), qt, tm, tn,
                           out_dtype=out_dtype, interpret=interpret,
                           lidx=lidx, m1=m1, fuse=tuple(fuse),
                           norm_w=nw, x2=x2, res=res)
    return out[:M]


def qmatmul_native(x: jnp.ndarray, qt: QTensor, out_dtype=None) -> jnp.ndarray:
    """XLA path for native int4/uint4 code planes: the int4→bf16 convert and
    per-group scaling fuse into the matmul operand read (TPU hardware int4
    convert — faster than VPU shift/mask unpacking for decode)."""
    out_dtype = out_dtype or x.dtype
    K, N = qt.K, qt.N
    g = qt.group_size
    codes = qt.planes[0]
    if qt.cfg.native_pack:
        # XLA-side field expansion of the at-rest uint8 plane (nibbles,
        # or 4 2-bit fields for int2 — LSB first, matching _bitcast2)
        b = codes.astype(jnp.int32)
        if qt.cfg.bits == 2:
            fields = [(((b >> s) & 0x3) ^ 2) - 2 for s in (0, 2, 4, 6)]
        else:
            fields = [((b & 0xF) ^ 8) - 8, (((b >> 4) & 0xF) ^ 8) - 8]
        codes = jnp.stack(fields, axis=1).reshape(K, N)
    wf = codes.astype(jnp.bfloat16).reshape(K // g, g, N)
    if qt.zeros is not None:
        wf = wf - qt.zeros.astype(jnp.bfloat16)[:, None, :]
    wf = wf * qt.scales.astype(jnp.bfloat16)[:, None, :]
    out = jnp.dot(x.astype(jnp.bfloat16), wf.reshape(K, N),
                  preferred_element_type=jnp.float32)
    return out.astype(out_dtype)


def qmatmul_xla(x: jnp.ndarray, qt: QTensor, out_dtype=None) -> jnp.ndarray:
    """XLA fallback: dequantize then matmul in bf16 (XLA fuses the dequant
    into the matmul operand read where it can). Used on CPU and for shapes
    the Pallas kernel can't tile."""
    from ..core.qtensor import dequantize

    out_dtype = out_dtype or x.dtype
    w = dequantize(qt, jnp.bfloat16)
    out = jnp.dot(x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)
    return out.astype(out_dtype)


def _pick_tiles(M, K, N, g, bits, kind):
    """Choose (tm, tn, tk); None if untileable. M is padded up to tm by the
    caller. Large tm/tn for prefill so the x stripe and each dequantized
    weight tile are re-read as few times as possible (hardware sweep on
    v5e M=2048 7B shapes: tn 256→1024 lifts 139→176-185 TF/s; tk=512
    beats 1024 once tn ≥ 1024); small tm for decode (bandwidth-bound)."""
    tm = 16
    while tm * 2 <= 1024 and M > tm:
        tm *= 2
    tn = next((t for t in (1024, 512, 256, 128) if N % t == 0), None)
    if tn is None:
        return None
    # K-tile constraints:
    #  - multiple of the group size g (scale groups stay tile-local)
    #  - every packed plane's row count (tk*p/8) 8-sublane aligned
    #    → tk % (64/p_min) == 0
    #  - the per-step scales row-slice must be 8-sublane aligned
    #    → tk/g % 8 == 0, unless a single K-step covers all groups (tk == K)
    from ..core.dtypes import bit_planes
    min_plane = 8 if kind.startswith("fp8") else min(bit_planes(bits))
    align = 64 // min_plane
    tk_cap = 512 if tn >= 1024 else 1024
    tk = g * 8
    while tk * 2 <= tk_cap and K % (tk * 2) == 0:
        tk *= 2
    if K % tk or tk % align:
        tk = K  # single K-step: whole scales stripe read, no slicing
        if tk % align or tk % g:
            return None
    if tk > 512 and tm > 512:
        # g=128 forces tk=1024 (the scales row-slice needs tk/g % 8 == 0);
        # tm=tn=tk=1024 then overflows the 16 MB scoped-VMEM budget
        # (measured: 16.21M requested at M=2048 K=N=4096 q4_j act16 —
        # "kernel-vmem-stack-oom"). Halving tm fits with margin.
        tm = 512
    return tm, tn, tk


def slice_layer(qt: QTensor, lidx) -> QTensor:
    """Select layer ``lidx`` from a [L, ...]-stacked QTensor (materializes
    a copy — only for paths that can't consume the stack directly)."""
    return jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, lidx, 0, keepdims=False),
        qt)


def qmatmul(x: jnp.ndarray, qt: QTensor, out_dtype=None,
            force: Optional[str] = None, interpret: bool = False,
            lidx=None) -> jnp.ndarray:
    """``x @ W_q`` with on-the-fly dequantization.

    x: [..., K]; returns [..., N]. Uses the Pallas fused kernel on TPU,
    XLA fallback elsewhere (reference dispatch analog:
    neural_speed/core/layers/ne_bestla.cpp:205 ``bestla_support``).

    If ``qt`` is a [L, ...] stack and ``lidx`` is given, the TPU kernel
    streams that layer's weights directly from the stacked HBM buffers
    (prefetched-index block maps) — the fast path under a layer scan.
    """
    if qt.planes[0].ndim == 2:
        lidx = None  # already a single layer
    elif lidx is None:
        raise ValueError("stacked QTensor requires lidx")
    out_dtype = out_dtype or x.dtype
    *lead, K = x.shape
    assert K == qt.K, (K, qt.shape)
    x2 = x.reshape(-1, K)
    M = x2.shape[0]

    def gathered(x2):
        # act-order: stored weight rows are W[perm] → gather x to match.
        # Only for paths that consume the STORED row order; the XLA
        # fallback goes through dequantize(), which un-permutes itself.
        if qt.perm is None:
            return x2
        perm = qt.perm
        if lidx is not None and perm.ndim == 2:
            perm = jax.lax.dynamic_index_in_dim(perm, lidx, 0,
                                                keepdims=False)
        # strategy (override with NTPU_GATHER=lane|sub|onehot): measured
        # IN-GRAPH on a 4-layer 7B-shape decode (v5e): one-hot 21.2 us per
        # [16, 4096] gather vs take-lane 24.5 / take-sub 24.6. (A pure
        # op-chain microbench flips the order — lane 11.4 vs one-hot 14.3 —
        # because there the take fuses into its consumer; feeding a Pallas
        # kernel it can't.) Mosaic's in-kernel tpu.dynamic_gather was also
        # tried and hangs/fails to compile at [16, 4096] bf16.
        strat = os.environ.get("NTPU_GATHER")
        if strat is None:
            strat = "onehot" if x2.shape[0] <= 64 else "lane"
        if strat == "sub":
            return jnp.take(x2.T, perm, axis=0).T
        if strat == "onehot":
            p = (perm[:, None] == jnp.arange(x2.shape[1])[None, :]
                 ).astype(jnp.bfloat16)
            return jnp.dot(x2.astype(jnp.bfloat16), p.T,
                           preferred_element_type=jnp.float32
                           ).astype(x2.dtype)
        return jnp.take(x2, perm, axis=1)

    def pad_gather(x2, tm):
        """Round M up to the tile and THEN apply the act-order gather
        (M=1 lane gathers cost 35 us vs 11 at tm=16 — exp_gather.py)."""
        Mp = _round_up(max(M, tm), tm)
        xp = jnp.pad(x2, ((0, Mp - M), (0, 0))) if Mp != M else x2
        return gathered(xp), Mp

    backend = jax.default_backend()
    a8 = _pick_a8(M, K, qt.N, qt.cfg) if force != "xla" else None
    if a8 is not None:
        tm, tn, tk, gd = a8
        if backend == "tpu" or interpret or force == "pallas":
            xp, Mp = pad_gather(x2, tm)
            mode = None
            if qt.zeros is None and qt.N // tn <= 4:
                # sym, few N-tiles: raw x (original dtype — quantizing a
                # pre-rounded bf16 copy would diverge from the
                # quantize_act_i8 oracle), act-quant fused in-kernel per
                # grid step. Measured at 7B M=2048: qkv/o 0.42→0.36 ms,
                # down 1.60→0.93 (vs the XLA-prequantized path whose
                # int8 relayout into the custom call cost up to 0.8 ms).
                x_i8, sa, mode = xp, None, True
            else:
                # asym (zp epilogue needs host-side x_i8 row sums) or
                # many N-tiles (gate/up N/tn=11, lm_head N/tn=125):
                # XLA-side dynamic act quant. The naive in-kernel
                # flavor re-quantizes and re-streams bf16 x per N-tile
                # (lm_head 3.6→6.8 ms); the VMEM code-scratch flavor
                # ("scratch" mode, kept + tested) measured 1.21/6.61 ms
                # vs external's 0.94/3.60 at gate-up/lm_head — its
                # sequential-j grid breaks cross-N-tile pipelining, a
                # recorded negative result. External's int8 relayout
                # (~0.2 ms here) is the cheapest of the three.
                x_i8, sa = quantize_act_i8(xp, gd)
            out = _qmatmul_a8_pallas(x_i8, sa, qt, tm, tn, tk, gd,
                                     out_dtype=out_dtype,
                                     interpret=interpret, lidx=lidx,
                                     mode=mode)
            if Mp != M:
                out = out[:M]
            return out.reshape(*lead, qt.N)
        # CPU/XLA backends apply the SAME dynamic act-quant numerics via
        # the reference path: dispatch decides WHERE to compute, never
        # WHAT — and it lets the (CPU) PPL gate actually score the a8
        # prefill recipe the TPU runs (scripts/gate.py "q4_j").
        qtl = slice_layer(qt, lidx) if lidx is not None else qt
        return matmul_a8_ref(x2, qtl, gd, dtype=out_dtype).reshape(
            *lead, qt.N)
    if qt.planes[0].dtype in (jnp.int4, jnp.uint4, jnp.int8) \
            or qt.cfg.native_pack:
        code_bits = (8 if qt.planes[0].dtype == jnp.int8 else
                     8 // npack_codes_per_byte(qt.cfg.bits)
                     if qt.cfg.native_pack else 4)
        use_pallas = (backend == "tpu" or force == "pallas"
                      or interpret) and force != "xla"
        dec = _pick_decode_tiles(M, K, qt.N, qt.group_size, code_bits,
                                 npack=qt.cfg.native_pack) \
            if use_pallas else None
        if dec is not None:
            tm, tn = dec
            xp, _ = pad_gather(x2, tm)
            out = _qmatmul4_pallas(xp.astype(jnp.bfloat16), qt, tm, tn,
                                   out_dtype=out_dtype, interpret=interpret,
                                   lidx=lidx, m1=(M == 1))
            if out.shape[0] != M:
                out = out[:M]
            return out.reshape(*lead, qt.N)
        tiles = (_pick_tiles(M, K, qt.N, qt.group_size, 4,
                             "int" if qt.cfg.native_pack else "fp8__native")
                 if use_pallas else None)
        if tiles is not None:
            tm = tiles[0]
            xp, Mp = pad_gather(x2, tm)
            out = _qmatmul_pallas(xp.astype(jnp.bfloat16), qt, *tiles,
                                  out_dtype=out_dtype, interpret=interpret,
                                  lidx=lidx)
            if Mp != M:
                out = out[:M]
            return out.reshape(*lead, qt.N)
        if lidx is not None:
            qt = slice_layer(qt, lidx)
        return qmatmul_native(gathered(x2), qt, out_dtype).reshape(
            *lead, qt.N)

    use_pallas = force != "xla" and (backend == "tpu" or interpret
                                     or force == "pallas")
    tiles = (_pick_tiles(M, K, qt.N, qt.group_size, qt.cfg.bits, qt.cfg.kind)
             if use_pallas else None)
    if tiles is not None:
        tm = tiles[0]
        xp, Mp = pad_gather(x2, tm)
        out = _qmatmul_pallas(xp.astype(jnp.bfloat16), qt, *tiles,
                              out_dtype=out_dtype, interpret=interpret,
                              lidx=lidx)
        if Mp != M:
            out = out[:M]
        return out.reshape(*lead, qt.N)
    if lidx is not None:
        qt = slice_layer(qt, lidx)
    out = qmatmul_xla(x2, qt, out_dtype)
    return out.reshape(*lead, qt.N)
