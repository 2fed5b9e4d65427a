"""Quantized weight container and round-to-nearest quantizer.

TPU-native analog of the reference's packed-weight storage
(bestla/bestla/bestla_storage.h:697 ``StorageWeightKBlockNInteger``, :836
``StorageWeightKBlockNFloat``) and the RTN quantization driver
(neural_speed/models/model_utils/quant_utils.cpp:269-355 ``bestla_quantize`` →
``BTLAGemmQuantPackB``).

Layout: a weight ``W`` of shape ``[K, N]`` (in-features x out-features, so the
matmul is ``x @ W``) is stored as

- unsigned codes bit-plane packed along K: one uint8 array per plane in
  {4, 2, 1} bits (8-bit weights use a single full-byte plane). Plane ``p``
  packs ``8 // p`` consecutive-K values per byte. This replaces the
  reference's bit-serial layout (bestla_wrapper.h:26-258 ``gemv_nbits``).
- per-group scales ``[K // group_size, N]`` (f32 or bf16),
- optional per-group uint8 zero-points (asymmetric),
- optional K-permutation ``perm`` for GPTQ act-order imports
  (reference: convert_quantized_llama.py g_idx handling).

fp8 kinds store the values directly as ml_dtypes float8 arrays (the MXU/VPU
understand them natively); nf4/fp4 store 4-bit LUT indices.

All pack/unpack math is plain jnp shift/mask arithmetic so the identical code
path runs (a) on host for tests, (b) inside XLA for the fallback matmul, and
(c) inside Pallas kernels.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dtypes import QuantConfig, bit_planes

# ---------------------------------------------------------------------------
# Bit-plane pack / unpack (jnp; usable inside Pallas kernels)
# ---------------------------------------------------------------------------


def pack_plane(vals: jnp.ndarray, p: int, chunk: int) -> jnp.ndarray:
    """Pack ``p``-bit values (uint8 [K, N], each < 2**p) into uint8 [K*p//8, N].

    The packing is *chunk-local*: within each contiguous run of ``chunk``
    K-values, the run is split into ``8//p`` sub-chunks and sub-chunk ``c``
    is stored at bit offset ``p*c`` of the byte. Unpacking is therefore a
    shift+mask followed by a pure sublane *concatenation* (no element
    interleave), which Mosaic lowers without cross-lane shuffles. ``chunk``
    is normally the quantization group size, so any kernel K-tile that is a
    multiple of the group size unpacks correctly in isolation.
    """
    if p == 8:
        return vals.astype(jnp.uint8)
    per_byte = 8 // p
    K, N = vals.shape
    assert K % chunk == 0 and chunk % per_byte == 0, (K, chunk, per_byte)
    sub = chunk // per_byte
    # [G, per_byte, sub, N]: value k = g*chunk + c*sub + r lives in byte
    # row g*sub + r at bit offset p*c.
    v = vals.reshape(K // chunk, per_byte, sub, N).astype(jnp.int32)
    out = jnp.zeros((K // chunk, sub, N), jnp.int32)
    for c in range(per_byte):
        out = out | (v[:, c] << (p * c))
    return out.reshape(K // per_byte, N).astype(jnp.uint8)


def unpack_plane(packed: jnp.ndarray, p: int, chunk: int) -> jnp.ndarray:
    """Inverse of :func:`pack_plane`: uint8 [K*p//8, N] → int32 [K, N] (< 2**p).

    Shift/mask arithmetic runs in int32 (Mosaic has no sub-word vector
    shifts) and the recombination is a sublane-dim concat, usable as-is
    inside Pallas kernels.
    """
    if p == 8:
        return packed.astype(jnp.int32)
    per_byte = 8 // p
    sub = chunk // per_byte
    Kp, N = packed.shape
    b = packed.astype(jnp.int32).reshape(Kp // sub, sub, N)
    mask = (1 << p) - 1
    parts = [(b >> (p * c)) & mask for c in range(per_byte)]
    # [G, per_byte, sub, N] -> [K, N]; flatten order matches pack_plane.
    return jnp.stack(parts, axis=1).reshape(Kp * per_byte, N)


def plane_shifts(bits: int) -> Tuple[Tuple[int, int], ...]:
    """((plane_width, left_shift), ...) so code = sum(plane << shift)."""
    planes = bit_planes(bits)
    shifts = []
    rem = bits
    for p in planes:
        rem -= p
        shifts.append((p, rem))
    return tuple(shifts)


def pack_codes(codes: jnp.ndarray, bits: int, chunk: int) -> Tuple[jnp.ndarray, ...]:
    """Split unsigned codes [K, N] (< 2**bits) into packed plane arrays."""
    codes = codes.astype(jnp.int32)
    out = []
    for p, shift in plane_shifts(bits):
        part = (codes >> shift) & ((1 << p) - 1)
        out.append(pack_plane(part, p, chunk))
    return tuple(out)


def unpack_codes(planes: Tuple[jnp.ndarray, ...], bits: int, chunk: int) -> jnp.ndarray:
    """Rebuild unsigned codes int32 [K, N] from packed plane arrays."""
    code = None
    for arr, (p, shift) in zip(planes, plane_shifts(bits)):
        part = unpack_plane(arr, p, chunk) << shift
        code = part if code is None else code | part
    return code


def npack_codes_per_byte(bits: int) -> int:
    """Codes per byte in the native-pack at-rest layout: int2 codes pack 4
    per byte (2-bit two's-complement fields, LSB first — the
    ``pltpu.bitcast(uint8 → int2)`` order, hardware-verified round 4/5);
    3- and 4-bit codes pack 2 per byte as int4 nibbles (a 3-bit code in a
    nibble container: the hardware int4 convert is ~3-7x faster than VPU
    bit-plane unpack, worth the 33% extra bytes — see to_native)."""
    return 4 if bits == 2 else 2


def pack_chunk(cfg: QuantConfig, K: int) -> int:
    """Chunk-locality of the bit-plane packing: the scale group size, or a
    fixed 32 for per-channel quantization (so K-tiling stays possible)."""
    if cfg.group_size == -1:
        return 32 if K % 32 == 0 else K
    return cfg.group_size


# ---------------------------------------------------------------------------
# QTensor
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QTensor:
    """A quantized ``[K, N]`` weight. Pytree: arrays are leaves, cfg static.

    K/N are derived from the arrays (never stored statically) so that a
    QTensor sliced by lax.scan (leading L stack) or sharded by shard_map
    (TP row/column split) is self-consistently a smaller QTensor.
    """

    planes: Tuple[jnp.ndarray, ...]  # packed code planes (or fp8 data)
    scales: jnp.ndarray              # [G, N]
    zeros: Optional[jnp.ndarray]     # [G, N] uint8, asym only
    perm: Optional[jnp.ndarray]      # [K] int32 act-order permutation or None
    cfg: QuantConfig = dataclasses.field(metadata=dict(static=True))

    @property
    def K(self) -> int:
        if self.cfg.kind.startswith("fp8") or \
                self.planes[0].dtype in (jnp.int4, jnp.uint4, jnp.int8):
            return self.planes[0].shape[-2]
        if self.cfg.native_pack:
            # u8 rows hold 2 nibble codes (3-4 bit) or 4 2-bit fields
            return self.planes[0].shape[-2] * npack_codes_per_byte(
                self.cfg.bits)
        p0 = bit_planes(self.cfg.bits)[0]
        return self.planes[0].shape[-2] * (8 // p0) if p0 != 8 else \
            self.planes[0].shape[-2]

    @property
    def N(self) -> int:
        return self.planes[0].shape[-1]

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.K, self.N)

    @property
    def group_size(self) -> int:
        g = self.cfg.group_size
        return self.K if g == -1 else g

    def nbytes(self) -> int:
        tot = sum(int(np.prod(p.shape)) * p.dtype.itemsize for p in self.planes)
        tot += self.scales.size * self.scales.dtype.itemsize
        if self.zeros is not None:
            tot += self.zeros.size
        return tot


# ---------------------------------------------------------------------------
# Quantize (RTN)
# ---------------------------------------------------------------------------


def _group(w: jnp.ndarray, g: int) -> jnp.ndarray:
    K, N = w.shape
    assert K % g == 0, f"K={K} not divisible by group_size={g}"
    return w.reshape(K // g, g, N)


def quantize(w: jnp.ndarray, cfg: QuantConfig) -> QTensor:
    """Round-to-nearest quantization of ``w`` [K, N] → :class:`QTensor`.

    Mirrors the reference RTN path (quant_utils.cpp:269 ``bestla_quantize``):
    per-K-group scales, symmetric or asymmetric, int/nf4/fp4/fp8 kinds.
    """
    w = jnp.asarray(w, jnp.float32)
    K, N = w.shape
    g = K if cfg.group_size == -1 else cfg.group_size
    if g > K:
        # per-tensor clamp: a g128 preset applied to a small projection
        # (e.g. hidden 64 in a test model) degrades to one group over K —
        # the QTensor's cfg records the ACTUAL group so downstream layout
        # math (pack chunks, kernel group windows) stays consistent
        import dataclasses as _dc
        g = K
        cfg = _dc.replace(cfg, group_size=K)
    wg = _group(w, g)  # [G, g, N]
    eps = 1e-9

    if cfg.kind == "int":
        b = cfg.bits
        if b == 1:
            # 1-bit: codes {0,1} -> {-1,+1} * scale, scale = mean|w| per group.
            scales = jnp.mean(jnp.abs(wg), axis=1) + eps
            codes = (wg >= 0).astype(jnp.uint8).reshape(K, N)
            zeros = None
        elif cfg.sym:
            half = 1 << (b - 1)
            absmax = jnp.max(jnp.abs(wg), axis=1)  # [G, N]
            scales = absmax / half + eps
            q = jnp.clip(jnp.round(wg / scales[:, None, :]), -half, half - 1)
            codes = (q + half).astype(jnp.uint8).reshape(K, N)
            zeros = None
        else:
            maxq = (1 << b) - 1
            wmin = jnp.minimum(jnp.min(wg, axis=1), 0.0)
            wmax = jnp.maximum(jnp.max(wg, axis=1), 0.0)
            scales = (wmax - wmin) / maxq + eps
            zp = jnp.clip(jnp.round(-wmin / scales), 0, maxq)
            q = jnp.clip(jnp.round(wg / scales[:, None, :]) + zp[:, None, :], 0, maxq)
            codes = q.astype(jnp.uint8).reshape(K, N)
            zeros = zp.astype(jnp.uint8)
        planes = pack_codes(codes, b, pack_chunk(cfg, K))
        scales = scales.astype(cfg.scale_jnp)
        return QTensor(planes, scales, zeros, None, cfg)

    if cfg.kind in ("nf4", "fp4"):
        lut = jnp.asarray(cfg.lut)  # [16]
        absmax = jnp.max(jnp.abs(wg), axis=1) + eps  # [G, N]
        normed = wg / absmax[:, None, :]
        # nearest LUT entry
        d = jnp.abs(normed[..., None] - lut)  # [G, g, N, 16]
        codes = jnp.argmin(d, axis=-1).astype(jnp.uint8).reshape(K, N)
        planes = pack_codes(codes, 4, pack_chunk(cfg, K))
        return QTensor(planes, absmax.astype(cfg.scale_jnp), None, None, cfg)

    if cfg.kind.startswith("fp8"):
        fp8 = jnp.float8_e4m3fn if cfg.kind == "fp8_e4m3" else jnp.float8_e5m2
        fmax = 448.0 if cfg.kind == "fp8_e4m3" else 57344.0
        absmax = jnp.max(jnp.abs(wg), axis=1) + eps
        scales = absmax / fmax
        data = (wg / scales[:, None, :]).reshape(K, N).astype(fp8)
        return QTensor((data,), scales.astype(cfg.scale_jnp), None, None, cfg)

    raise ValueError(cfg.kind)


# ---------------------------------------------------------------------------
# Dequantize (the test oracle — analog of bestla kernel_ref.h)
# ---------------------------------------------------------------------------


def centered_codes(qt: QTensor) -> jnp.ndarray:
    """Unsigned codes → signed/centered integer values [K, N] (int8 domain).

    For sym int: code - 2^(b-1); for 1-bit: 2*code - 1; asym handled in
    :func:`dequantize` (needs per-group zp). nf4/fp4/fp8 not applicable.
    """
    assert qt.cfg.kind == "int"
    codes = unpack_codes(qt.planes, qt.cfg.bits, pack_chunk(qt.cfg, qt.K))
    b = qt.cfg.bits
    if b == 1:
        return codes.astype(jnp.int8) * 2 - 1
    if qt.cfg.sym:
        return codes.astype(jnp.int8) - (1 << (b - 1))
    return codes.astype(jnp.int8)  # still biased by zp; caller subtracts


def dequantize(qt: QTensor, dtype=jnp.float32) -> jnp.ndarray:
    """Full-precision reconstruction [K, N]. Reference oracle for every kernel."""
    cfg = qt.cfg
    K, N = qt.shape
    g = qt.group_size

    if cfg.kind == "int":
        if qt.planes[0].dtype in (jnp.int4, jnp.uint4, jnp.int8):
            codes = qt.planes[0].astype(jnp.int32)
            if cfg.sym:
                codes = codes + (1 << (cfg.bits - 1))  # back to unsigned
        elif cfg.native_pack:
            # u8 bytes hold CENTERED sub-byte fields (LSB first);
            # sign-extend — same domain as to_native's planes (sym codes
            # re-shift below; asym zeros are stored shifted)
            b = qt.planes[0].astype(jnp.int32)           # [K/cpb, N]
            if cfg.bits == 2:
                fields = [(((b >> s) & 0x3) ^ 2) - 2 for s in (0, 2, 4, 6)]
            else:
                fields = [((b & 0xF) ^ 8) - 8,
                          (((b >> 4) & 0xF) ^ 8) - 8]
            codes = jnp.stack(fields, axis=1).reshape(K, N)
            if cfg.sym:
                codes = codes + (1 << (cfg.bits - 1))
        else:
            codes = unpack_codes(qt.planes, cfg.bits,
                                 pack_chunk(cfg, K))  # int32 [K, N]
        if cfg.bits == 1:
            vals = codes.astype(jnp.float32) * 2.0 - 1.0
        elif cfg.sym:
            vals = codes.astype(jnp.float32) - (1 << (cfg.bits - 1))
        else:
            zp = jnp.repeat(qt.zeros.astype(jnp.float32), g, axis=0)  # [K, N]
            vals = codes.astype(jnp.float32) - zp
        scales = jnp.repeat(qt.scales.astype(jnp.float32), g, axis=0)
        w = vals * scales
    elif cfg.kind in ("nf4", "fp4"):
        codes = unpack_codes(qt.planes, 4, pack_chunk(cfg, K))
        lut = jnp.asarray(cfg.lut)
        vals = lut[codes.astype(jnp.int32)]
        scales = jnp.repeat(qt.scales.astype(jnp.float32), g, axis=0)
        w = vals * scales
    elif cfg.kind.startswith("fp8"):
        scales = jnp.repeat(qt.scales.astype(jnp.float32), g, axis=0)
        w = qt.planes[0].astype(jnp.float32) * scales
    else:
        raise ValueError(cfg.kind)

    if qt.perm is not None:
        # stored rows are in permuted (act-order) K order; undo it.
        inv = jnp.zeros_like(qt.perm).at[qt.perm].set(jnp.arange(K))
        w = w[inv]
    return w.astype(dtype)


def to_native(qt: QTensor) -> QTensor:
    """Convert a packed int QTensor to native signed codes for decode.

    Codes remap LOSSLESSLY into the next hardware-convertible width:
    2–4 bit → jnp.int4, 5–8 bit → jnp.int8, centered by -2^(bits-1) (the
    zero-points shift by the same amount, so (c-S) - (z-S) == c - z
    everywhere). Why: the decode kernel's dequant is fed by the TPU's
    hardware intN→f32 convert, which streams weights at ~660 (int4) /
    ~750 (int8) GB/s on v5e, vs ~70-230 GB/s for VPU shift/mask bit-plane
    unpacking — an int3 tensor decoded as int4 codes moves 33% more HBM
    bytes yet runs ~7x faster end-to-end (39 → ~5.5 ms/tok on a 7B,
    scripts/exp_variants.py). Call INSIDE a jit (ideally once, before a
    scan over decode steps): int4 arrays cannot cross jit boundaries on
    some runtimes. No-op for non-int kinds and 1-bit (sign) weights.
    """
    cfg = qt.cfg
    if cfg.kind != "int" or qt.planes[0].dtype != jnp.uint8 \
            or cfg.native_pack:
        return qt
    if cfg.bits < 2:
        return qt
    if cfg.bits == 2:
        # int2 has its own hardware path (pltpu.bitcast uint8 → int2 +
        # native convert): the 2-bit byte-packed form streams HALF the
        # bytes of an int4 container and is jit-boundary-safe — use it
        # for the in-jit conversion too (the packing is plain uint8/int32
        # arithmetic, fine under jit).
        return to_native_packed(qt)
    chunk = pack_chunk(cfg, qt.K)
    target = jnp.int4 if cfg.bits <= 4 else jnp.int8
    shift = 1 << (cfg.bits - 1)

    def unpack2d(*planes):
        if cfg.bits == 8:
            codes = planes[0].astype(jnp.int32)
        else:
            codes = unpack_codes(planes, cfg.bits, chunk)  # int32 [K, N]
        return (codes - shift).astype(target)

    fn = unpack2d
    for _ in range(qt.planes[0].ndim - 2):                 # L / E stacks
        fn = jax.vmap(fn)
    # Scales (and float zero-points) downcast to bf16 for the decode path:
    # the decode kernel runs at the HBM roofline, where f32 scales at
    # group_size 32 are 25% extra traffic on top of the int4 codes. bf16's
    # ~0.2% scale rounding is far under the int code rounding error.
    # (Mosaic has no f16; storage stays lossless f32 — this cast is local
    # to the jit that runs decode.)
    scales = qt.scales.astype(jnp.bfloat16)
    zeros = qt.zeros
    if zeros is not None:
        # match the code shift (uint8 integer zp and float zp alike)
        zeros = (zeros.astype(jnp.float32) - shift).astype(jnp.bfloat16)
    return QTensor((fn(*qt.planes),), scales, zeros, qt.perm, cfg)


def to_native_packed(qt: QTensor) -> QTensor:
    """Convert a 2-4 bit packed int QTensor to the AT-REST decode format:
    a uint8 plane [*lead, K/2, N] whose nibbles are the CENTERED int4
    codes in hardware-bitcast order (byte row s = code 2s in the low
    nibble, code 2s+1 in the high). The Pallas kernels reinterpret the
    tile as int4 with one in-register ``pltpu.bitcast`` and use the TPU's
    hardware int4→f32 convert — same speed as to_native's int4 planes,
    but the array is uint8, so it CAN live across jit boundaries: convert
    ONCE at load, and no decode executable re-pays the conversion or
    holds a second copy of the model (the round-2 double-residency;
    reference analog: packed weights are load-time artifacts,
    bestla/bestla/bestla_storage.h:697).

    Scales (and zero-points, shifted like to_native) downcast to bf16.
    Runs outside jit (uint8/int32 ops only); works on [L, ...] stacks.
    """
    cfg = qt.cfg
    if (cfg.kind != "int" or qt.planes[0].dtype != jnp.uint8
            or not 2 <= cfg.bits <= 4 or cfg.native_pack):
        return qt
    chunk = pack_chunk(cfg, qt.K)
    shift = 1 << (cfg.bits - 1)

    def repack2d(*planes):
        codes = unpack_codes(planes, cfg.bits, chunk)    # int32 [K, N]
        if cfg.bits == 2:
            f = (codes - shift) & 0x3                    # two's-complement
            return (f[0::4] | (f[1::4] << 2) | (f[2::4] << 4)
                    | (f[3::4] << 6)).astype(jnp.uint8)  # [K/4, N]
        nib = (codes - shift) & 0xF                      # two's-complement
        lo, hi = nib[0::2], nib[1::2]
        return (lo | (hi << 4)).astype(jnp.uint8)        # [K/2, N]

    fn = repack2d
    for _ in range(qt.planes[0].ndim - 2):               # L / E stacks
        fn = jax.vmap(fn)
    scales = qt.scales.astype(jnp.bfloat16)
    zeros = qt.zeros
    if zeros is not None:
        zeros = (zeros.astype(jnp.float32) - shift).astype(jnp.bfloat16)
    cfg2 = dataclasses.replace(cfg, native_pack=True)
    return QTensor((fn(*qt.planes),), scales, zeros, qt.perm, cfg2)


def concat_n(qts: Sequence["QTensor"]) -> "QTensor":
    """Concatenate QTensors along N (output features): the storage-level
    analog of fusing QKV / gate-up projections into one GEMM (reference:
    fused qkv ne_bestla.h:42; models build fused graphs per arch). All
    inputs must share cfg and K. Act-order tensors fuse iff they share the
    SAME K-permutation (GPTQ quantizes q/k/v — and gate/up — against the
    same Hessian, so their g_idx match; the fused GEMM then needs ONE
    activation gather instead of three). Works on packed (uint8) planes
    outside jit — call once at load time."""
    first = qts[0]
    assert all(q.cfg == first.cfg for q in qts), "mixed quant configs"
    assert all(q.K == first.K for q in qts), "mixed K"
    if first.perm is not None:
        import numpy as _np
        assert all(q.perm is not None
                   and _np.array_equal(_np.asarray(q.perm),
                                       _np.asarray(first.perm))
                   for q in qts), "act-order tensors need matching perms"
    else:
        assert all(q.perm is None for q in qts), \
            "mixed act-order/plain tensors can't fuse"
    planes = tuple(jnp.concatenate([q.planes[i] for q in qts], axis=-1)
                   for i in range(len(first.planes)))
    scales = jnp.concatenate([q.scales for q in qts], axis=-1)
    zeros = None
    if first.zeros is not None:
        zeros = jnp.concatenate([q.zeros for q in qts], axis=-1)
    return QTensor(planes, scales, zeros, first.perm, first.cfg)


NATIVE_DTYPES = (jnp.int4, jnp.uint4, jnp.int8)


def is_native(qt: QTensor) -> bool:
    return qt.planes[0].dtype in NATIVE_DTYPES or qt.cfg.native_pack


def matmul_ref(x: jnp.ndarray, qt: QTensor, dtype=None) -> jnp.ndarray:
    """Oracle matmul: ``x @ dequantize(qt)`` in f32. [*, K] @ [K, N] → [*, N]."""
    w = dequantize(qt, jnp.float32)
    out = jnp.asarray(x, jnp.float32) @ w
    return out.astype(dtype or x.dtype)
