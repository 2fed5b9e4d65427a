"""ctypes bindings for the native codec (native/ntpu_native.cpp).

Builds the shared library on first use (g++ -O3 -fopenmp) and caches it
next to the source. Every entry point has a pure-Python fallback, so the
framework works without a compiler; with it, checkpoint conversion runs
multithreaded at memory bandwidth (reference analog: the BesTLA pack/quant
driver, core/layers/bestla_gemm.cpp, which is likewise the multithreaded
host-side of quantization).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "ntpu_native.cpp")
_LIB = os.path.join(os.path.dirname(_SRC), "libntpu_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
             _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    c_f32p = ctypes.POINTER(ctypes.c_float)
    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    i64, i32 = ctypes.c_int64, ctypes.c_int
    lib.rtn_quantize_f32.argtypes = [c_f32p, i64, i64, i32, i32, i32,
                                     c_u8p, c_f32p, c_u8p]
    lib.pack_plane_u8.argtypes = [c_u8p, i64, i64, i32, i32, c_u8p]
    lib.unpack_plane_u8.argtypes = [c_u8p, i64, i64, i32, i32, c_u8p]
    lib.dequant_q4_0.argtypes = [c_u8p, i64, c_f32p]
    lib.dequant_q8_0.argtypes = [c_u8p, i64, c_f32p]
    lib.ntpu_native_version.restype = ctypes.c_int
    lib.ntpu_native_threads.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def rtn_quantize(w: np.ndarray, bits: int, group: int, sym: bool
                 ) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """f32 [K, N] → (codes u8 [K, N], scales f32 [G, N], zeros u8|None).
    Semantics identical to core/qtensor.quantize's int path."""
    lib = get_lib()
    assert lib is not None
    w = np.ascontiguousarray(w, np.float32)
    K, N = w.shape
    G = K // group
    codes = np.empty((K, N), np.uint8)
    scales = np.empty((G, N), np.float32)
    zeros = None if sym or bits == 1 else np.empty((G, N), np.uint8)
    lib.rtn_quantize_f32(
        _ptr(w, ctypes.c_float), K, N, group, bits, 1 if sym else 0,
        _ptr(codes, ctypes.c_uint8), _ptr(scales, ctypes.c_float),
        _ptr(zeros, ctypes.c_uint8) if zeros is not None
        else ctypes.POINTER(ctypes.c_uint8)())
    return codes, scales, zeros


def pack_plane(vals: np.ndarray, p: int, chunk: int) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    vals = np.ascontiguousarray(vals, np.uint8)
    K, N = vals.shape
    out = np.empty((K * p // 8, N), np.uint8)
    lib.pack_plane_u8(_ptr(vals, ctypes.c_uint8), K, N, p, chunk,
                      _ptr(out, ctypes.c_uint8))
    return out


def unpack_plane(packed: np.ndarray, p: int, chunk: int) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    packed = np.ascontiguousarray(packed, np.uint8)
    Kp, N = packed.shape
    K = Kp * 8 // p
    out = np.empty((K, N), np.uint8)
    lib.unpack_plane_u8(_ptr(packed, ctypes.c_uint8), K, N, p, chunk,
                        _ptr(out, ctypes.c_uint8))
    return out


def dequant_q4_0(blocks: np.ndarray, n: int) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    blocks = np.ascontiguousarray(blocks, np.uint8)
    out = np.empty(n, np.float32)
    lib.dequant_q4_0(_ptr(blocks, ctypes.c_uint8), n,
                     _ptr(out, ctypes.c_float))
    return out


def dequant_q8_0(blocks: np.ndarray, n: int) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    blocks = np.ascontiguousarray(blocks, np.uint8)
    out = np.empty(n, np.float32)
    lib.dequant_q8_0(_ptr(blocks, ctypes.c_uint8), n,
                     _ptr(out, ctypes.c_float))
    return out


def quantize_qtensor(w: np.ndarray, cfg):
    """Full native quantize+pack → QTensor (int kinds, bits 1..8).
    Drop-in accelerated version of core.qtensor.quantize."""
    import jax.numpy as jnp
    from .core.qtensor import QTensor, pack_chunk, plane_shifts
    K, N = w.shape
    g = K if cfg.group_size == -1 else cfg.group_size
    if g > K:  # per-tensor clamp, same rule as core.qtensor.quantize
        import dataclasses as _dc
        g = K
        cfg = _dc.replace(cfg, group_size=K)
    codes, scales, zeros = rtn_quantize(w, cfg.bits, g, cfg.sym)
    chunk = pack_chunk(cfg, K)
    planes = []
    for p, shift in plane_shifts(cfg.bits):
        part = ((codes >> shift) & ((1 << p) - 1)).astype(np.uint8)
        planes.append(jnp.asarray(pack_plane(part, p, chunk)))
    return QTensor(tuple(planes), jnp.asarray(scales),
                   None if zeros is None else jnp.asarray(zeros), None, cfg)
