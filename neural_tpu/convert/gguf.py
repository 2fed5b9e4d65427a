"""GGUF file format: reader + minimal writer.

Reference: neural_speed/models/model_utils/gguf.h (GGUF types/kv/header
:83-198, ``gguf_loader`` model_files.h:246) and the HF→GGUF converter
(convert/convert-hf-to-gguf.py). This is a from-scratch implementation of
the public GGUF v2/v3 spec.

Reading maps llama.cpp-ecosystem checkpoints straight onto the unified
decoder: ggml block-quantized tensors (Q4_0/Q4_1/Q5_0/Q5_1/Q8_0) convert
LOSSLESSLY into our QTensor format (same 32-group structure; Q*_1's
additive ``m`` becomes a float zero-point); F16/BF16/F32 load as arrays.
"""
from __future__ import annotations

import mmap
import struct
from typing import Any, BinaryIO, Dict, List, Optional, Tuple

import numpy as np

GGUF_MAGIC = b"GGUF"

# gguf metadata value types (gguf.h:120)
T_U8, T_I8, T_U16, T_I16, T_U32, T_I32, T_F32, T_BOOL, T_STR, T_ARR, \
    T_U64, T_I64, T_F64 = range(13)

_SCALAR = {
    T_U8: "<B", T_I8: "<b", T_U16: "<H", T_I16: "<h", T_U32: "<I",
    T_I32: "<i", T_F32: "<f", T_BOOL: "<?", T_U64: "<Q", T_I64: "<q",
    T_F64: "<d",
}

# ggml tensor types (data_types.h:32-54 ne_type has the same ids)
GGML_F32, GGML_F16 = 0, 1
GGML_Q4_0, GGML_Q4_1 = 2, 3
GGML_Q5_0, GGML_Q5_1 = 6, 7
GGML_Q8_0 = 8
GGML_I8, GGML_I16, GGML_I32 = 24, 25, 26
GGML_BF16 = 30

QK = 32  # ggml quantization block size

_BLOCK_BYTES = {GGML_Q4_0: 2 + 16, GGML_Q4_1: 4 + 16, GGML_Q5_0: 2 + 4 + 16,
                GGML_Q5_1: 4 + 4 + 16, GGML_Q8_0: 2 + 32}


class GGUFTensor:
    def __init__(self, name, shape, ggml_type, offset):
        self.name = name
        self.shape = shape          # numpy order: (rows..., cols) = ne[::-1]
        self.ggml_type = ggml_type
        self.offset = offset

    def __repr__(self):
        return f"GGUFTensor({self.name}, {self.shape}, type={self.ggml_type})"


class GGUFReader:
    """Parses header/kv/tensor table; tensor data is read lazily from an
    mmap (reference: model_mmap util.h:183)."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        self._pos = 0
        self.kv: Dict[str, Any] = {}
        self.tensors: Dict[str, GGUFTensor] = {}
        self._parse()

    # -- low-level readers --------------------------------------------------
    def _read(self, fmt):
        size = struct.calcsize(fmt)
        v = struct.unpack_from(fmt, self._mm, self._pos)[0]
        self._pos += size
        return v

    def _read_str(self) -> str:
        n = self._read("<Q")
        s = self._mm[self._pos:self._pos + n].decode("utf-8", errors="replace")
        self._pos += n
        return s

    def _read_value(self, t):
        if t in _SCALAR:
            return self._read(_SCALAR[t])
        if t == T_STR:
            return self._read_str()
        if t == T_ARR:
            et = self._read("<I")
            n = self._read("<Q")
            if et in _SCALAR:
                fmt = "<" + str(n) + _SCALAR[et][1]
                size = struct.calcsize(fmt)
                v = np.frombuffer(self._mm, dtype=np.dtype(_SCALAR[et][1:]),
                                  count=n, offset=self._pos).copy()
                self._pos += size
                return v
            return [self._read_value(et) for _ in range(n)]
        raise ValueError(f"bad gguf value type {t}")

    # -- header -------------------------------------------------------------
    def _parse(self):
        assert self._mm[:4] == GGUF_MAGIC, "not a GGUF file"
        self._pos = 4
        self.version = self._read("<I")
        assert self.version in (2, 3), f"gguf v{self.version} unsupported"
        n_tensors = self._read("<Q")
        n_kv = self._read("<Q")
        for _ in range(n_kv):
            key = self._read_str()
            t = self._read("<I")
            self.kv[key] = self._read_value(t)
        infos = []
        for _ in range(n_tensors):
            name = self._read_str()
            nd = self._read("<I")
            ne = [self._read("<Q") for _ in range(nd)]
            ttype = self._read("<I")
            off = self._read("<Q")
            infos.append((name, ne, ttype, off))
        align = int(self.kv.get("general.alignment", 32))
        data_start = (self._pos + align - 1) // align * align
        for name, ne, ttype, off in infos:
            shape = tuple(ne[::-1])  # ggml ne[0] is fastest → numpy reverses
            self.tensors[name] = GGUFTensor(name, shape, ttype,
                                            data_start + off)

    # -- tensor data ----------------------------------------------------------
    def tensor_bytes(self, t: GGUFTensor) -> memoryview:
        n = int(np.prod(t.shape))
        if t.ggml_type in _BLOCK_BYTES:
            nbytes = n // QK * _BLOCK_BYTES[t.ggml_type]
        else:
            itemsize = {GGML_F32: 4, GGML_F16: 2, GGML_BF16: 2, GGML_I8: 1,
                        GGML_I16: 2, GGML_I32: 4}[t.ggml_type]
            nbytes = n * itemsize
        return memoryview(self._mm)[t.offset:t.offset + nbytes]

    def dequantize(self, name: str) -> np.ndarray:
        """Full-precision numpy array (row-major [out, in] like HF)."""
        t = self.tensors[name]
        raw = np.frombuffer(self.tensor_bytes(t), dtype=np.uint8).copy()
        n = int(np.prod(t.shape))
        tt = t.ggml_type
        if tt == GGML_F32:
            return raw.view(np.float32).reshape(t.shape).copy()
        if tt == GGML_F16:
            return raw.view(np.float16).astype(np.float32).reshape(t.shape)
        if tt == GGML_BF16:
            import ml_dtypes
            return raw.view(ml_dtypes.bfloat16).astype(np.float32).reshape(
                t.shape)
        if tt == GGML_I32:
            return raw.view(np.int32).reshape(t.shape).copy()
        codes, d, m = self.unpack_quantized(name)
        w = codes.astype(np.float32) * d.repeat(QK, -1).reshape(codes.shape)
        if m is not None:
            w = w + m.repeat(QK, -1).reshape(codes.shape)
        return w.reshape(t.shape)

    def unpack_quantized(self, name: str):
        """→ (codes [n] int, d [n/32] f32, m [n/32] f32 or None).

        Codes are ALREADY CENTERED for the sym types (Q4_0: q-8, Q5_0:
        q-16, Q8_0: signed). Block layouts per ggml (data_types.h:80-140):
        Q4 low nibbles = elements 0..15, high = 16..31.
        """
        t = self.tensors[name]
        raw = np.frombuffer(self.tensor_bytes(t), dtype=np.uint8).copy()
        n = int(np.prod(t.shape))
        nb = n // QK
        tt = t.ggml_type
        blk = raw.reshape(nb, _BLOCK_BYTES[tt])

        def fp16(col):
            return blk[:, col:col + 2].copy().view(np.float16)[:, 0].astype(
                np.float32)

        if tt == GGML_Q4_0:
            d = fp16(0)
            q = blk[:, 2:18]
            lo, hi = q & 0xF, q >> 4
            codes = np.concatenate([lo, hi], 1).astype(np.int8) - 8
            return codes.reshape(-1), d, None
        if tt == GGML_Q4_1:
            d, m = fp16(0), fp16(2)
            q = blk[:, 4:20]
            codes = np.concatenate([q & 0xF, q >> 4], 1).astype(np.int8)
            return codes.reshape(-1), d, m
        if tt in (GGML_Q5_0, GGML_Q5_1):
            off = 2 if tt == GGML_Q5_0 else 4
            d = fp16(0)
            m = None if tt == GGML_Q5_0 else fp16(2)
            qh = blk[:, off:off + 4].copy().view(np.uint32)[:, 0]
            q = blk[:, off + 4:off + 20]
            lo = np.concatenate([q & 0xF, q >> 4], 1).astype(np.int16)
            hibits = ((qh[:, None] >> np.arange(32)[None, :]) & 1).astype(
                np.int16)
            codes = lo | (hibits << 4)
            if tt == GGML_Q5_0:
                codes = codes - 16
            return codes.reshape(-1), d, m
        if tt == GGML_Q8_0:
            d = fp16(0)
            codes = blk[:, 2:34].view(np.int8)
            return codes.reshape(-1).copy(), d, None
        raise ValueError(f"unsupported ggml type {tt}")

    def close(self):
        import gc
        gc.collect()  # release any lingering views into the mmap
        try:
            self._mm.close()
        except BufferError:
            pass  # a view escaped; the mmap dies with the process
        self._f.close()


# ---------------------------------------------------------------------------
# Writer (minimal: F32/F16/Q4_0 — the reference converter's main outputs)
# ---------------------------------------------------------------------------


def _pack_q4_0(w: np.ndarray) -> bytes:
    """f32 [..] → ggml Q4_0 blocks (RTN per 32-block, llama.cpp layout)."""
    flat = w.reshape(-1, QK).astype(np.float32)
    absmax_idx = np.argmax(np.abs(flat), axis=1)
    maxval = flat[np.arange(len(flat)), absmax_idx]
    d = maxval / -8.0                              # ggml convention
    inv = np.where(d != 0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = np.clip(np.round(flat * inv[:, None]) + 8, 0, 15).astype(np.uint8)
    lo, hi = q[:, :16], q[:, 16:]
    packed = (lo | (hi << 4)).astype(np.uint8)
    out = bytearray()
    d16 = d.astype(np.float16)
    for i in range(len(flat)):
        out += d16[i].tobytes() + packed[i].tobytes()
    return bytes(out)


class GGUFWriter:
    def __init__(self, path: str, align: int = 32):
        self.path = path
        self.align = align
        self.kv: List[Tuple[str, int, Any]] = []
        self.tensors: List[Tuple[str, tuple, int, bytes]] = []

    def add_kv(self, key: str, value, vtype: Optional[int] = None):
        if vtype is None:
            if isinstance(value, bool):
                vtype = T_BOOL
            elif isinstance(value, int):
                vtype = T_U32 if value >= 0 else T_I32
            elif isinstance(value, float):
                vtype = T_F32
            elif isinstance(value, str):
                vtype = T_STR
            elif isinstance(value, (list, np.ndarray)):
                vtype = T_ARR
            else:
                raise TypeError(type(value))
        self.kv.append((key, vtype, value))

    def add_tensor(self, name: str, w: np.ndarray, ggml_type: int):
        if ggml_type == GGML_F32:
            data = w.astype(np.float32).tobytes()
        elif ggml_type == GGML_F16:
            data = w.astype(np.float16).tobytes()
        elif ggml_type == GGML_Q4_0:
            data = _pack_q4_0(w)
        else:
            raise ValueError(ggml_type)
        self.tensors.append((name, w.shape, ggml_type, data))

    @staticmethod
    def _enc_str(s: str) -> bytes:
        b = s.encode("utf-8")
        return struct.pack("<Q", len(b)) + b

    def _enc_value(self, vtype, v) -> bytes:
        if vtype in _SCALAR:
            return struct.pack(_SCALAR[vtype], v)
        if vtype == T_STR:
            return self._enc_str(v)
        if vtype == T_ARR:
            if isinstance(v, np.ndarray):
                et = {np.dtype(np.int32): T_I32, np.dtype(np.float32): T_F32,
                      np.dtype(np.uint32): T_U32,
                      np.dtype(np.int64): T_I64}[v.dtype]
                return (struct.pack("<IQ", et, len(v)) + v.tobytes())
            # list of strings
            out = struct.pack("<IQ", T_STR, len(v))
            return out + b"".join(self._enc_str(x) for x in v)
        raise ValueError(vtype)

    def write(self):
        with open(self.path, "wb") as f:
            f.write(GGUF_MAGIC)
            f.write(struct.pack("<IQQ", 3, len(self.tensors), len(self.kv)))
            for key, vtype, v in self.kv:
                f.write(self._enc_str(key))
                f.write(struct.pack("<I", vtype))
                f.write(self._enc_value(vtype, v))
            off = 0
            metas = []
            for name, shape, ttype, data in self.tensors:
                metas.append(off)
                off += (len(data) + self.align - 1) // self.align * self.align
            for (name, shape, ttype, data), toff in zip(self.tensors, metas):
                f.write(self._enc_str(name))
                ne = shape[::-1]
                f.write(struct.pack("<I", len(ne)))
                for d in ne:
                    f.write(struct.pack("<Q", d))
                f.write(struct.pack("<IQ", ttype, toff))
            pos = f.tell()
            pad = (pos + self.align - 1) // self.align * self.align - pos
            f.write(b"\0" * pad)
            for (name, shape, ttype, data), toff in zip(self.tensors, metas):
                f.write(data)
                pad = (len(data) + self.align - 1) // self.align * self.align \
                    - len(data)
                f.write(b"\0" * pad)
