"""Native checkpoint + session-state persistence.

Reference analogs: the NE/GGUF model files with versioned magics
(model_types.h:108-114), and the inference-state snapshot
(model_copy_state_data / model_set_state_data model_utils.cpp:1551-1773,
session files :1775-1869 with MODEL_SESSION_MAGIC).

Format: a single file — msgpack-free, dependency-free — consisting of a
JSON header (config + pytree spec with QuantConfig fields) and raw
little-endian tensor blobs, 64-byte aligned. Arrays load as numpy views
over an mmap (zero-copy until device transfer).
"""
from __future__ import annotations

import dataclasses
import json
import mmap
import struct
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from ..core.dtypes import QuantConfig
from ..core.qtensor import QTensor
from ..models.config import ModelConfig

MAGIC = b"NTPU"
VERSION = 1
ALIGN = 64

_DTYPES = {"float32": np.float32, "float16": np.float16,
           "bfloat16": ml_dtypes.bfloat16, "uint8": np.uint8,
           "int8": np.int8, "int32": np.int32, "int64": np.int64,
           "bool": np.bool_, "uint32": np.uint32,
           "float8_e4m3fn": ml_dtypes.float8_e4m3fn,
           "float8_e5m2": ml_dtypes.float8_e5m2,
           "int4": ml_dtypes.int4, "uint4": ml_dtypes.uint4}


def _encode_tree(obj, arrays: list, prefix=""):
    """pytree → JSON-able spec; arrays appended to ``arrays`` by index."""
    if isinstance(obj, QTensor):
        return {"__qtensor__": dataclasses.asdict(obj.cfg),
                "planes": [_encode_tree(p, arrays) for p in obj.planes],
                "scales": _encode_tree(obj.scales, arrays),
                "zeros": _encode_tree(obj.zeros, arrays),
                "perm": _encode_tree(obj.perm, arrays)}
    if obj is None:
        return None
    if isinstance(obj, dict):
        return {"__dict__": {k: _encode_tree(v, arrays) for k, v in
                             sorted(obj.items())}}
    if isinstance(obj, (list, tuple)):
        return {"__list__": [_encode_tree(v, arrays) for v in obj],
                "tuple": isinstance(obj, tuple)}
    arr = np.asarray(obj)
    idx = len(arrays)
    arrays.append(arr)
    return {"__arr__": idx, "dtype": str(arr.dtype),
            "shape": list(arr.shape)}


def _decode_tree(spec, arrays, to_jnp=True):
    if spec is None:
        return None
    if "__qtensor__" in spec:
        cfg = QuantConfig(**spec["__qtensor__"])
        return QTensor(
            tuple(_decode_tree(p, arrays, to_jnp) for p in spec["planes"]),
            _decode_tree(spec["scales"], arrays, to_jnp),
            _decode_tree(spec["zeros"], arrays, to_jnp),
            _decode_tree(spec["perm"], arrays, to_jnp), cfg)
    if "__dict__" in spec:
        return {k: _decode_tree(v, arrays, to_jnp)
                for k, v in spec["__dict__"].items()}
    if "__list__" in spec:
        vals = [_decode_tree(v, arrays, to_jnp) for v in spec["__list__"]]
        return tuple(vals) if spec.get("tuple") else vals
    arr = arrays[spec["__arr__"]]
    return jnp.asarray(arr) if to_jnp else arr


def save_checkpoint(path: str, params: Dict[str, Any],
                    cfg: Optional[ModelConfig] = None,
                    extra: Optional[dict] = None):
    arrays: list = []
    host = jax.tree.map(
        lambda a: np.asarray(a), params,
        is_leaf=lambda l: isinstance(l, jax.Array))
    spec = _encode_tree(host, arrays)
    header = {
        "version": VERSION,
        "config": dataclasses.asdict(cfg) if cfg else None,
        "extra": extra or {},
        "tree": spec,
    }
    hdr = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(MAGIC + struct.pack("<IQ", VERSION, len(hdr)))
        f.write(hdr)
        pos = f.tell()
        for arr in arrays:
            pad = (-pos) % ALIGN
            f.write(b"\0" * pad)
            pos += pad
            b = np.ascontiguousarray(arr).tobytes()
            f.write(b)
            pos += len(b)


def load_checkpoint(path: str, to_jnp: bool = True
                    ) -> Tuple[Dict[str, Any], Optional[ModelConfig], dict]:
    f = open(path, "rb")
    mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
    assert mm[:4] == MAGIC, "not a neural-tpu checkpoint"
    version, hlen = struct.unpack_from("<IQ", mm, 4)
    header = json.loads(mm[16:16 + hlen].decode())
    pos = 16 + hlen

    def walk_arrays(spec, out):
        if spec is None:
            return
        if "__arr__" in spec:
            out.append(spec)
        elif "__qtensor__" in spec:
            for p in spec["planes"]:
                walk_arrays(p, out)
            for k in ("scales", "zeros", "perm"):
                walk_arrays(spec[k], out)
        elif "__dict__" in spec:
            for v in spec["__dict__"].values():
                walk_arrays(v, out)
        elif "__list__" in spec:
            for v in spec["__list__"]:
                walk_arrays(v, out)

    specs: list = []
    walk_arrays(header["tree"], specs)
    specs.sort(key=lambda s: s["__arr__"])
    arrays = []
    for s in specs:
        pos += (-pos) % ALIGN
        dt = np.dtype(_DTYPES[s["dtype"]])
        shape = tuple(s["shape"])
        n = int(np.prod(shape))
        nbytes = n * dt.itemsize  # ml_dtypes sub-byte types store 1B/elem
        arr = np.frombuffer(mm, dt, n, pos).reshape(shape)
        arrays.append(arr)
        pos += nbytes
    params = _decode_tree(header["tree"], arrays, to_jnp)
    cfg = None
    if header["config"]:
        c = dict(header["config"])
        if c.get("rope_scaling"):  # JSON turns the tuple-of-pairs into lists
            c["rope_scaling"] = dict(tuple(x) for x in c["rope_scaling"])
        cfg = ModelConfig(**c)
    return params, cfg, header.get("extra", {})


# -- session state (KV cache + generation position) -------------------------


def save_session(path: str, cache, lengths, extra: Optional[dict] = None,
                 logits=None, rng_key=None, sampler_mu=None):
    """Snapshot the inference state (reference model_save_session_file).

    Beyond the KV cache + positions, the FULL state matches the
    reference's snapshot (model_utils.cpp:1551-1773 serializes rng,
    logits and kv): ``logits`` — the last step's [B, V] logits, so a
    resumed generation needs no re-eval; ``rng_key`` — the sampler's PRNG
    key at the snapshot point; ``sampler_mu`` — mirostat state. With all
    three, a resumed SAMPLED generation is bit-identical to the
    uninterrupted run."""
    state = {"k": cache.k, "v": cache.v}
    if cache.k_scale is not None:
        state["k_scale"] = cache.k_scale
        state["v_scale"] = cache.v_scale
    state["lengths"] = jnp.asarray(np.asarray(lengths))
    if logits is not None:
        state["logits"] = jnp.asarray(logits)
    if rng_key is not None:
        state["rng_key"] = jnp.asarray(
            jax.random.key_data(rng_key) if jnp.issubdtype(
                rng_key.dtype, jax.dtypes.prng_key) else rng_key)
    if sampler_mu is not None:
        state["sampler_mu"] = jnp.asarray(sampler_mu)
    save_checkpoint(path, state, None, extra)


def load_session(path: str):
    from ..runtime.kvcache import KVCache
    state, _, extra = load_checkpoint(path)

    def _scale(a):
        # compat: sessions saved before the flat scale layout stored
        # [L, B, Hkv, 8, S] f32 (8-replicated rows); squeeze + downcast
        if a is not None and a.ndim == 5:
            a = a[:, :, :, 0].astype(jnp.bfloat16)
        return a
    cache = KVCache(state["k"], state["v"], _scale(state.get("k_scale")),
                    _scale(state.get("v_scale")))
    extra = dict(extra or {})
    for aux in ("logits", "rng_key", "sampler_mu"):
        if aux in state:
            extra[aux] = state[aux]
    return cache, np.asarray(state["lengths"]), extra
