"""Helpers to split fused HF QKV tensors into separate q/k/v.

The reference keeps QKV fused and runs a fused 3-GEMM
(neural_speed/core/layers/ip_fusion_qkv.cpp); on TPU we keep separate
[K, N] tensors (clean head-dim TP sharding; XLA fuses the three matmuls'
HBM reads anyway), so each family's fused layout is untangled once at
conversion time.

All inputs here are HF-layout [out_features, in_features] numpy arrays —
OR already-imported :class:`~neural_tpu.core.qtensor.QTensor`s from a
GPTQ/AWQ checkpoint (the reference's convert_quantized_* family,
convert/convert_quantized_qwen.py etc., splits the same fused layouts on
the packed int32 words). A QTensor is [K=in, N=out] with codes packed
along K only, so any out-feature split is an exact N-axis take; each
helper computes its index arithmetic by running itself on ``arange(N)``.
"""
from __future__ import annotations

import numpy as np


def asw(x):
    """Weight passthrough for preprocess hooks: numpy for fp tensors,
    as-is for already-quantized QTensors."""
    return x if hasattr(x, "planes") else np.asarray(x)


def take_n(qt, idx: np.ndarray):
    """Select output columns ``idx`` of a QTensor (exact: packing is along
    K; scales/zeros are [G, N])."""
    from ..core.qtensor import QTensor
    planes = tuple(p[..., idx] for p in qt.planes)
    zeros = None if qt.zeros is None else qt.zeros[..., idx]
    return QTensor(planes, qt.scales[..., idx], zeros, qt.perm, qt.cfg)


def _qsplit(qt, split_fn):
    """Apply an out-feature split helper to a QTensor by running the same
    index arithmetic on arange(N)."""
    parts = split_fn(np.arange(qt.N))
    return tuple(take_n(qt, np.asarray(p).reshape(-1)) for p in parts)


def split_interleaved(w, n_heads: int, head_dim: int):
    """[H*3*Dh, D] with per-head (q,k,v) interleave → 3x [H*Dh, D].
    Layout used by GPT-NeoX and Bloom."""
    if hasattr(w, "planes"):
        return _qsplit(w, lambda i: split_interleaved(i, n_heads, head_dim))
    w4 = w.reshape(n_heads, 3, head_dim, *w.shape[1:])
    return (w4[:, 0].reshape(n_heads * head_dim, *w.shape[1:]),
            w4[:, 1].reshape(n_heads * head_dim, *w.shape[1:]),
            w4[:, 2].reshape(n_heads * head_dim, *w.shape[1:]))


def split_concat(w, q_dim: int, kv_dim: int):
    """[q+kv+kv, D] straight concatenation → q, k, v. Layout used by MPT,
    Phi-3 qkv_proj, GPT-BigCode c_attn, Baichuan W_pack, ChatGLM."""
    if hasattr(w, "planes"):
        return _qsplit(w, lambda i: split_concat(i, q_dim, kv_dim))
    return w[:q_dim], w[q_dim:q_dim + kv_dim], w[q_dim + kv_dim:]


def split_rows(w, n: int):
    """[A+B, D] → [A, D], [B, D] (fused gate_up: Phi-3, ChatGLM-2/3)."""
    if hasattr(w, "planes"):
        return _qsplit(w, lambda i: split_rows(i, n))
    return w[:n], w[n:]


def split_falcon(w, n_heads: int, n_kv: int, head_dim: int,
                 new_arch: bool, multi_query: bool):
    """Falcon query_key_value layouts (reference analog:
    convert_falcon.py): grouped [Hkv, q_per+2, Dh, D] for the new decoder
    architecture, [H+2, Dh, D] for classic multi-query, per-head
    interleave otherwise."""
    if hasattr(w, "planes"):
        return _qsplit(w, lambda i: split_falcon(
            i, n_heads, n_kv, head_dim, new_arch, multi_query))
    rest = w.shape[1:]
    if new_arch:
        q_per = n_heads // n_kv
        g = w.reshape(n_kv, q_per + 2, head_dim, *rest)
        q = g[:, :q_per].reshape(n_heads * head_dim, *rest)
        k = g[:, -2].reshape(n_kv * head_dim, *rest)
        v = g[:, -1].reshape(n_kv * head_dim, *rest)
        return q, k, v
    if multi_query:
        g = w.reshape(n_heads + 2, head_dim, *rest)
        q = g[:n_heads].reshape(n_heads * head_dim, *rest)
        k = g[n_heads].reshape(head_dim, *rest)
        v = g[n_heads + 1].reshape(head_dim, *rest)
        return q, k, v
    return split_interleaved(w, n_heads, head_dim)
