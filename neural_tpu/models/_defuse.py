"""Helpers to split fused HF QKV tensors into separate q/k/v.

The reference keeps QKV fused and runs a fused 3-GEMM
(neural_speed/core/layers/ip_fusion_qkv.cpp); on TPU we keep separate
[K, N] tensors (clean head-dim TP sharding; XLA fuses the three matmuls'
HBM reads anyway), so each family's fused layout is untangled once at
conversion time.

All inputs here are HF-layout [out_features, in_features] numpy arrays.
"""
from __future__ import annotations

import numpy as np


def split_interleaved(w, n_heads: int, head_dim: int):
    """[H*3*Dh, D] with per-head (q,k,v) interleave → 3x [H*Dh, D].
    Layout used by GPT-NeoX and Bloom."""
    D = w.shape[-1]
    w4 = w.reshape(n_heads, 3, head_dim, *w.shape[1:])
    return (w4[:, 0].reshape(n_heads * head_dim, *w.shape[1:]),
            w4[:, 1].reshape(n_heads * head_dim, *w.shape[1:]),
            w4[:, 2].reshape(n_heads * head_dim, *w.shape[1:]))


def split_concat(w, q_dim: int, kv_dim: int):
    """[q+kv+kv, D] straight concatenation → q, k, v. Layout used by MPT,
    Phi-3 qkv_proj, GPT-BigCode c_attn, Baichuan W_pack, ChatGLM."""
    return w[:q_dim], w[q_dim:q_dim + kv_dim], w[q_dim + kv_dim:]


def split_falcon(w, n_heads: int, n_kv: int, head_dim: int,
                 new_arch: bool, multi_query: bool):
    """Falcon query_key_value layouts (reference analog:
    convert_falcon.py): grouped [Hkv, q_per+2, Dh, D] for the new decoder
    architecture, [H+2, Dh, D] for classic multi-query, per-head
    interleave otherwise."""
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
