"""Rotary position embeddings (all variants used by the model zoo).

Replaces the reference's RoPE op family (neural_speed/core/ne_layers.h:421-467
``ne_rope_*``: NeoX vs GPT-J interleaved modes, partial rotary dims, shift
mode for StreamingLLM, Phi-3 longrope) with functional jnp, jit-friendly.

Conventions: q/k are [..., T, H, Dh]; ``positions`` is [..., T] int32.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def rope_freqs(head_dim: int, rope_dim: Optional[int], theta: float,
               scaling: Optional[dict] = None,
               max_seq_len: Optional[int] = None) -> np.ndarray:
    """Per-pair inverse frequencies [rope_dim//2] (host-side constant).

    ``max_seq_len``: the context length the table must serve — consumed by
    the "dynamic" NTK kind (see below); ignored by the others.
    """
    d = rope_dim or head_dim
    inv = 1.0 / (theta ** (np.arange(0, d, 2, dtype=np.float64) / d))
    if scaling:
        kind = scaling.get("type", scaling.get("rope_type", "linear"))
        if kind == "linear":
            inv = inv / scaling["factor"]
        elif kind in ("longrope", "su"):
            # Phi-3 longrope: per-dim rescale factors (long context set).
            # reference: ne_longrope_inplace (ne_layers.h:460).
            factors = np.asarray(scaling["long_factor"], np.float64)
            inv = inv / factors
        elif kind == "yarn":
            # simplified yarn: interpolate low-freq dims by factor
            factor = scaling["factor"]
            orig = scaling.get("original_max_position_embeddings", 4096)
            low, high = scaling.get("beta_fast", 32), scaling.get("beta_slow", 1)
            dim_range = np.arange(0, d, 2, dtype=np.float64)
            wavelen = 2 * np.pi / inv
            ramp = np.clip((wavelen - orig / high) / (orig / low - orig / high), 0, 1)
            inv = inv / (factor * ramp + (1 - ramp))
        elif kind == "llama3":
            # Llama-3.1 frequency-band scaling (HF rope_type "llama3"):
            # long wavelengths divided by ``factor``, short kept, a smooth
            # band between low/high_freq_factor interpolating the two.
            factor = scaling["factor"]
            orig = scaling.get("original_max_position_embeddings", 8192)
            lo_f = scaling.get("low_freq_factor", 1.0)
            hi_f = scaling.get("high_freq_factor", 4.0)
            wavelen = 2 * np.pi / inv
            smooth = np.clip((orig / wavelen - lo_f) / (hi_f - lo_f), 0, 1)
            inv = np.where(wavelen < orig / hi_f, inv,         # short: keep
                           (1 - smooth) * inv / factor + smooth * inv)
        elif kind == "dynamic":
            # NTK "dynamic" scaling, evaluated STATICALLY for the table's
            # serving length: true per-step recompute would change
            # already-cached keys' phases (and retrace under jit), so like
            # most serving stacks we scale theta once for the worst case.
            # The TRAINED window is max_position_embeddings (HF semantics:
            # dynamic NTK activates only when the sequence EXCEEDS it), so
            # with cfg.max_seq_len == the checkpoint's trained length this
            # is a no-op; it scales only when the caller raises max_seq_len
            # past the trained window (or the dict carries an explicit
            # original_max_position_embeddings).
            orig = (scaling.get("original_max_position_embeddings")
                    or scaling.get("max_position_embeddings")
                    or max_seq_len or 4096)
            target = max(max_seq_len or orig, orig)
            factor = scaling.get("factor", 1.0)
            alpha = (factor * target / orig) - (factor - 1)
            if target > orig and alpha > 1.0:
                theta_d = theta * alpha ** (d / max(d - 2, 1))
                inv = 1.0 / (theta_d **
                             (np.arange(0, d, 2, dtype=np.float64) / d))
        else:
            raise ValueError(f"unknown rope scaling {kind}")
    return inv.astype(np.float32)


def rope_cos_sin(positions: jnp.ndarray, inv_freqs: jnp.ndarray,
                 attn_factor: float = 1.0):
    """cos/sin tables [..., T, rope_dim//2] for given positions."""
    ang = positions[..., None].astype(jnp.float32) * inv_freqs  # [..., T, d/2]
    return jnp.cos(ang) * attn_factor, jnp.sin(ang) * attn_factor


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
               style: str = "neox", rope_dim: Optional[int] = None) -> jnp.ndarray:
    """Rotate [..., T, H, Dh]. ``style``:

    - "neox": rotate halves — pair (i, i + d/2) (llama & most models)
    - "gptj": interleaved — pair (2i, 2i+1) (GPT-J, shift-RoPE compatible)
    """
    Dh = x.shape[-1]
    d = rope_dim or Dh
    xr, x_pass = x[..., :d], x[..., d:]
    c = cos[..., None, :]  # broadcast over heads: [..., T, 1, d/2]
    s = sin[..., None, :]
    if style == "neox":
        x1, x2 = xr[..., : d // 2], xr[..., d // 2:]
        out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    elif style == "gptj":
        x1, x2 = xr[..., 0::2], xr[..., 1::2]
        r1, r2 = x1 * c - x2 * s, x2 * c + x1 * s
        out = jnp.stack([r1, r2], axis=-1).reshape(xr.shape)
    else:
        raise ValueError(style)
    if d != Dh:
        out = jnp.concatenate([out, x_pass], axis=-1)
    return out.astype(x.dtype)


def apply_rope_glm1(x: jnp.ndarray, positions: jnp.ndarray,
                    prompt_len: jnp.ndarray,
                    inv_freqs: jnp.ndarray) -> jnp.ndarray:
    """ChatGLM v1's 2-D GLM RoPE (reference: ne_layers.c:9324 ``is_glm``).

    x: [B, T, H, Dh]; positions [B, T] absolute; prompt_len [B] (the
    per-request prompt size P). Two independent NeoX-style rotations on
    the two halves of the head:
    - dims [0, Dh/2): position id  = min(p, P-2)   (clamped at the [gMASK])
    - dims [Dh/2, Dh): block id    = max(p-(P-2), 0)  (generation counter)
    ``inv_freqs`` are for n_dims = Dh/2 (rope_freqs(head_dim, Dh//2, ...)).
    """
    Dh = x.shape[-1]
    d = Dh // 2
    anchor = (prompt_len - 2)[:, None]                       # [B, 1]
    pos = jnp.minimum(jnp.maximum(positions, 0), jnp.maximum(anchor, 0))
    blk = jnp.maximum(positions - anchor, 0)
    c1, s1 = rope_cos_sin(pos, inv_freqs)
    c2, s2 = rope_cos_sin(blk, inv_freqs)
    x1 = apply_rope(x[..., :d], c1, s1, "neox", d)
    x2 = apply_rope(x[..., d:], c2, s2, "neox", d)
    return jnp.concatenate([x1, x2], axis=-1).astype(x.dtype)


def alibi_slopes(n_heads: int) -> np.ndarray:
    """ALiBi per-head slopes (MPT/Bloom/Baichuan-13B).

    reference: ne_alibi (ne_layers.h) / mpt graph; standard geometric series.
    """
    def pow2slopes(n):
        start = 2.0 ** (-(2.0 ** -(np.log2(n) - 3)))
        return start * (start ** np.arange(n))
    n = 2 ** int(np.floor(np.log2(n_heads)))
    slopes = pow2slopes(n)
    if n < n_heads:
        extra = pow2slopes(2 * n)[0::2][: n_heads - n]
        slopes = np.concatenate([slopes, extra])
    return slopes.astype(np.float32)
