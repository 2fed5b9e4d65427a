"""Normalization layers (RMSNorm / LayerNorm), functional.

Replaces ne_rms_norm / ne_norm (neural_speed/core/ne_layers.h:180-190).
Computed in f32 regardless of input dtype (matches reference behavior of
accumulating in fp32).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6,
             offset: float = 0.0) -> jnp.ndarray:
    """offset=1.0 gives Gemma-style (1 + w) scaling."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * (weight.astype(jnp.float32) + offset)).astype(x.dtype)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray,
               bias: Optional[jnp.ndarray], eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * (var + eps) ** -0.5
    y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)
