"""Automatic weight-residency policy: packed vs native-at-rest.

The decode path has two at-rest weight formats (see
``runtime.generate.params_to_native``):

- **packed** (bit-plane uint8) + an IN-JIT conversion to native int4 codes
  per decode executable. Fastest steady-state slope (the measured-best
  per-layer whole-buffer layout, 5.3-5.5 ms/tok on a 7B), but while a
  decode jit is live its converted copy DOUBLES the model's HBM footprint.
- **native-at-rest** (uint8 native-pack / int8 code planes), converted once
  at load. Single-copy residency, conversion-free executables, ~15% slower
  slope (6.1-6.7 ms/tok on a 7B batch-1).

Which one fits is a function of (model bytes, KV bytes, batch): a 7B with
batch-8 KV at S=2048 plus the in-jit copy exceeds a 16 GB v5e (the round-2
and round-3 bench OOMs, BENCH_r03.json leg_errors), while batch-1 has ~5 GB
of headroom and should keep the fast packed path. This module makes that
choice automatic per requested decode shape instead of the former
``NTPU_NATIVE_AT_REST`` env opt-in (reference analog: the packed-KV +
fused-attention serving configuration is likewise chosen by the runtime,
neural_speed/core/layers/mha_dense.h:125-142, not by the user).

Env overrides: ``NTPU_NATIVE_AT_REST=1`` forces native-at-rest,
``=0`` forces packed; ``NTPU_HBM_BYTES`` overrides the device budget.
"""
from __future__ import annotations

import os
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.qtensor import QTensor, is_native
from ..models.config import ModelConfig

# Transient headroom the estimate reserves on top of the steady-state
# buffers: activations/logits, per-layer int32 conversion temps (bounded
# ~360 MB by prepare_params' sequencing barriers), compiled executables'
# scratch, and the tunneled allocator's slack. Deliberately conservative —
# the packed path is only ~15% faster, while an OOM forfeits the whole run
# (round-3's batch-8 leg OOMed with an estimated steady state of ~12.9 GB
# on a nominal 16 GB chip, so real transients+reservations exceed 3 GB).
TRANSIENT_BYTES = 3 << 30

from .generate import IN_JIT_SKIP_BYTES as _IN_JIT_SKIP_BYTES, _qleaves


def tree_device_bytes(params) -> int:
    """Steady-state bytes of the whole param tree as it sits in HBM."""
    tot = 0
    for leaf in jax.tree.leaves(
            params, is_leaf=lambda x: isinstance(x, QTensor)):
        if isinstance(leaf, QTensor):
            tot += leaf.nbytes()
        elif hasattr(leaf, "dtype"):
            tot += int(np.prod(leaf.shape)) * jnp.dtype(leaf.dtype).itemsize
    return tot


def _conv_copy_bytes_one(qt: QTensor) -> int:
    """Extra HBM a live decode executable holds for one packed QTensor:
    the in-jit native conversion's output (prepare_params path)."""
    if is_native(qt) or qt.cfg.kind != "int" or qt.cfg.bits < 2:
        return 0
    elems = int(np.prod(qt.planes[0].shape[:-2])) * qt.K * qt.N
    if qt.K * qt.N * 4 > _IN_JIT_SKIP_BYTES:
        return 0  # stays packed in-jit (streams through the packed kernel)
    if qt.cfg.bits == 2:
        code = elems // 4          # native-pack 2-bit bytes
    elif qt.cfg.bits <= 4:
        code = elems // 2          # int4 containers
    else:
        code = elems               # int8
    scale_elems = int(np.prod(qt.scales.shape))
    aux = scale_elems * 2                                 # bf16 scales
    if qt.zeros is not None:
        aux += scale_elems * 2                            # bf16 zeros
    return code + aux


def conv_copy_bytes(params) -> int:
    return sum(_conv_copy_bytes_one(q) for q in _qleaves(params))


def kv_cache_bytes(cfg: ModelConfig, batch: int, S: int, kv_dtype) -> int:
    """Bytes of one runtime.kvcache.init_cache allocation."""
    elems = cfg.n_layers * batch * cfg.n_kv_heads * S * cfg.head_dim
    if kv_dtype == "int8" or kv_dtype == jnp.int8:
        scales = cfg.n_layers * batch * cfg.n_kv_heads * S * 2
        return elems * 2 + scales * 2                     # k+v, bf16 scales
    return elems * jnp.dtype(kv_dtype).itemsize * 2


def device_hbm_budget() -> int:
    """Per-device HBM budget in bytes (env override, live memory stats, or
    the v5e default)."""
    env = os.environ.get("NTPU_HBM_BYTES")
    if env:
        return int(float(env))
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:
        pass
    # axon returns no memory_stats: assume a 16 GB-class chip (v5e/v5p
    # per-core) with the runtime's own reservation taken off the top
    return int(15e9)


def decode_peak_bytes(params, cfg: ModelConfig, batch: int, S: int,
                      kv_dtype) -> int:
    """Estimated peak HBM of the PACKED path at this decode shape."""
    return (tree_device_bytes(params) + conv_copy_bytes(params)
            + kv_cache_bytes(cfg, batch, S, kv_dtype) + TRANSIENT_BYTES)


def should_go_native(params, cfg: ModelConfig, batch: int, S: int,
                     kv_dtype) -> bool:
    env = os.environ.get("NTPU_NATIVE_AT_REST")
    if env == "1":
        return True
    if env == "0":
        return False
    return decode_peak_bytes(params, cfg, batch, S, kv_dtype) \
        > device_hbm_budget()


def _convert_int2(params, donate: bool):
    """At-rest native-pack conversion for int2 QTensors only (4 codes per
    byte, pltpu.bitcast hardware path)."""
    from .generate import _JIT_NPACK, _JIT_NPACK_KEEP

    fn = _JIT_NPACK if donate else _JIT_NPACK_KEEP

    def one(l):
        if isinstance(l, QTensor) and l.cfg.kind == "int" \
                and l.cfg.bits == 2 and not is_native(l):
            return fn(l)
        return l

    return jax.tree.map(one, params,
                        is_leaf=lambda x: isinstance(x, QTensor))


def ensure_decode_residency(params, cfg: ModelConfig, batch: int = 1,
                            S: Optional[int] = None,
                            kv_dtype=jnp.bfloat16, donate: bool = True):
    """Return params in the residency format that fits this decode shape.

    Packed params convert to native-at-rest iff the packed path's estimated
    peak exceeds the device budget; already-native (or fp) params pass
    through. With ``donate=True`` the packed buffers free as the conversion
    streams — the caller MUST rebind its reference to the return value.
    No-op off TPU.
    """
    if jax.default_backend() != "tpu":
        return params
    qts = _qleaves(params)
    if not qts:
        return params
    if any(q.cfg.kind == "int" and q.cfg.bits == 2 and not is_native(q)
           for q in qts):
        # int2 tensors ALWAYS convert to at-rest native-pack here,
        # independent of the packed-vs-native policy below: the packed
        # path's in-jit conversion feeds the kernel an XLA-produced uint8
        # buffer whose relayout erases the whole byte win (measured 7B
        # 8-layer: mix_i2_ffn in-jit −3.8 us/layer vs q4_j, at-rest
        # +21.5 us/layer). Conversion also HALVES their HBM footprint,
        # so it can only help the policy's budget.
        if donate:
            # same loud contract as the native-at-rest branch below: a
            # caller sharing the packed tree must hear that it is being
            # consumed (silent invalidation is undebuggable)
            print("[neural-tpu] residency: converting int2 weights to "
                  "at-rest native-pack with donation — the packed params "
                  "tree passed in is consumed (pass donate_params=False "
                  "to keep sharing it)", file=sys.stderr)
        params = _convert_int2(params, donate)
        qts = _qleaves(params)
    if all(is_native(q) for q in qts):
        return params
    S = S or cfg.max_seq_len
    if should_go_native(params, cfg, batch, S, kv_dtype):
        if os.environ.get("NEURAL_TPU_VERBOSE"):
            peak = decode_peak_bytes(params, cfg, batch, S, kv_dtype)
            print(f"[neural-tpu] residency: packed-path peak "
                  f"~{peak / 2**30:.1f} GiB > budget "
                  f"{device_hbm_budget() / 2**30:.1f} GiB at batch={batch} "
                  f"S={S} — converting weights to native-at-rest",
                  file=sys.stderr)
        if donate:
            # Donation invalidates the packed source tree the caller passed
            # in. Always say so (not just under VERBOSE): a caller sharing
            # one tree across schedulers/models must opt out, and a silent
            # invalidation is far harder to debug than this one line.
            print("[neural-tpu] residency: converting weights with "
                  "donation — the packed params tree passed in is consumed "
                  "(pass donate_params=False to keep sharing it)",
                  file=sys.stderr)
        from .generate import params_to_native
        params = params_to_native(params, donate=donate)
    return params
