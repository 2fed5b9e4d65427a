"""Round-4 act-order gather re-probe (2026-08-21): can Mosaic compile an
in-kernel activation gather at decode shapes ([16, 4096] bf16, lane-dim
permutation)?

RESULT (v5e, tunneled toolchain): NO —
  - bf16 data + i32 indices: "Not implemented: Gather indices and result
    have different bitwidths" (tpu.dynamic_gather)
  - f32 data + i32 indices: Mosaic compile failure
  - bf16 data + i16 indices: Mosaic compile failure
The in-graph bf16 one-hot matmul stays the act-order decode path
(ops/qmatmul.py gathered()); re-probe on the next toolchain bump.
Reference analog: bestla_prologue_a.h:299 ShuffleActivationKBlock.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl

M, K = 16, 4096
x = jnp.asarray(np.random.randn(M, K), jnp.bfloat16)
permn = np.random.permutation(K)


def try_variant(name, kern, pdt):
    perm = jnp.asarray(permn[None, :], pdt)
    try:
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, K), jnp.bfloat16),
            in_specs=[pl.BlockSpec((M, K), lambda: (0, 0)),
                      pl.BlockSpec((1, K), lambda: (0, 0))],
            out_specs=pl.BlockSpec((M, K), lambda: (0, 0)),
        )
        t0 = time.time()
        y = jax.block_until_ready(f(x, perm))
        dt = time.time() - t0
        ref = np.asarray(x, np.float32)[:, permn]
        ok = np.allclose(np.asarray(y, np.float32), ref)
        print(f"{name}: ran {dt:.1f}s correct={ok}")
        return ok
    except Exception as e:
        print(f"{name}: FAIL {str(e).splitlines()[0][:120]}")
        return False


def k_f32(x_ref, p_ref, o_ref):
    xf = x_ref[...].astype(jnp.float32)
    p = jnp.broadcast_to(p_ref[...], xf.shape)
    o_ref[...] = jnp.take_along_axis(xf, p, axis=1).astype(jnp.bfloat16)


def k_i16(x_ref, p_ref, o_ref):
    x = x_ref[...]
    p = jnp.broadcast_to(p_ref[...], x.shape)
    o_ref[...] = jnp.take_along_axis(x, p, axis=1)


try_variant("f32-gather-i32idx", k_f32, jnp.int32)
try_variant("bf16-gather-i16idx", k_i16, jnp.int16)
