"""Experiment 2: w4a8 with REAL weight storage (int4), unpacked in-kernel.

exp_w4a8.py showed int8 MXU dot = 213 TF/s (g=512) / 183 TF/s (g=128) vs
131 TF/s bf16. But those fed pre-materialized int8 weights. The real path
stores int4; this measures the unpack cost inside the kernel:

  D. packed-uint8 planes -> shift/mask unpack -> int8 codes -> int8 dot (g=128)
  E. native jnp.int4 plane -> hardware convert -> int8 dot (g=128)
  F. same as D but g=512 (one scale per K-tile)

Run: python scripts/exp_w4a8b.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fetch(x):
    return float(jnp.asarray(x).astype(jnp.float32).reshape(-1)[0])


M, K, N = 2048, 4096, 4096
TM, TN, TK = 512, 256, 512
CHUNK = 128  # pack chunk = group size


def _sel_row(sa, kt):
    G = sa.shape[1]
    oh = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1) == kt
    return jnp.sum(jnp.where(oh, sa, 0.0), axis=1, keepdims=True)


def _sel_col(sw, kt):
    G = sw.shape[0]
    oh = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0) == kt
    return jnp.sum(jnp.where(oh, sw, 0.0), axis=0, keepdims=True)


def unpack4(packed, chunk):
    # uint8 [Kp, N] -> int32 [2*Kp, N]; chunk-local (qtensor.unpack_plane)
    per_byte = 2
    sub = chunk // per_byte
    Kp, N_ = packed.shape
    b = packed.astype(jnp.int32).reshape(Kp // sub, sub, N_)
    parts = [(b >> (4 * c)) & 15 for c in range(per_byte)]
    return jnp.stack(parts, axis=1).reshape(Kp * per_byte, N_)


def mk_kernel_packed(gd):
    def kernel(x_ref, w_ref, sa_ref, sw_ref, o_ref, acc):
        kt = pl.program_id(2)
        @pl.when(kt == 0)
        def _z():
            acc[...] = jnp.zeros_like(acc)
        codes = unpack4(w_ref[...], CHUNK)  # int32 [TK, TN]
        w8 = (codes - 8).astype(jnp.int8)
        x = x_ref[...]
        for j in range(TK // gd):
            d = jax.lax.dot_general(x[:, j * gd:(j + 1) * gd],
                                    w8[j * gd:(j + 1) * gd, :],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            g = kt * (TK // gd) + j
            sa = _sel_row(sa_ref[...].astype(jnp.float32), g)
            sw = _sel_col(sw_ref[...].astype(jnp.float32), g)
            acc[...] += d.astype(jnp.float32) * (sa * sw)
        @pl.when(kt == pl.num_programs(2) - 1)
        def _s():
            o_ref[...] = acc[...].astype(o_ref.dtype)
    return kernel


def kernel_native4(x_ref, w_ref, sa_ref, sw_ref, o_ref, acc):
    kt = pl.program_id(2)
    @pl.when(kt == 0)
    def _z():
        acc[...] = jnp.zeros_like(acc)
    w8 = w_ref[...].astype(jnp.int8)
    x = x_ref[...]
    gd = 128
    for j in range(TK // gd):
        d = jax.lax.dot_general(x[:, j * gd:(j + 1) * gd],
                                w8[j * gd:(j + 1) * gd, :],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        g = kt * (TK // gd) + j
        sa = _sel_row(sa_ref[...].astype(jnp.float32), g)
        sw = _sel_col(sw_ref[...].astype(jnp.float32), g)
        acc[...] += d.astype(jnp.float32) * (sa * sw)
    @pl.when(kt == pl.num_programs(2) - 1)
    def _s():
        o_ref[...] = acc[...].astype(o_ref.dtype)


def run(name, kernel, operands, in_specs, n=24):
    grid = (M // TM, N // TN, K // TK)
    f = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")))

    @functools.partial(jax.jit, static_argnames="n")
    def chain(x0, n):
        def body(i, acc):
            o = f(*([acc] + operands[1:]))
            return (o * 1e-6 + x0).astype(x0.dtype)
        return jax.lax.fori_loop(0, n, body, x0)[0, 0]

    def timed(n):
        fetch(chain(operands[0], n))
        best = 1e9
        for _ in range(3):
            t0 = time.time(); fetch(chain(operands[0], n))
            best = min(best, time.time() - t0)
        return best
    t1, t2 = timed(4), timed(4 + n)
    per = (t2 - t1) / n
    tf = 2 * M * N * K / per / 1e12
    print(f"{name}: {per*1e6:.0f} us  {tf:.0f} TFLOP/s")
    return tf


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    codes_np = rng.integers(0, 16, (K, N)).astype(np.uint8)
    # chunk-local pack (matches qtensor.pack_plane, chunk=CHUNK)
    v = codes_np.reshape(K // CHUNK, 2, CHUNK // 2, N)
    wp = jnp.asarray((v[:, 0] | (v[:, 1] << 4)).reshape(K // 2, N))

    sa_g = jnp.asarray(rng.uniform(0.01, 0.02, (M, K // 128)), jnp.float32)
    sw_g = jnp.asarray(rng.uniform(0.01, 0.02, (K // 128, N)), jnp.float32)
    sa_t = jnp.asarray(rng.uniform(0.01, 0.02, (M, K // TK)), jnp.float32)
    sw_t = jnp.asarray(rng.uniform(0.01, 0.02, (K // TK, N)), jnp.float32)

    xspec = pl.BlockSpec((TM, TK), lambda i, j, k: (i, k))
    wpspec = pl.BlockSpec((TK // 2, TN), lambda i, j, k: (k, j))

    run("D packed g=128", mk_kernel_packed(128), [x8, wp, sa_g, sw_g],
        [xspec, wpspec,
         pl.BlockSpec((TM, K // 128), lambda i, j, k: (i, 0)),
         pl.BlockSpec((K // 128, TN), lambda i, j, k: (0, j))])
    run("F packed g=512", mk_kernel_packed(512), [x8, wp, sa_t, sw_t],
        [xspec, wpspec,
         pl.BlockSpec((TM, K // TK), lambda i, j, k: (i, 0)),
         pl.BlockSpec((K // TK, TN), lambda i, j, k: (0, j))])

    w4 = jnp.asarray(rng.integers(-8, 8, (K, N)), jnp.int4)
    w4spec = pl.BlockSpec((TK, TN), lambda i, j, k: (k, j))
    run("E native4 g=128", kernel_native4, [x8, w4, sa_g, sw_g],
        [xspec, w4spec,
         pl.BlockSpec((TM, K // 128), lambda i, j, k: (i, 0)),
         pl.BlockSpec((K // 128, TN), lambda i, j, k: (0, j))])
