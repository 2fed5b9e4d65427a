"""Experiment: is an int8-compute (w4a8) prefill matmul worth building?

Measures on the real chip:
  A. bf16 MXU dot (the current prefill compute path's core)
  B. int8 MXU dot -> int32, one f32 scale-multiply per K-tile (g == tk)
  C. int8 MXU dot with per-128 K-group scaling (4 sub-dots per 512 tile)

If B/C >> A (v5e int8 peak is 2x bf16), the w4a8 path (reference analog:
BesTLA CompInt8 + ActivationKBlockQuantize, bestla_prologue_a.h:105) pays
for prefill/TTFT. Run: python scripts/exp_w4a8.py
"""
import functools
import sys
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


def kernel_bf16(x_ref, w_ref, o_ref, acc):
    @pl.when(pl.program_id(2) == 0)
    def _z():
        acc[...] = jnp.zeros_like(acc)
    acc[...] += jnp.dot(x_ref[...], w_ref[...],
                        preferred_element_type=jnp.float32)
    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _s():
        o_ref[...] = acc[...].astype(o_ref.dtype)


def _sel_row(sa, kt):
    # sa [TM, G] -> column kt as [TM, 1] (one-hot mask; Mosaic has no
    # dynamic value slicing)
    G = sa.shape[1]
    oh = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1) == kt
    return jnp.sum(jnp.where(oh, sa, 0.0), axis=1, keepdims=True)


def _sel_col(sw, kt):
    G = sw.shape[0]
    oh = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0) == kt
    return jnp.sum(jnp.where(oh, sw, 0.0), axis=0, keepdims=True)


def kernel_i8_tile(x_ref, w_ref, sa_ref, sw_ref, o_ref, acc):
    # one scale per K-tile: acc += i32dot * (sa[:, kt] ⊗ sw[kt, :])
    kt = pl.program_id(2)
    @pl.when(kt == 0)
    def _z():
        acc[...] = jnp.zeros_like(acc)
    d = jax.lax.dot_general(x_ref[...], w_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    sa = _sel_row(sa_ref[...].astype(jnp.float32), kt)      # [TM, 1]
    sw = _sel_col(sw_ref[...].astype(jnp.float32), kt)      # [1, TN]
    acc[...] += d.astype(jnp.float32) * (sa * sw)
    @pl.when(kt == pl.num_programs(2) - 1)
    def _s():
        o_ref[...] = acc[...].astype(o_ref.dtype)


def kernel_i8_g128(x_ref, w_ref, sa_ref, sw_ref, o_ref, acc):
    # per-128 K-groups: 4 sub-dots per 512 tile
    kt = pl.program_id(2)
    @pl.when(kt == 0)
    def _z():
        acc[...] = jnp.zeros_like(acc)
    x = x_ref[...]
    w = w_ref[...]
    for j in range(TK // 128):
        d = jax.lax.dot_general(x[:, j * 128:(j + 1) * 128],
                                w[j * 128:(j + 1) * 128, :],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        g = kt * (TK // 128) + j
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


rng = np.random.default_rng(0)
xb = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
wb = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
x8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
w8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
sa_t = jnp.asarray(rng.uniform(0.01, 0.02, (M, K // TK)), jnp.float32)
sw_t = jnp.asarray(rng.uniform(0.01, 0.02, (K // TK, N)), jnp.float32)
sa_g = jnp.asarray(rng.uniform(0.01, 0.02, (M, K // 128)), jnp.float32)
sw_g = jnp.asarray(rng.uniform(0.01, 0.02, (K // 128, N)), jnp.float32)

xspec = pl.BlockSpec((TM, TK), lambda i, j, k: (i, k))
wspec = pl.BlockSpec((TK, TN), lambda i, j, k: (k, j))

run("A bf16      ", kernel_bf16, [xb, wb], [xspec, wspec])
run("B int8 g=512", kernel_i8_tile, [x8, w8, sa_t, sw_t],
    [xspec, wspec,
     pl.BlockSpec((TM, K // TK), lambda i, j, k: (i, 0)),
     pl.BlockSpec((K // TK, TN), lambda i, j, k: (0, j))])
run("C int8 g=128", kernel_i8_g128, [x8, w8, sa_g, sw_g],
    [xspec, wspec,
     pl.BlockSpec((TM, K // 128), lambda i, j, k: (i, 0)),
     pl.BlockSpec((K // 128, TN), lambda i, j, k: (0, j))])
