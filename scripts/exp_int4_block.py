"""Minimal repro: 3-D int4 block DMA vs 2-D (L folded into rows)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, K, N, TK, TN = 4, 512, 512, 256, 256


def kernel3d(lidx_ref, w_ref, out_ref):
    out_ref[...] = w_ref[0].astype(jnp.bfloat16)


def kernel2d(lidx_ref, w_ref, out_ref):
    out_ref[...] = w_ref[...].astype(jnp.bfloat16)


@jax.jit
def run3d(wi, l):
    w = wi.astype(jnp.int4)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(K // TK, N // TN),
        in_specs=[pl.BlockSpec((1, TK, TN),
                               lambda i, j, l_ref: (l_ref[0], i, j))],
        out_specs=pl.BlockSpec((TK, TN), lambda i, j, l_ref: (i, j)))
    return pl.pallas_call(kernel3d, grid_spec=gs,
                          out_shape=jax.ShapeDtypeStruct((K, N), jnp.bfloat16))(
        jnp.asarray(l, jnp.int32).reshape(1), w)


@jax.jit
def run2d(wi, l):
    w2 = wi.astype(jnp.int4).reshape(L * K, N)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(K // TK, N // TN),
        in_specs=[pl.BlockSpec((TK, TN),
                               lambda i, j, l_ref: (l_ref[0] * (K // TK) + i, j))],
        out_specs=pl.BlockSpec((TK, TN), lambda i, j, l_ref: (i, j)))
    return pl.pallas_call(kernel2d, grid_spec=gs,
                          out_shape=jax.ShapeDtypeStruct((K, N), jnp.bfloat16))(
        jnp.asarray(l, jnp.int32).reshape(1), w2)


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    wi = jax.random.randint(key, (L, K, N), -8, 8, jnp.int32)

    ref = np.asarray(wi, np.float32)
    for name, fn in (("3d", run3d), ("2d", run2d)):
        for l in (0, 2):
            out = np.asarray(fn(wi, l), np.float32)
            err = np.abs(out - ref[l]).max()
            print(f"{name} l={l}: max_abs_err={err} out[0,:4]={out[0,:4]}",
                  flush=True)

    # ---- now with the to_native-style producer (vmapped unpack chain)
    from neural_tpu.core import PRESETS, quantize
    from neural_tpu.core.qtensor import to_native, dequantize

    w = jax.random.normal(jax.random.PRNGKey(3), (L, K, N)) * 0.02

    @jax.jit
    def qstack(w):
        qts = [quantize(w[l], PRESETS["q4_0"]) for l in range(L)]
        return jax.tree.map(lambda *a: jnp.stack(a), *qts)

    qtstack = qstack(w)

    def run3d_nat(qtstack, l):
        nst = to_native(qtstack)
        codes = nst.planes[0]  # [L, K, N] int4
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(K // TK, N // TN),
            in_specs=[pl.BlockSpec((1, TK, TN),
                                   lambda i, j, l_ref: (l_ref[0], i, j))],
            out_specs=pl.BlockSpec((TK, TN), lambda i, j, l_ref: (i, j)))
        return pl.pallas_call(
            kernel3d, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((K, N), jnp.bfloat16))(
            jnp.asarray(l, jnp.int32).reshape(1), codes)

    run3d_nat_j = jax.jit(run3d_nat)

    @jax.jit
    def codes_ref(qtstack, l):
        nst = to_native(qtstack)
        return nst.planes[0][l].astype(jnp.bfloat16)

    for l in (0, 2):
        out = np.asarray(run3d_nat_j(qtstack, l), np.float32)
        refc = np.asarray(codes_ref(qtstack, l), np.float32)
        err = np.abs(out - refc).max()
        print(f"to_native 3d l={l}: max_abs_err={err} out[0,:4]={out[0,:4]} "
              f"ref[0,:4]={refc[0,:4]}", flush=True)


if __name__ == "__main__":
    main()


def kernel3d_reshape(lidx_ref, w_ref, out_ref):
    a = w_ref[...]
    out_ref[...] = a.reshape(a.shape[-2:]).astype(jnp.bfloat16)


@jax.jit
def run3d_reshape(wi, l):
    w = wi.astype(jnp.int4)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(K // TK, N // TN),
        in_specs=[pl.BlockSpec((1, TK, TN),
                               lambda i, j, l_ref: (l_ref[0], i, j))],
        out_specs=pl.BlockSpec((TK, TN), lambda i, j, l_ref: (i, j)))
    return pl.pallas_call(kernel3d_reshape, grid_spec=gs,
                          out_shape=jax.ShapeDtypeStruct((K, N), jnp.bfloat16))(
        jnp.asarray(l, jnp.int32).reshape(1), w)


def extra():
    wi = jax.random.randint(jax.random.PRNGKey(0), (L, K, N), -8, 8, jnp.int32)
    ref = np.asarray(wi, np.float32)
    for l in (0, 2):
        out = np.asarray(run3d_reshape(wi, l), np.float32)
        err = np.abs(out - ref[l]).max()
        print(f"3d-reshape l={l}: max_abs_err={err} out[0,:4]={out[0,:4]}",
              flush=True)


extra()
