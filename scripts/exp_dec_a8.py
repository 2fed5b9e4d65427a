"""Experiment: int8-compute decode GEMV vs f32-dequant decode kernel.

Current decode kernel (_qmm4_kernel): int4->f32 convert + per-group f32
scale multiply on the [K, tn] weight tile, f32 MXU dot — 660 GB/s on v5e
(unscaled-convert roofline: ~900 GB/s; the scale multiply costs ~25%).

Idea: dot the RAW int4 codes (cast to int8, no scale touch on the big
tile) against per-group int8 activations, then rescale the tiny [M, tn]
int32 partials: out = sum_g d_g * (sa_g (x) sw_g). The group loop uses
STATIC slices (full-K stripe in VMEM, no grid over K).

Variants:
  A. current f32-dequant kernel (baseline)
  B. a8 GEMV, per-group sub-dots

MEASURED CONCLUSION (v5e): at gd=32 (required for q4_0 exactness) the a8
GEMV shows NO gain over the f32-dequant kernel (570-644 vs 647 GB/s) —
128 K=32 sub-dots eat the scale-multiply savings. gd=128 numbers from
this harness (1.7 TB/s) are measurement artifacts: identical-input chain
calls let XLA pin the (VMEM-sized) weight buffer; a cold-read variant
over 8 distinct stacks and a pure-read calibration kernel both cap far
lower. Decision: keep the f32-dequant decode kernel; a8 stays a
prefill-only path. Run: python scripts/exp_dec_a8.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from neural_tpu.core import PRESETS, quantize
from neural_tpu.core.qtensor import to_native, matmul_ref


def fetch(x):
    return float(jnp.asarray(x).astype(jnp.float32).reshape(-1)[0])


M, K, N = 16, 4096, 16384
G32 = 32  # group size
TN = 2048


def kernel_f32(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[...].astype(jnp.float32)
    s = s_ref[...].astype(jnp.float32)
    Kk, tn = w.shape
    Gn = s.shape[0]
    wg = (w.reshape(Gn, G32, tn) * s[:, None, :]).reshape(Kk, tn)
    o_ref[...] = jnp.dot(x_ref[...].astype(jnp.float32), wg,
                         preferred_element_type=jnp.float32
                         ).astype(o_ref.dtype)


def mk_kernel_a8(gd):
    def kernel(x_ref, w_ref, s_ref, sa_ref, o_ref):
        w8 = w_ref[...].astype(jnp.int8)         # [K, tn] raw int4 codes
        sw = s_ref[...].astype(jnp.float32)      # [G, tn] per-32 scales
        sa = sa_ref[...].astype(jnp.float32)     # [M, K/gd]
        x = x_ref[...]                           # [M, K] int8
        Kk, tn = w8.shape
        acc = jnp.zeros((x.shape[0], tn), jnp.float32)
        r = gd // G32  # weight-scale groups per dot group (gd >= 32)
        for j in range(Kk // gd):
            d = jax.lax.dot_general(x[:, j * gd:(j + 1) * gd],
                                    w8[j * gd:(j + 1) * gd, :],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            # per-32 weight scales within the dot group must be uniform for
            # exactness; at gd=32 r=1 this is exact.
            acc += d.astype(jnp.float32) * (sa[:, j:j + 1] * sw[j * r, :])
        o_ref[...] = acc.astype(o_ref.dtype)
    return kernel


def run(name, f, operands, qt, n=768):
    """operands with None placeholders for (codes, scales), filled from
    to_native(qt) INSIDE the jit (int4 can't cross jit boundaries)."""
    arrs = [o for o in operands if not isinstance(o, str)]
    kinds = [o if isinstance(o, str) else None for o in operands]

    @functools.partial(jax.jit, static_argnames="n")
    def chain(arrs, qt, n):
        nt = to_native(qt)
        it = iter(arrs)
        ops = [nt.planes[0] if k == "codes" else
               nt.scales if k == "scales" else next(it) for k in kinds]
        x0 = ops[0]

        def body(i, xcur):
            o = f(*([xcur] + ops[1:]))
            # data dependence: next x derives from this output (no hoist)
            bump = (o[0, :1].astype(jnp.float32) * 1e-30).astype(x0.dtype)
            return x0 + bump[None, :]
        return jax.lax.fori_loop(0, n, body, x0)[0, 0]

    def timed(n):
        fetch(chain(arrs, qt, n))
        best = 1e9
        for _ in range(3):
            t0 = time.time(); fetch(chain(arrs, qt, n))
            best = min(best, time.time() - t0)
        return best
    t1, t2 = timed(64), timed(64 + n)
    per = (t2 - t1) / n
    gbs = (K * N / 2) / per / 1e9
    print(f"{name}: {per*1e6:.0f} us  {gbs:.0f} GB/s(codes)")


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.float32)
    qt = quantize(w, PRESETS["q4_0"])

    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    # per-32-group int8 activations
    xg = np.asarray(x, np.float32).reshape(M, K // G32, G32)
    sa32 = np.abs(xg).max(axis=2) / 127.0 + 1e-9
    x8_32 = jnp.asarray(np.round(xg / sa32[:, :, None]).reshape(M, K), jnp.int8)
    sa32 = jnp.asarray(sa32, jnp.float32)

    grid = (N // TN,)
    specs_f32 = [
        pl.BlockSpec((M, K), lambda j: (0, 0)),
        pl.BlockSpec((K, TN), lambda j: (0, j)),
        pl.BlockSpec((K // G32, TN), lambda j: (0, j)),
    ]
    fa = pl.pallas_call(
        kernel_f32, grid=grid, in_specs=specs_f32,
        out_specs=pl.BlockSpec((M, TN), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)))
    run("A f32-dequant   ", fa, [x, "codes", "scales"], qt)

    for gd in (32, 128):
        specs = [
            pl.BlockSpec((M, K), lambda j: (0, 0)),
            pl.BlockSpec((K, TN), lambda j: (0, j)),
            pl.BlockSpec((K // G32, TN), lambda j: (0, j)),
            pl.BlockSpec((M, K // gd), lambda j: (0, 0)),
        ]
        if gd == 32:
            x8, sa = x8_32, sa32
        else:
            xg2 = np.asarray(x, np.float32).reshape(M, K // gd, gd)
            sa = np.abs(xg2).max(axis=2) / 127.0 + 1e-9
            x8 = jnp.asarray(np.round(xg2 / sa[:, :, None]).reshape(M, K), jnp.int8)
            sa = jnp.asarray(sa, jnp.float32)
        fb = pl.pallas_call(
            mk_kernel_a8(gd), grid=grid, in_specs=specs,
            out_specs=pl.BlockSpec((M, TN), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)))
        run(f"B a8 gemv gd={gd:<4}", fb, [x8, "codes", "scales", sa], qt)

        @jax.jit
        def once(x8, qt, sa):
            nt = to_native(qt)
            return fb(x8, nt.planes[0], nt.scales, sa)

        out = np.asarray(once(x8, qt, sa), np.float32)
        ref = np.asarray(matmul_ref(x, qt, jnp.float32))
        err = np.abs(out - ref).max() / np.abs(ref).max()
        print(f"   relerr vs float oracle: {err:.4f}")
