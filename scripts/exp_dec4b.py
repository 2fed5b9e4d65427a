"""Round-4 decode GEMV lab: close the 480 → 819 GB/s gap.

Hypothesis under test: the grouped-partial kernel's f32 MXU dots (f32
matmul runs at a fraction of bf16 rate) — not the VPU scale-multiply —
are the limiter. Variants at M=8 (batch-1 decode tile), K=N=4096, g=32:

  conv_dot      bf16 whole-K dot, no scales          [bf16 MXU ceiling]
  conv_f32      f32 whole-K dot, no scales           [f32 MXU ceiling]
  unroll1       per-group f32 dot + scaled partial   [current production]
  unroll1_n4    same, 4 interleaved accumulators
  unroll1_bf16  per-group bf16 dot + f32-scaled partial
  full_bf16     bf16 scale-the-weights, one whole-K dot
  full_f32cast  f32 convert * f32 scales -> bf16 cast, one whole-K dot
  grouped_bf16  batched dot_general [Gt,tm,g]x[Gt,g,tn] bf16 + scale-sum
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_tpu.core import PRESETS, quantize

M = 8
K = int(os.environ.get("K", "4096"))
N = int(os.environ.get("N", "4096"))
TM = int(os.environ.get("TM", "8"))
TN = int(os.environ.get("TN", "2048"))
G = 32


def mk_kernel(mode, tn, g=G):
    Gt = K // g

    def kernel(x_ref, w_ref, s_ref, out_ref):
        if mode == "conv_dot":
            w = w_ref[...].astype(jnp.bfloat16)
            out_ref[...] = jnp.dot(x_ref[...], w,
                                   preferred_element_type=jnp.float32
                                   ).astype(out_ref.dtype)
            return
        if mode == "conv_f32":
            w = w_ref[...].astype(jnp.float32)
            out_ref[...] = jnp.dot(x_ref[...].astype(jnp.float32), w,
                                   preferred_element_type=jnp.float32
                                   ).astype(out_ref.dtype)
            return
        if mode == "full_bf16":
            w = w_ref[...].astype(jnp.bfloat16)
            st = s_ref[...].astype(jnp.bfloat16)
            wg = (w.reshape(Gt, g, tn) * st[:, None, :]).reshape(K, tn)
            out_ref[...] = jnp.dot(x_ref[...], wg,
                                   preferred_element_type=jnp.float32
                                   ).astype(out_ref.dtype)
            return
        if mode == "full_f32cast":
            wf = w_ref[...].astype(jnp.float32)
            st = s_ref[...].astype(jnp.float32)
            wg = (wf.reshape(Gt, g, tn) * st[:, None, :]) \
                .reshape(K, tn).astype(jnp.bfloat16)
            out_ref[...] = jnp.dot(x_ref[...], wg,
                                   preferred_element_type=jnp.float32
                                   ).astype(out_ref.dtype)
            return
        if mode == "grouped_bf16":
            w = w_ref[...].astype(jnp.bfloat16)
            st = s_ref[...].astype(jnp.float32)
            xg = x_ref[...].reshape(-1, Gt, g).swapaxes(0, 1)
            part = jax.lax.dot_general(
                xg, w.reshape(Gt, g, tn),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            out_ref[...] = jnp.sum(part * st[:, None, :], axis=0
                                   ).astype(out_ref.dtype)
            return
        if mode.startswith("win8"):
            # M=1 specialization: pack 8 GROUPS into the 8 sublanes.
            # x8[r, :] = x row 0 masked to window r of a 256-row chunk;
            # P8 = x8 @ Wchunk gives the 8 group partials as ROWS, so the
            # per-group scale costs one [8, tn] FMA per EIGHT groups
            # (8x less VPU than scaling [8, tn] per group) and the dots
            # are 256 deep (MXU-efficient).
            bf = mode.endswith("bf16")
            dt_ = jnp.bfloat16 if bf else jnp.float32
            wf = w_ref[...].astype(dt_)
            st = s_ref[...].astype(jnp.float32)
            x0 = x_ref[0:1, :].astype(dt_)
            C = K // 256
            rowmask = (jax.lax.broadcasted_iota(jnp.int32, (8, 256), 1)
                       // g == jax.lax.broadcasted_iota(
                           jnp.int32, (8, 256), 0))
            accs = [jnp.zeros((8, tn), jnp.float32) for _ in range(2)]
            for c in range(C):
                xc = jnp.broadcast_to(x0[:, 256 * c:256 * (c + 1)],
                                      (8, 256))
                x8 = jnp.where(rowmask, xc, dt_(0))
                P8 = jnp.dot(x8, wf[256 * c:256 * (c + 1), :],
                             preferred_element_type=jnp.float32)
                accs[c % 2] = accs[c % 2] + P8 * st[8 * c:8 * (c + 1), :]
            total = jnp.sum(accs[0] + accs[1], axis=0, keepdims=True)
            out_ref[...] = jnp.broadcast_to(total, (TM, tn)).astype(
                out_ref.dtype)
            return
        # unroll1 family
        bf = mode.endswith("bf16")
        nacc = 4 if mode == "unroll1_n4" else 2
        if bf:
            w = w_ref[...].astype(jnp.bfloat16)
            xv = x_ref[...]
        else:
            w = w_ref[...].astype(jnp.float32)
            xv = x_ref[...].astype(jnp.float32)
        st = s_ref[...].astype(jnp.float32)
        accs = [jnp.zeros((TM, tn), jnp.float32) for _ in range(nacc)]
        for gi in range(Gt):
            part = jnp.dot(xv[:, gi * g:(gi + 1) * g],
                           w[gi * g:(gi + 1) * g, :],
                           preferred_element_type=jnp.float32)
            accs[gi % nacc] = accs[gi % nacc] + part * st[gi].reshape(1, tn)
        acc = accs[0]
        for a in accs[1:]:
            acc = acc + a
        out_ref[...] = acc.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "tn", "iters"))
def run_variant(x, codes_u8, scales, mode, tn, iters):
    from neural_tpu.core.qtensor import unpack_codes
    cu = unpack_codes((codes_u8,), 4, G) - 8
    w4 = cu.astype(jnp.int4)

    kern = mk_kernel(mode, tn)
    grid = (M // TM, N // tn)

    def one(x):
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=[
                pl.BlockSpec((TM, K), lambda i, j: (i, 0)),
                pl.BlockSpec((K, tn), lambda i, j: (0, j)),
                pl.BlockSpec((K // G, tn), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((TM, tn), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
        )(x, w4, scales)

    def body(i, x):
        out = one(x)
        c = min(K, N)
        return x.at[:, :c].add(out[:, :c].astype(x.dtype) * jnp.bfloat16(1e-8))

    x = jax.lax.fori_loop(0, iters, body, x)
    return jnp.float32(x[0, 0])


def slope(fn, lo=16, hi=2016, reps=5):
    def t(n):
        best = 1e9
        for _ in range(reps):
            t0 = time.time(); float(fn(n)); best = min(best, time.time() - t0)
        return best
    float(fn(lo)); float(fn(hi))
    return (t(hi) - t(lo)) / (hi - lo)


def main():
    print("backend:", jax.default_backend(), "TM:", TM, "TN:", TN,
          flush=True)
    w = np.random.RandomState(0).randn(K, N).astype(np.float32) * 0.02
    qt = quantize(jnp.asarray(w), PRESETS["q4_0"])
    codes_u8, scales = qt.planes[0], qt.scales.astype(jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
    wbytes = K * N // 2
    modes = os.environ.get(
        "MODES", "conv_dot,conv_f32,unroll1,unroll1_n4,unroll1_bf16,"
                 "full_bf16,full_f32cast,grouped_bf16").split(",")
    for mode in modes:
        try:
            dt = slope(lambda n: run_variant(x, codes_u8, scales, mode,
                                             TN, n))
            print(f"{mode:13s} tn={TN}: {dt*1e6:8.2f} us  "
                  f"{wbytes/dt/1e9:6.0f} GB/s", flush=True)
        except Exception as e:
            print(f"{mode:13s} tn={TN}: FAIL "
                  f"{str(e).splitlines()[0][:90]}", flush=True)


if __name__ == "__main__":
    main()
