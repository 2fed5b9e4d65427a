"""Decode GEMV kernel lab: find the speed-of-light int4 dequant-matmul.

Variants (all M=16, K=4096, N=4096 llama-ish):
  dma       : int4 block -> convert -> row-sum only (read ceiling, no dot)
  conv_dot  : int4 -> bf16 -> dot (no scales)           [upper bound w/ MXU]
  full      : current native kernel (convert + group scale + dot)
  grouped   : per-group unscaled dot, scale applied to [G,tm,tn] partials
  u8        : current packed-u8 shift/mask kernel
Effective bandwidth = quantized weight bytes / time.
"""
import functools
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_tpu.core import PRESETS, quantize
from neural_tpu.core.qtensor import to_native
from neural_tpu.ops.qmatmul import qmatmul

M, K, N = 16, 4096, 4096
TM = int(__import__('os').environ.get('TM', '16'))
G = 32  # group size


def mk_kernel(mode, tk, tn, g=G):
    def kernel(x_ref, w_ref, s_ref, out_ref, acc_ref):
        @pl.when(pl.program_id(2) == 0)
        def _z():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        if mode == "dma":
            w = w_ref[...].astype(jnp.bfloat16)
            acc_ref[0:1, :] += jnp.sum(w, axis=0, keepdims=True)
        elif mode == "conv_dot":
            w = w_ref[...].astype(jnp.bfloat16)
            acc_ref[...] += jnp.dot(x_ref[...], w,
                                    preferred_element_type=jnp.float32)
        elif mode == "full":
            wf = w_ref[...].astype(jnp.float32)
            Gt = tk // g
            kidx = pl.program_id(2)
            st = s_ref[pl.ds(kidx * Gt, Gt), :].astype(jnp.float32)
            wg = wf.reshape(Gt, g, tn) * st[:, None, :]
            w = wg.reshape(tk, tn).astype(jnp.bfloat16)
            acc_ref[...] += jnp.dot(x_ref[...], w,
                                    preferred_element_type=jnp.float32)
        elif mode == "full_bf16":
            w = w_ref[...].astype(jnp.bfloat16)
            Gt = tk // g
            kidx = pl.program_id(2)
            st = s_ref[pl.ds(kidx * Gt, Gt), :].astype(jnp.bfloat16)
            wg = w.reshape(Gt, g, tn) * st[:, None, :]
            acc_ref[...] += jnp.dot(x_ref[...], wg.reshape(tk, tn),
                                    preferred_element_type=jnp.float32)
        elif mode == "full_repeat":
            w = w_ref[...].astype(jnp.bfloat16)
            Gt = tk // g
            kidx = pl.program_id(2)
            st = s_ref[pl.ds(kidx * Gt, Gt), :].astype(jnp.bfloat16)
            srep = pltpu.repeat(st, g, axis=0)  # [tk, tn]
            acc_ref[...] += jnp.dot(x_ref[...], w * srep,
                                    preferred_element_type=jnp.float32)
        elif mode == "full_f32dot":
            wf = w_ref[...].astype(jnp.float32)
            Gt = tk // g
            kidx = pl.program_id(2)
            st = s_ref[pl.ds(kidx * Gt, Gt), :].astype(jnp.float32)
            wg = (wf.reshape(Gt, g, tn) * st[:, None, :]).reshape(tk, tn)
            acc_ref[...] += jnp.dot(x_ref[...].astype(jnp.float32), wg,
                                    preferred_element_type=jnp.float32)
        elif mode == "sxdot":
            # scale applied to a per-group COPY of x via an on-the-fly
            # [tm*Gt, tk] expansion? (skipped - placeholder)
            w = w_ref[...].astype(jnp.bfloat16)
            acc_ref[...] += jnp.dot(x_ref[...], w,
                                    preferred_element_type=jnp.float32)
        elif mode == "conv_f32":
            # f32 convert + f32 dot, NO scales: isolates the scale-mul cost
            wf = w_ref[...].astype(jnp.float32)
            acc_ref[...] += jnp.dot(x_ref[...].astype(jnp.float32), wf,
                                    preferred_element_type=jnp.float32)
        elif mode.startswith("unroll"):
            # grouped-partial scaling: dot each chunk unscaled, apply the
            # per-group scale to the [tm, tn] partial (g/chunk fewer VPU
            # multiplies on the weight stream than "full")
            chunk = int(mode[6:])          # groups per dot
            Gt = tk // g
            kidx = pl.program_id(2)
            wf = w_ref[...].astype(jnp.float32)
            xf = x_ref[...].astype(jnp.float32)
            st = s_ref[pl.ds(kidx * Gt, Gt), :].astype(jnp.float32)
            acc = jnp.zeros(acc_ref.shape, jnp.float32)
            for c in range(Gt // chunk):
                lo = c * chunk * g
                if chunk == 1:
                    part = jnp.dot(xf[:, lo:lo + g], wf[lo:lo + g, :],
                                   preferred_element_type=jnp.float32)
                    acc = acc + part * st[c].reshape(1, tn)
                else:
                    wc = wf[lo:lo + chunk * g, :].reshape(chunk, g, tn)
                    wc = (wc * st[c * chunk:(c + 1) * chunk].reshape(
                        chunk, 1, tn)).reshape(chunk * g, tn)
                    acc = acc + jnp.dot(xf[:, lo:lo + chunk * g], wc,
                                        preferred_element_type=jnp.float32)
            acc_ref[...] += acc
        elif mode == "grouped":
            w = w_ref[...].astype(jnp.bfloat16)
            Gt = tk // g
            kidx = pl.program_id(2)
            st = s_ref[pl.ds(kidx * Gt, Gt), :].astype(jnp.float32)  # [Gt,tn]
            xg = x_ref[...].reshape(-1, Gt, g).swapaxes(0, 1)  # [Gt,tm,g]
            part = jax.lax.dot_general(
                xg, w.reshape(Gt, g, tn),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # [Gt, tm, tn]
            acc_ref[...] += jnp.sum(part * st[:, None, :], axis=0)
        return

    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "tk", "tn", "iters"))
def run_variant(x, codes_u8, scales, mode, tk, tn, iters):
    # codes arrive packed u8 [K//2, N]; convert to native int4 once in-jit
    from neural_tpu.core.qtensor import unpack_codes
    cu = unpack_codes((codes_u8,), 4, G) - 8
    w4 = cu.astype(jnp.int4)  # [K, N]

    kern = mk_kernel(mode, tk, tn)
    grid = (M // TM, N // tn, K // tk)

    def one(x):
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=[
                pl.BlockSpec((TM, tk), lambda i, j, k: (i, k)),
                pl.BlockSpec((tk, tn), lambda i, j, k: (k, j)),
                pl.BlockSpec((K // G, tn), lambda i, j, k: (0, j)),
            ],
            out_specs=pl.BlockSpec((TM, tn), lambda i, j, k: (i, j)),
            scratch_shapes=[pltpu.VMEM((TM, tn), jnp.float32)],
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(x, w4, scales)

    def body(i, x):
        out = one(x)
        return x + out[:, :K].astype(x.dtype) * jnp.bfloat16(1e-8)

    x = jax.lax.fori_loop(0, iters, body, x)
    return jnp.float32(x[0, 0])


@functools.partial(jax.jit, static_argnames=("iters", "native"))
def run_qmatmul(x, qt, iters, native):
    if native:
        qt = to_native(qt)

    def body(i, x):
        out = qmatmul(x, qt, out_dtype=jnp.bfloat16)
        return x + out[:, :K] * jnp.bfloat16(1e-8)

    x = jax.lax.fori_loop(0, iters, body, x)
    return jnp.float32(x[0, 0])


def slope(fn, lo=16, hi=4016, reps=5):
    def t(n):
        best = 1e9
        for _ in range(reps):
            t0 = time.time(); float(fn(n)); best = min(best, time.time() - t0)
        return best
    float(fn(lo)); float(fn(hi))
    return (t(hi) - t(lo)) / (hi - lo)


def main():
    print("backend:", jax.default_backend(), flush=True)
    w = np.random.RandomState(0).randn(K, N).astype(np.float32) * 0.02
    qt = quantize(jnp.asarray(w), PRESETS["q4_0"])
    codes_u8 = qt.planes[0]
    scales = qt.scales
    x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
    wbytes = K * N // 2

    if os.environ.get("BASELINES"):
        for native in (False, True):
            dt = slope(lambda n: run_qmatmul(x, qt, n, native))
            print(f"qmatmul native={native}: {dt*1e3:7.3f} ms  "
                  f"{wbytes/dt/1e9:6.0f} GB/s", flush=True)

    for mode in ("full_f32dot", "full", "conv_dot"):
        for tk, tn in ((4096, 1024), (4096, 2048)):
            try:
                dt = slope(lambda n: run_variant(x, codes_u8, scales, mode,
                                                 tk, tn, n))
                print(f"{mode:9s} tk={tk:4d} tn={tn:3d}: {dt*1e3:7.3f} ms  "
                      f"{wbytes/dt/1e9:6.0f} GB/s", flush=True)
            except Exception as e:
                print(f"{mode:9s} tk={tk:4d} tn={tn:3d}: FAIL "
                      f"{str(e).splitlines()[0][:90]}", flush=True)


if __name__ == "__main__":
    main()
