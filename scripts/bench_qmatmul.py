"""Kernel-level qmatmul benchmark (analog of bestla/ut/bestla_benchmark.cpp).

Run on the real TPU (tunneled). block_until_ready does not block on the
tunneled backend, so: chain iterations inside one jit (output feeds next
input so XLA cannot hoist), fetch a scalar (forces completion), and take the
slope between two iteration counts to cancel the fixed dispatch overhead.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_qmatmul.py
"""
import functools
import time

import jax
import jax.numpy as jnp

from neural_tpu.core import PRESETS, quantize
from neural_tpu.ops import qmatmul


@functools.partial(jax.jit, static_argnames=("iters",))
def _chain(x, qt, iters):
    def body(i, x):
        out = qmatmul(x, qt, out_dtype=jnp.bfloat16)  # [M, N]
        return x + out[:, :1]  # fold back so the loop carries a dependency
    return jnp.float32(jax.lax.fori_loop(0, iters, body, x)[0, 0])


def timed_call(x, qt, iters, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        float(_chain(x, qt, iters))
        best = min(best, time.time() - t0)
    return best


def bench(qt, M, K, n_lo=2, n_hi=22):
    x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
    float(_chain(x, qt, n_lo)); float(_chain(x, qt, n_hi))  # warm both
    t_lo = timed_call(x, qt, n_lo)
    t_hi = timed_call(x, qt, n_hi)
    return (t_hi - t_lo) / (n_hi - n_lo)


def main():
    K, N = 4096, 4096
    w = jax.random.normal(jax.random.PRNGKey(0), (K, N)) * 0.02
    print(f"backend={jax.default_backend()} K={K} N={N}")
    for preset in ("q4_0", "q4_j_g128", "int8", "int3", "int2", "nf4", "fp8"):
        qt = quantize(w, PRESETS[preset])
        for M in (16, 256, 1024):
            dt = bench(qt, M, K)
            gflops = 2 * M * K * N / dt / 1e9
            gbs = qt.nbytes() / dt / 1e9
            print(f"{preset:10s} M={M:5d}: {dt*1e3:7.3f} ms "
                  f"{gflops:8.0f} GFLOP/s weightBW={gbs:6.0f} GB/s",
                  flush=True)


if __name__ == "__main__":
    main()
