"""flash_prefill (blk_t, blk_s) sweep at 7B shapes, T=2048.

exp_prefill_glue: attention adds 59 ms to TTFT = 1.8 us/grid-step over
32x(8x4) steps/layer — per-step overhead, not MXU time. Fewer, bigger
tiles should amortize it.
"""
import functools
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from neural_tpu.ops.attention import flash_prefill

L, B, H, T, S, Dh = 32, 1, 32, 2048, 2048, 128


def fetch(x):
    return float(jnp.asarray(x).astype(jnp.float32).reshape(-1)[0])


@functools.partial(jax.jit, static_argnames=("n", "bt", "bs"))
def chain(q, k, v, starts, n, bt, bs):
    def step(q, _):
        def layer(q, _):
            o = flash_prefill(q, k, v, starts, blk_t=bt, blk_s=bs)
            return (q + o.astype(q.dtype) * 1e-6), None
        q, _ = jax.lax.scan(layer, q, None, length=L)
        return q, None
    q, _ = jax.lax.scan(step, q, None, length=n)
    return q[0, 0, 0, 0]


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, T, H, Dh), jnp.bfloat16) * 0.1
    k = jax.random.normal(key, (B, H, S, Dh), jnp.bfloat16) * 0.1
    v = jax.random.normal(key, (B, H, S, Dh), jnp.bfloat16) * 0.1
    starts = jnp.zeros((B,), jnp.int32)
    for bt, bs in ((256, 512), (512, 512), (512, 1024), (1024, 1024),
                   (512, 2048), (1024, 2048)):
        def run(n):
            return fetch(chain(q, k, v, starts, n, bt, bs))
        try:
            run(1); run(5)
        except Exception as e:
            print(f"bt={bt} bs={bs}: FAILED {type(e).__name__}", flush=True)
            continue
        def timed(n):
            best = 1e9
            for _ in range(3):
                t0 = time.time(); run(n)
                best = min(best, time.time() - t0)
            return best
        dt = (timed(5) - timed(1)) / 4
        print(f"bt={bt:5d} bs={bs:5d}: {dt*1e3:7.2f} ms per 32-layer prefill"
              f" attention", flush=True)


if __name__ == "__main__":
    main()
