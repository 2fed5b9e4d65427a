"""Decode attention block-size sweep: per-token attention cost (32 layers)
vs blk_s and fill. exp_glue.py measured attention at +0.70 ms/tok with
blk_s=512 at fill=128 — 8.5x its 64 MB data cost; suspect the 512-token
min DMA reads 4x the valid KV at short fill."""
import functools
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from neural_tpu.ops.attention import flash_decode

L, B, H, S, Dh = 32, 1, 32, 2048, 128


def fetch(x):
    return float(jnp.asarray(x).astype(jnp.float32).reshape(-1)[0])


@functools.partial(jax.jit, static_argnames=("n", "blk_s", "hb"))
def chain(q, k, v, lengths, n, blk_s, hb=None, ks=None, vs=None):
    def step(q, _):
        def layer(q, l):
            o = flash_decode(q, k, v, ks, vs, lengths,
                             blk_s=blk_s, lidx=l, hb=hb)
            return (q + o.astype(q.dtype) * 1e-6), None
        q, _ = jax.lax.scan(layer, q, jnp.arange(L))
        return q, None
    q, _ = jax.lax.scan(step, q, None, length=n)
    return q[0, 0, 0]


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, Dh), jnp.bfloat16)
    int8 = bool(int(os.environ.get("NTPU_EXP_INT8", "0")))
    if int8:
        k = jax.random.randint(key, (L, B, H, S, Dh), -127, 127, jnp.int8)
        v = jax.random.randint(key, (L, B, H, S, Dh), -127, 127, jnp.int8)
        ks = jnp.ones((L, B, H, S), jnp.bfloat16) * 0.01
        vs = jnp.ones((L, B, H, S), jnp.bfloat16) * 0.01
    else:
        k = jax.random.normal(key, (L, B, H, S, Dh), jnp.bfloat16) * 0.1
        v = jax.random.normal(key, (L, B, H, S, Dh), jnp.bfloat16) * 0.1
        ks = vs = None

    for fill in (128, 512, 1984):
        lengths = jnp.asarray([fill], jnp.int32)
        row = []
        import os as _os
        pairs = ((128, 8), (128, 16), (128, 32), (256, 16),
                 (512, 8), (512, 16))
        if _os.environ.get("NTPU_EXP_PAIRS"):
            pairs = tuple(tuple(map(int, p.split("x")))
                          for p in _os.environ["NTPU_EXP_PAIRS"].split(","))
        for blk_s, hb in pairs:
            def run(n):
                return fetch(chain(q, k, v, lengths, n, blk_s, hb, ks, vs))
            run(4); run(68)
            def timed(n):
                best = 1e9
                for _ in range(3):
                    t0 = time.time(); run(n)
                    best = min(best, time.time() - t0)
                return best
            dt = (timed(68) - timed(4)) / 64
            row.append(f"b{blk_s}h{hb}={dt*1e3:6.3f}ms")
        print(f"fill={fill:5d}: " + "  ".join(row), flush=True)


if __name__ == "__main__":
    main()
