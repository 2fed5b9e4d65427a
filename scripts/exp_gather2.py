"""Act-order gather strategies, round 2: can we beat the ~22 us one-hot?

Candidates on [M=16, K=4096] bf16, measured as a scanned chain so each
gather's input depends on the previous (decode-like dependency):
  onehot_bf16 : x @ P.T built on the fly (current best, exact)
  take_lane   : jnp.take(x, perm, axis=1)
  take_sub    : transpose -> take rows -> transpose
  pallas_take : jnp.take along lanes INSIDE a pallas kernel (Mosaic
                dynamic gather; supported on v5e+ for 32-bit... test)
  pallas_oh   : one-hot dot inside a pallas kernel (fused generate+dot)
"""
import functools
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K = int(os.environ.get("NTPU_M", "16")), 4096
N_GATHERS = 96  # 3 shared gathers x 32 layers


def g_onehot(x, perm):
    p = (perm[:, None] == jnp.arange(K)[None, :]).astype(jnp.bfloat16)
    return jnp.dot(x, p.T, preferred_element_type=jnp.float32
                   ).astype(x.dtype)


def g_take_lane(x, perm):
    return jnp.take(x, perm, axis=1)


def g_take_sub(x, perm):
    return jnp.take(x.T, perm, axis=0).T


def _ptake_kernel(x_ref, p_ref, o_ref):
    o_ref[...] = jnp.take(x_ref[...], p_ref[...].reshape(-1), axis=1)


def g_pallas_take(x, perm):
    return pl.pallas_call(
        _ptake_kernel,
        out_shape=jax.ShapeDtypeStruct((M, K), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, perm.reshape(1, K))


def _ptake_kernel2(x_ref, p_ref, o_ref):
    # take_along_axis formulation (broadcast the index row over M)
    idx = jnp.broadcast_to(p_ref[...], (M, K))
    o_ref[...] = jnp.take_along_axis(x_ref[...], idx, axis=1)


def g_pallas_take2(x, perm):
    return pl.pallas_call(
        _ptake_kernel2,
        out_shape=jax.ShapeDtypeStruct((M, K), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, perm.reshape(1, K))


STRATS = {"onehot_bf16": g_onehot, "take_lane": g_take_lane,
          "take_sub": g_take_sub, "pallas_take": g_pallas_take,
          "pallas_take2": g_pallas_take2}


@functools.partial(jax.jit, static_argnames=("n", "name"))
def chain(x, perms, n, name):
    f = STRATS[name]

    def step(x, _):
        def one(x, perm):
            y = f(x, perm)
            return (x + y * 1e-6).astype(x.dtype), None
        x, _ = jax.lax.scan(one, x, perms)
        return x, None
    x, _ = jax.lax.scan(step, x, None, length=n)
    return x[0, 0]


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    perms = jnp.asarray(np.stack(
        [np.random.default_rng(i).permutation(K) for i in range(N_GATHERS)]
    ).astype(np.int32))
    # correctness first
    ref = np.asarray(x)[:, np.asarray(perms[0])]
    for name, f in STRATS.items():
        try:
            got = np.asarray(f(x, perms[0]))
        except Exception as e:
            print(f"{name:13s}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            STRATS[name] = None
            continue
        ok = np.array_equal(got.astype(np.float32), ref.astype(np.float32))
        print(f"{name:13s}: exact={ok}", flush=True)
    for name in [n for n, f in STRATS.items() if f is not None]:
        def run(n):
            return float(chain(x, perms, n, name))
        try:
            run(2); run(10)
        except Exception as e:
            print(f"{name:13s}: chain FAILED {str(e)[:100]}", flush=True)
            continue
        def timed(n):
            best = 1e9
            for _ in range(3):
                t0 = time.time(); run(n); best = min(best, time.time() - t0)
            return best
        per_tok = (timed(10) - timed(2)) / 8
        print(f"{name:13s}: {per_tok*1e3:7.3f} ms per {N_GATHERS} gathers "
              f"({per_tok/N_GATHERS*1e6:6.2f} us each)", flush=True)


if __name__ == "__main__":
    main()
