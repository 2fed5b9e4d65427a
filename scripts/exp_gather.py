"""Act-order activation gather strategies: x [16, 4096] permuted along K.

exp_variants measured +9 ms/tok for act-order (224 gathers) → ~40 us per
[16, 4096] lane gather. Candidates:
  take_lane : jnp.take(x, perm, axis=1)            (current)
  take_sub  : transpose → take(axis=0) → transpose
  onehot    : x @ P with P built on the fly (iota == perm compare, bf16)
  arange_eq : same but via dot with int8 one-hot
"""
import functools
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

M, K = int(os.environ.get("NTPU_M", "16")), 4096
N_GATHERS = 224  # 7 matmuls x 32 layers


def fetch(x):
    return float(jnp.asarray(x).astype(jnp.float32).reshape(-1)[0])


def g_take_lane(x, perm):
    return jnp.take(x, perm, axis=1)


def g_take_sub(x, perm):
    return jnp.take(x.T, perm, axis=0).T


def g_onehot(x, perm):
    p = (perm[:, None] == jnp.arange(K)[None, :]).astype(jnp.bfloat16)
    # out[m, k] = x[m, perm[k]] → x @ P.T with P[k, j] = (perm[k] == j)
    return jnp.dot(x, p.T, preferred_element_type=jnp.float32
                   ).astype(x.dtype)


def g_dus_loop(x, perm):
    # sublane gather after reshaping lanes into sublanes (8x512 layout)
    xr = x.reshape(M, K // 512, 512)
    return jnp.take(x, perm, axis=1)  # placeholder


STRATS = {"take_lane": g_take_lane, "take_sub": g_take_sub,
          "onehot": g_onehot}


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
    for name in STRATS:
        def run(n):
            return fetch(chain(x, perms, n, name))
        run(2); run(10)
        def timed(n):
            best = 1e9
            for _ in range(3):
                t0 = time.time(); run(n); best = min(best, time.time() - t0)
            return best
        per_tok = (timed(10) - timed(2)) / 8
        print(f"{name:10s}: {per_tok*1e3:7.3f} ms per {N_GATHERS} gathers "
              f"({per_tok/N_GATHERS*1e6:6.2f} us each)", flush=True)


if __name__ == "__main__":
    main()
