"""qmatmul decode with/without act-order perm, standalone.

exp_variants: +9.3 ms/tok from perms; exp_gather: the raw [16,4096]
gathers only cost 2.4 ms. Where are the other ~7 ms? Chain the REAL
qmatmul at decode M=1 over 8 distinct [4096,4096] native-int4 tensors.
"""
import functools
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from neural_tpu.core import QuantConfig, quantize
from neural_tpu.core.qtensor import to_native, QTensor
from neural_tpu.ops.qmatmul import qmatmul

K = N = 4096
L = 8
REP = 4  # matmuls per step = L * REP


def fetch(x):
    return float(jnp.asarray(x).astype(jnp.float32).reshape(-1)[0])


def build(sym, perm):
    cfg = QuantConfig(bits=4, group_size=128, sym=sym)
    rng = np.random.default_rng(0)
    qts = []
    for i in range(L):
        w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32) * .02)
        qt = jax.jit(lambda w: quantize(w, cfg))(w)  # packed (uint8)
        if perm:
            p = jnp.asarray(rng.permutation(K).astype(np.int32))
            qt = QTensor(qt.planes, qt.scales, qt.zeros, p, qt.cfg)
        qts.append(qt)
    return qts


@functools.partial(jax.jit, static_argnames=("n",))
def chain(x, qts, n):
    qts = tuple(to_native(qt) for qt in qts)  # int4 stays inside the jit

    def step(x, _):
        y = x
        for _ in range(REP):
            for qt in qts:
                y = (qmatmul(y, qt, out_dtype=jnp.bfloat16) * 1e-2
                     + x).astype(jnp.bfloat16)
        return y, None
    x, _ = jax.lax.scan(step, x, None, length=n)
    return x[0, 0]


def main():
    print("backend:", jax.default_backend(), flush=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, K), jnp.bfloat16)
    for sym in (True, False):
        for perm in (False, True):
            qts = build(sym, perm)
            def run(n):
                return fetch(chain(x, tuple(qts), n))
            run(2); run(10)
            def timed(n):
                best = 1e9
                for _ in range(3):
                    t0 = time.time(); run(n)
                    best = min(best, time.time() - t0)
                return best
            per = (timed(10) - timed(2)) / 8 / (L * REP)
            print(f"sym={sym} perm={perm}: {per*1e6:7.2f} us per qmatmul",
                  flush=True)


if __name__ == "__main__":
    main()
