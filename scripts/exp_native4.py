"""Experiment: native-int4 Pallas path correctness + decode GEMV bandwidth.

Reproduces the known gap: `prepare_params(native=True)` returns zeros on
real hardware for the stacked model while passing interpret mode.

Usage: python scripts/exp_native4.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from neural_tpu.core import PRESETS, quantize
from neural_tpu.core.qtensor import QTensor, to_native, matmul_ref, dequantize
from neural_tpu.ops.qmatmul import qmatmul, _qmatmul_pallas, _pick_tiles

K, N, L = 4096, 4096, 4


def make_qt(seed=0, stack=None):
    w = jax.random.normal(jax.random.PRNGKey(seed), (K, N)) * 0.02
    qt = quantize(w, PRESETS["q4_0"])
    return w, qt


def stack_qts(qts):
    return jax.tree.map(lambda *a: jnp.stack(a), *qts)


def rel_err(a, b):
    a = np.asarray(a, np.float32); b = np.asarray(b, np.float32)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9))


def main():
    print("backend:", jax.default_backend(), flush=True)
    x = jax.random.normal(jax.random.PRNGKey(9), (1, K), jnp.bfloat16)

    ws, qts = zip(*[make_qt(i) for i in range(L)])

    # ---- 1. single-layer native, Pallas forced
    @jax.jit
    def single(x, qt):
        nqt = to_native(qt)
        return qmatmul(x, nqt, out_dtype=jnp.bfloat16, force="pallas")

    ref = matmul_ref(x, qts[0], jnp.float32)
    out = single(x, qts[0])
    print("single-layer native pallas rel_err:", rel_err(out, ref),
          "out[0,:4]:", np.asarray(out)[0, :4], flush=True)

    # ---- 2. stacked native with lidx
    @jax.jit
    def stacked(x, qtstack):
        nst = to_native(qtstack)
        outs = []
        for l in range(L):
            outs.append(qmatmul(x, nst, out_dtype=jnp.bfloat16, lidx=l))
        return jnp.stack(outs)

    qtstack = stack_qts(list(qts))
    outs = stacked(x, qtstack)
    for l in range(L):
        ref = matmul_ref(x, qts[l], jnp.float32)
        print(f"stacked lidx={l} rel_err:", rel_err(outs[l], ref),
              "out[0,:4]:", np.asarray(outs[l])[0, :4], flush=True)

    # ---- 3. stacked native under lax.scan (the real usage)
    @jax.jit
    def scanned(x, qtstack):
        nst = to_native(qtstack)

        def body(carry, l):
            out = qmatmul(carry, nst, out_dtype=jnp.bfloat16, lidx=l)
            return carry + out[:, :1] * 0, out

        _, outs = jax.lax.scan(body, x, jnp.arange(L))
        return outs

    outs2 = scanned(x, qtstack)
    for l in range(L):
        ref = matmul_ref(x, qts[l], jnp.float32)
        print(f"scan lidx={l} rel_err:", rel_err(outs2[l], ref), flush=True)


if __name__ == "__main__":
    main()
