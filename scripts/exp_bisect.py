"""Bisect the stacked-native-int4 zeros bug at real shapes."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from neural_tpu.core import PRESETS, quantize
from neural_tpu.core.qtensor import to_native, matmul_ref
from neural_tpu.ops.qmatmul import _qmatmul_pallas, _pick_tiles


def rel_err(a, b):
    a = np.asarray(a, np.float32); b = np.asarray(b, np.float32)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9))


def trial(K, N, L, M=1, tiles=None):
    ws = [np.random.RandomState(i).randn(K, N).astype(np.float32) * 0.02
          for i in range(L)]

    @jax.jit
    def qstack(ws):
        qts = [quantize(w, PRESETS["q4_0"]) for w in ws]
        return jax.tree.map(lambda *a: jnp.stack(a), *qts)

    qtstack = qstack(ws)
    x = jax.random.normal(jax.random.PRNGKey(9), (16, K), jnp.bfloat16)
    tm, tn, tk = tiles or _pick_tiles(16, K, N, 32, 4, "fp8__native")

    @jax.jit
    def run(x, qtstack, l):
        nst = to_native(qtstack)
        return _qmatmul_pallas(x, nst, tm, tn, tk,
                               out_dtype=jnp.bfloat16, interpret=False,
                               lidx=l)

    @jax.jit
    def qt_l(qtstack, l):  # materialized single layer for the oracle
        import jax.tree_util as jtu
        return jax.tree.map(lambda a: a[l], qtstack)

    for l in (0, L - 1):
        out = run(x, qtstack, l)
        ref = matmul_ref(np.asarray(x, np.float32), qt_l(qtstack, l))
        print(f"K={K} N={N} L={L} tiles=({tm},{tn},{tk}) l={l}: "
              f"rel_err={rel_err(out, ref):.4f} out00={float(out[0,0]):.4f}",
              flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    trial(512, 512, 4)
    trial(4096, 4096, 4)
    trial(4096, 4096, 4, tiles=(16, 256, 256))
    trial(4096, 4096, 1)
    trial(512, 512, 4, tiles=(16, 256, 256))
