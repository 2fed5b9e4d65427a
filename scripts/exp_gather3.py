"""Act-order gather round 3: the gather AS a quantized one-hot matmul.

A permutation matrix stored as a 2-bit sym QTensor (codes {2,3}, scale 1
→ values {0,1} exactly; every product is exactly 0 or x so f32
accumulation is EXACT) weighs K*K/4 bytes — 4 MB at K=4096 vs the 33 MB
bf16 one-hot the current strategy NOMINALLY materializes.

RESULT (v5e, full 7B act-order decode via exp_variants with the gather
wired through attach_act_order_gathers + skip_gather — since reverted):

  q4_g128_asym_perm_shared      (in-graph bf16 one-hot):  6.05 ms/tok
  q4_g128_asym_perm_shared_g2   (stored 2-bit one-hot):   6.76 ms/tok
  q4_g128_sym                   (no act-order):           5.08 ms/tok

NEGATIVE: the in-graph one-hot costs only ~10 us per gather — XLA fuses
the iota-compare CONSTRUCTION into the dot's operand read, so the 33 MB
matrix never round-trips HBM; the stored quantized one-hot pays a real
8 MB native-code stream PLUS a separate unfused Pallas launch per
gather. Act-order decode already sits within ~15-19% of unpermuted,
meeting the VERDICT r1 target; the stored-gather machinery was removed.
"""
import functools
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from neural_tpu.core import QuantConfig
from neural_tpu.core.qtensor import QTensor, quantize, pack_codes, pack_chunk
from neural_tpu.ops.qmatmul import qmatmul

M, K, N = 16, 4096, 4096
PAIRS = 96
NP_ = 8   # distinct perms cycled


def onehot_q2(perm: np.ndarray) -> QTensor:
    """[K] perm → exact 2-bit sym QTensor of the one-hot P.T (so that
    qmatmul(x, P) == x[:, perm])."""
    cfg = QuantConfig(bits=2, group_size=512, sym=True)
    codes = np.full((K, K), 2, np.uint8)      # (c-2)*s: 2 → 0.0
    codes[perm, np.arange(K)] = 3             # 3 → 1.0
    planes = pack_codes(jnp.asarray(codes), 2, pack_chunk(cfg, K))
    scales = jnp.ones((K // 512, K), jnp.float32)
    return QTensor(planes, scales, None, None, cfg)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    perms = [rng.permutation(K).astype(np.int32) for _ in range(NP_)]
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)

    # the decode-GEMM each gather feeds (4-bit, native codes)
    wq = quantize(jnp.asarray(rng.standard_normal((K, N)) * 0.02,
                              jnp.float32), QuantConfig(bits=4, group_size=32))
    from neural_tpu.core.qtensor import to_native
    wq = to_native(wq)

    pq = [onehot_q2(p) for p in perms]
    jperms = [jnp.asarray(p) for p in perms]

    # correctness
    g = np.asarray(qmatmul(x, pq[0], out_dtype=jnp.bfloat16))
    ref = np.asarray(x)[:, perms[0]]
    print("q2 gather exact:", np.array_equal(g, ref), flush=True)

    @functools.partial(jax.jit, static_argnames=("n", "strat"))
    def chain(x, pq, jperms, wq, n, strat):
        def step(x, _):
            for i in range(NP_):
                if strat == "onehot":
                    p = (jperms[i][:, None] == jnp.arange(K)[None, :]
                         ).astype(jnp.bfloat16)
                    xg = jnp.dot(x, p.T, preferred_element_type=jnp.float32
                                 ).astype(jnp.bfloat16)
                elif strat == "q2":
                    xg = qmatmul(x, pq[i], out_dtype=jnp.bfloat16)
                else:
                    xg = x  # no gather: floor
                y = qmatmul(xg, wq, out_dtype=jnp.bfloat16)
                x = (x + y * 1e-6).astype(jnp.bfloat16)
            return x, None
        x, _ = jax.lax.scan(step, x, None, length=n)
        return x[0, 0]

    pq = tuple(pq)
    jperms = tuple(jperms)
    for strat in ("none", "onehot", "q2"):
        def run(n):
            return float(chain(x, pq, jperms, wq, n, strat))
        run(1); run(3)
        def timed(n):
            best = 1e9
            for _ in range(3):
                t0 = time.time(); run(n); best = min(best, time.time() - t0)
            return best
        per = (timed(12) - timed(2)) / 10 / NP_
        print(f"{strat:7s}: {per*1e6:7.2f} us per gather+gemm pair",
              flush=True)


if __name__ == "__main__":
    main()
