"""Decode speed by quant variant at llama-7B shapes (isolate the slowdowns
bench_configs exposed: gptq-asym 16.3 ms/tok, odd-bit 41 ms/tok)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import bench
from bench import LLAMA2_7B, fetch
from neural_tpu.core import PRESETS, QuantConfig
from neural_tpu.core.qtensor import QTensor
from neural_tpu.runtime import init_cache
from neural_tpu.runtime.generate import decode_loop

cfg = LLAMA2_7B

VARIANTS = {
    "q4_g32_sym": QuantConfig(bits=4, group_size=32, sym=True),
    "q4_g128_sym": QuantConfig(bits=4, group_size=128, sym=True),
    "q4_g128_asym": QuantConfig(bits=4, group_size=128, sym=False),
    "q4_g128_asym_perm": QuantConfig(bits=4, group_size=128, sym=False),
    "q4_g128_sym_perm": QuantConfig(bits=4, group_size=128, sym=True),
    "q4_g128_asym_perm_shared": QuantConfig(bits=4, group_size=128,
                                            sym=False),
    "q4_g128_sym_perm_shared": QuantConfig(bits=4, group_size=128,
                                           sym=True),
    "q3_g32": QuantConfig(bits=3, group_size=32, sym=True),
    "q5_g32": QuantConfig(bits=5, group_size=32, sym=True),
    "q8_g32": QuantConfig(bits=8, group_size=32, sym=True),
}


def rand_params(qcfg, perm=False, shared=False):
    name = "__v"
    PRESETS[name] = qcfg
    try:
        params = bench.rand_quant_params(cfg, quant=name)
    finally:
        del PRESETS[name]
    if perm and not shared:
        rng = np.random.default_rng(0)

        def add_perm(qt):
            if not isinstance(qt, QTensor):
                return qt
            L = qt.planes[0].shape[0]
            p = np.stack([rng.permutation(qt.K) for _ in range(L)]) \
                if qt.planes[0].ndim == 3 else rng.permutation(qt.K)
            return QTensor(qt.planes, qt.scales, qt.zeros,
                           jnp.asarray(p, jnp.int32), qt.cfg)
        params = {k: (jax.tree.map(add_perm, v,
                                   is_leaf=lambda x: isinstance(x, QTensor))
                      if k == "layers" else add_perm(v))
                  for k, v in params.items()}
    elif perm and shared:
        # the REAL GPTQ act-order shape: q/k/v share one g_idx (same
        # Hessian), gate/up share one, w_down's perm folds at import →
        # fuse_layer_weights leaves 3 gathers/layer (wqkv, wo, w_gateup)
        from neural_tpu.runtime.generate import fuse_layer_weights
        rng = np.random.default_rng(0)
        layers = dict(params["layers"])
        L = layers["wq"].planes[0].shape[0]
        pq = jnp.asarray(np.stack([rng.permutation(cfg.hidden_size)
                                   for _ in range(L)]), jnp.int32)
        pg = jnp.asarray(np.stack([rng.permutation(cfg.hidden_size)
                                   for _ in range(L)]), jnp.int32)
        po = jnp.asarray(np.stack([rng.permutation(cfg.hidden_size)
                                   for _ in range(L)]), jnp.int32)
        for n, p in (("wq", pq), ("wk", pq), ("wv", pq), ("wo", po),
                     ("w_gate", pg), ("w_up", pg)):
            qt = layers[n]
            layers[n] = QTensor(qt.planes, qt.scales, qt.zeros, p, qt.cfg)
        params = dict(params, layers=layers)
        params = fuse_layer_weights(params, cfg)
    return params


def slope(params, S=2048, fill=128, lo=4, hi=20):
    token = jnp.asarray([[17]], jnp.int32)

    def run(n):
        cache = init_cache(cfg, 1, S)
        toks, _ = decode_loop(params, token, jnp.asarray([fill], jnp.int32),
                              cache, cfg, n, fill_hint=fill + hi)
        return fetch(toks[-1])
    run(lo); run(hi)

    def timed(n):
        best = 1e9
        for _ in range(3):
            t0 = time.time(); run(n); best = min(best, time.time() - t0)
        return best
    return (timed(hi) - timed(lo)) / (hi - lo)


def main():
    print("backend:", jax.default_backend(), flush=True)
    which = sys.argv[1:] or list(VARIANTS)
    for name in which:
        qcfg = VARIANTS[name]
        t0 = time.time()
        params = rand_params(qcfg, perm="perm" in name,
                             shared=name.endswith("shared"))
        dt = slope(params)
        print(f"{name:18s}: {dt*1e3:6.2f} ms/tok   (setup {time.time()-t0:.0f}s)",
              flush=True)
        del params


if __name__ == "__main__":
    main()
