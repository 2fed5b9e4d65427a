"""tp=1 shard_map + Mosaic-kernel smoke on a REAL chip.

The CPU-mesh TP tests exercise shard_map with the XLA fallback kernels;
this validates the shard_map-wrapping-Pallas composition (Mosaic kernels
inside shard_map partitions) on actual TPU hardware, where only one chip
is available: greedy tokens from the sharded prefill + on-device decode
loop must match the single-device loop bit-for-bit.

Usage (real chip): python scripts/smoke_tp_chip.py
Verified on v5e (axon): 6/6 greedy tokens match.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from neural_tpu.convert import init_random
from neural_tpu.models.config import ModelConfig
from neural_tpu.parallel.sharding import make_mesh, shard_params, shard_cache
from neural_tpu.parallel.tp import make_tp_prefill, make_tp_decode_loop
from neural_tpu.runtime import init_cache
from neural_tpu.runtime.generate import decode_loop, _prefill_ragged


def main():
    t0 = time.time()
    cfg = ModelConfig(arch="llama", vocab_size=512, hidden_size=512,
                      n_layers=2, n_heads=8, n_kv_heads=8, head_dim=128,
                      intermediate_size=1024, max_seq_len=128)
    params = init_random(cfg, quant="q4_0")
    rows = np.asarray([[3, 14, 15, 9]], np.int32)
    lens = jnp.asarray([4], jnp.int32)

    cache = init_cache(cfg, 1, 64)
    logits, cache = _prefill_ragged(params, jnp.asarray(rows), lens, cache,
                                    cfg)
    tok0 = jnp.argmax(logits, -1).astype(jnp.int32)
    ref, _ = decode_loop(params, tok0[:, None], lens, cache, cfg, 6)
    ref = np.asarray(ref)[:, 0].tolist()

    mesh = make_mesh(dp=1, tp=1)
    sp = shard_params(params, cfg, mesh)
    sc = shard_cache(init_cache(cfg, 1, 64), mesh)
    prefill = make_tp_prefill(params, cfg, mesh)
    tl, sc = prefill(sp, jnp.asarray(rows), lens, sc)
    ttok0 = jnp.argmax(tl, -1).astype(jnp.int32)
    loop = make_tp_decode_loop(params, cfg, mesh, 6)
    toks, _ = loop(sp, ttok0[:, None], lens, sc)
    got = np.asarray(toks)[:, 0].tolist()
    assert got == ref, (got, ref)
    print(f"tp=1 shard_map + Mosaic smoke OK in {time.time() - t0:.0f}s: "
          f"tokens {got} match single-device")


if __name__ == "__main__":
    main()
