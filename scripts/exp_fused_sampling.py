"""Measure the serving decode-step cost: legacy logits-fetch + host-group
sampling vs the fused _decode_sample_all single dispatch (mixed
per-request SamplingParams, batch 8, 7B q4_j int8-KV serving shape).

Result feeds the round-5 scheduler change (VERDICT item 4): the fused
path's step should collapse to ~the pure decode step + one [B]-int fetch.
Run on the real chip: python scripts/exp_fused_sampling.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench as B
from neural_tpu.runtime import init_cache
from neural_tpu.runtime.sampling import SamplingParams, sample, batch_params
from neural_tpu.serving.scheduler import _decode_all, _decode_sample_all


def main():
    cfg = B._llama2_7b()
    params = B.rand_quant_params(cfg, quant="q4_j")
    params = B.apply_residency(params, cfg, batch=8, kv_dtype="int8")
    batch, S = 8, 2048
    cache = init_cache(cfg, batch, S, jnp.int8)
    toks = jnp.full((batch, 1), 17, jnp.int32)
    lens = jnp.full((batch,), 512, jnp.int32)
    key = jax.random.PRNGKey(0)

    # mixed params: 4 distinct groups (worst case for the legacy path)
    sps = [SamplingParams(greedy=True, repeat_penalty=1.0),
           SamplingParams(temperature=0.8, top_k=40),
           SamplingParams(temperature=1.0, top_p=0.9, repeat_penalty=1.2),
           SamplingParams(mirostat=2)] * 2
    hist = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (batch, 64), np.int32))
    valid = jnp.ones((batch, 64), bool)

    def legacy_step(cache, key):
        logits, cache = _decode_all(params, toks, lens, cache, cfg)
        rows = np.asarray(logits, np.float32)          # [B, V] fetch
        out = np.zeros(batch, np.int64)
        groups = {}
        for i, sp in enumerate(sps):
            groups.setdefault(sp, []).append(i)
        for sp, idxs in groups.items():
            key, sub = jax.random.split(key)
            t, _ = sample(jnp.asarray(rows[idxs]), sub, sp,
                          prev_tokens=hist[np.asarray(idxs)],
                          prev_valid=valid[np.asarray(idxs)])
            out[idxs] = np.asarray(t)
        return cache, key, out

    bp = batch_params(sps, [False] * batch)
    mu = jnp.full((batch,), 10.0, jnp.float32)

    def fused_step(cache, key):
        key, sub = jax.random.split(key)
        tok, mu2, cache = _decode_sample_all(
            params, toks, lens, cache, sub, bp, mu, hist, valid, cfg,
            cfg.eos_token_ids, ("filters", "mirostat"))
        return cache, key, np.asarray(tok)             # [B] ints fetch

    def timeit(step, cache, key, n=20):
        cache, key, _ = step(cache, key)               # compile
        t0 = time.time()
        for _ in range(n):
            cache, key, _ = step(cache, key)
        return (time.time() - t0) / n * 1e3, cache, key

    leg_ms, cache, key = timeit(legacy_step, cache, key)
    fus_ms, cache, key = timeit(fused_step, cache, key)
    print({"legacy_step_ms": round(leg_ms, 2),
           "fused_step_ms": round(fus_ms, 2),
           "speedup": round(leg_ms / fus_ms, 2),
           "batch": batch, "groups": 4, "quant": "q4_j", "kv": "int8"})


if __name__ == "__main__":
    main()
