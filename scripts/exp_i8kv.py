import time
import jax, jax.numpy as jnp
from bench import LLAMA2_7B, rand_quant_params, fetch
from neural_tpu.runtime import init_cache
from neural_tpu.runtime.generate import decode_loop

cfg = LLAMA2_7B
params = rand_quant_params(cfg)
for dtype in (jnp.bfloat16, jnp.int8):
    for fill in (128, 1984):
        def run(n):
            cache = init_cache(cfg, 1, 2048, dtype)
            toks, _ = decode_loop(params, jnp.asarray([[17]], jnp.int32), jnp.asarray([fill], jnp.int32), cache, cfg, n)
            return fetch(toks[-1])
        run(4); run(36)
        def timed(n):
            best = 1e9
            for _ in range(3):
                t0 = time.time(); run(n); best = min(best, time.time()-t0)
            return best
        per = (timed(36) - timed(4)) / 32
        print(f"kv={jnp.dtype(dtype).name} fill={fill}: {per*1e3:.2f} ms/tok", flush=True)
