"""7B decode timing: packed-u8 unpack kernel vs native-int4 kernel."""
import functools
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import LLAMA2_7B, rand_quant_params, fetch
from neural_tpu.runtime import init_cache
from neural_tpu.runtime.generate import prepare_params
from neural_tpu.models.transformer import forward


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "native"),
                   donate_argnums=(3,))
def dec(params, token, pos, cache, cfg, n_steps, native):
    params = prepare_params(params, native=native)

    def body(carry, _):
        token, pos, cache = carry
        logits, cache = forward(params, token, pos, cache, cfg,
                                logits_dtype=jnp.bfloat16)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        return (nxt[:, None], pos + 1, cache), nxt

    carry, toks = jax.lax.scan(body, (token, pos, cache), None, length=n_steps)
    return toks, carry[2]


def bench_native(params, cfg, native, S=2048, prompt_len=128, lo=4, hi=36):
    token = jnp.asarray([[17]], jnp.int32)

    def run(n):
        cache = init_cache(cfg, 1, S)
        pos = jnp.asarray([prompt_len], jnp.int32)
        toks, cache = dec(params, token, pos, cache, cfg, n, native)
        return fetch(toks[-1])

    run(lo); run(hi)

    def timed(n):
        best = 1e9
        for _ in range(3):
            t0 = time.time(); run(n); best = min(best, time.time() - t0)
        return best
    t_lo, t_hi = timed(lo), timed(hi)
    return (t_hi - t_lo) / (hi - lo)


def main():
    cfg = LLAMA2_7B
    t0 = time.time()
    params = rand_quant_params(cfg)
    print(f"# init {time.time()-t0:.1f}s", flush=True)
    for native in (False, True):
        dt = bench_native(params, cfg, native)
        print(f"native={native}: {dt*1e3:.2f} ms/tok "
              f"({1/dt:.1f} tok/s)", flush=True)


if __name__ == "__main__":
    main()


def profile(native=True, n=int(os.environ.get('NSTEPS', '24')) ):
    from neural_tpu.utils import profiling
    os.environ["NEURAL_TPU_VERBOSE"] = "2"
    cfg = LLAMA2_7B
    params = rand_quant_params(cfg)
    token = jnp.asarray([[17]], jnp.int32)

    def run():
        cache = init_cache(cfg, 1, 2048)
        pos = jnp.asarray([128], jnp.int32)
        toks, cache = dec(params, token, pos, cache, cfg, n, native)
        return fetch(toks[-1])

    run()  # compile
    with profiling.maybe_trace(f"decode_native{native}", top=16):
        run()


if __name__ == "__main__" and os.environ.get("PROFILE"):
    profile(native=os.environ.get("NATIVE", "1") == "1")
    sys.exit(0)
