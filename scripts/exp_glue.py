"""Decode-step cost breakdown on the real chip: where do 6.3 ms/tok go?

Ablates the 7B decode step (B=1, native-int4 unrolled weights, fill=128):
  mm        : 7 qmatmuls/layer + lm_head + embed/argmax only
  mm+norm   : + rms norms, rope, residual adds
  mm+cache  : + KV cache dynamic_update_slice writes
  full      : + flash_decode attention kernel (== production step)
Slope timing (scan-of-n inside one jit, diff of two lengths) like bench.py.
"""
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
from neural_tpu.models.transformer import linear, _norm
from neural_tpu.ops.rope import rope_cos_sin, apply_rope
from neural_tpu.ops.attention import attend

cfg = LLAMA2_7B


def block(x, lp, lidx, k_all, v_all, start, positions, inv_freqs, mode):
    B, T, D = x.shape
    Dh = cfg.head_dim
    h = _norm(x, lp["attn_norm_w"], None, cfg) if mode >= 1 else x
    q = linear(h, lp["wq"], out_dtype=jnp.bfloat16)
    k = linear(h, lp["wk"], out_dtype=jnp.bfloat16)
    v = linear(h, lp["wv"], out_dtype=jnp.bfloat16)
    Hq, Hkv = q.shape[-1] // Dh, k.shape[-1] // Dh
    q = q.reshape(B, T, Hq, Dh)
    k = k.reshape(B, T, Hkv, Dh)
    v = v.reshape(B, T, Hkv, Dh)
    if mode >= 1:
        cos, sin = rope_cos_sin(positions, inv_freqs)
        q = apply_rope(q, cos, sin, cfg.rope_style, cfg.rope_dim)
        k = apply_rope(k, cos, sin, cfg.rope_style, cfg.rope_dim)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    if mode >= 2:  # cache writes
        for b in range(B):
            k_all = jax.lax.dynamic_update_slice(
                k_all, kt[b][None, None].astype(k_all.dtype),
                (lidx, b, 0, start[b], 0))
            v_all = jax.lax.dynamic_update_slice(
                v_all, vt[b][None, None].astype(v_all.dtype),
                (lidx, b, 0, start[b], 0))
    if mode >= 3:  # attention kernel
        out = attend(q, k_all, v_all, None, None, positions, cfg,
                     lidx=jnp.int32(lidx)).astype(x.dtype)
    else:
        out = (q.reshape(B, T, -1) * 1e-3 +
               jnp.repeat(v.reshape(B, T, -1), Hq // Hkv, -1) * 1e-3)
    attn_out = linear(out, lp["wo"], out_dtype=jnp.bfloat16)
    x = x + attn_out if mode >= 1 else x + attn_out * 1e-3
    h2 = _norm(x, lp["ffn_norm_w"], None, cfg) if mode >= 1 else x
    g = linear(h2, lp["w_gate"], out_dtype=jnp.bfloat16)
    u = linear(h2, lp["w_up"], out_dtype=jnp.bfloat16)
    act = jax.nn.silu(g) * u if mode >= 1 else g * 1e-3 + u * 1e-3
    d = linear(act, lp["w_down"], out_dtype=jnp.bfloat16)
    x = x + d if mode >= 1 else x + d * 1e-3
    return x, k_all, v_all


@functools.partial(jax.jit, static_argnames=("n", "mode"),
                   donate_argnums=(3,))
def dec(params, token, pos, cache, n, mode):
    params = prepare_params(params)
    k_all, v_all = cache[0], cache[1]
    inv_freqs = params.get("rope_inv_freqs")

    def step(carry, _):
        token, pos, k_all, v_all = carry
        positions = pos[:, None]
        x = jnp.take(params["embed"], token, axis=0).astype(jnp.bfloat16)
        for l, lp in enumerate(params["layers"]):
            x, k_all, v_all = block(x, lp, l, k_all, v_all, pos, positions,
                                    inv_freqs, mode)
        x = _norm(x, params["final_norm_w"], None, cfg)
        logits = linear(x, params["lm_head"], out_dtype=jnp.bfloat16)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        return (nxt[:, None], pos + 1, k_all, v_all), nxt

    (token, pos, k_all, v_all), toks = jax.lax.scan(
        step, (token, pos, k_all, v_all), None, length=n)
    return toks


def bench(params, mode, S=2048, fill=128, lo=4, hi=36):
    token = jnp.asarray([[17]], jnp.int32)

    def run(n):
        cache = init_cache(cfg, 1, S)
        toks = dec(params, token, jnp.asarray([fill], jnp.int32),
                   cache, n, mode)
        return fetch(toks[-1])

    run(lo); run(hi)

    def timed(n):
        best = 1e9
        for _ in range(3):
            t0 = time.time(); run(n); best = min(best, time.time() - t0)
        return best
    return (timed(hi) - timed(lo)) / (hi - lo)


def main():
    t0 = time.time()
    params = rand_quant_params(cfg)
    print(f"# init {time.time()-t0:.1f}s", flush=True)
    names = {0: "mm", 1: "mm+norm+rope", 2: "mm+cache", 3: "full"}
    prev = 0.0
    for mode in (0, 1, 2, 3):
        dt = bench(params, mode) * 1e3
        print(f"{names[mode]:14s}: {dt:6.2f} ms/tok  (+{dt-prev:5.2f})",
              flush=True)
        prev = dt


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    main()
