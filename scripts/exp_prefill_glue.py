"""Prefill (TTFT) cost breakdown at T=1975 on the real chip.

matmuls run at ~177 TF/s int8 → 27.7 TFLOP of a 7B prefill should take
~157 ms; attention ~2 TFLOP more; bench measures 215 ms. Where are the
other ~40 ms?  Modes: 0 mm only, 1 +norms/rope, 2 +cache writes, 3 full.
Also: 4 = full but last-position-only logits.
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
from neural_tpu.models.transformer import linear, _norm, forward
from neural_tpu.ops.rope import rope_cos_sin, apply_rope
from neural_tpu.ops.attention import attend

cfg = LLAMA2_7B
T = 1975
S = 2048


def block2(x, lp, lidx, k_all, v_all, start, positions, inv_freqs, mode):
    B, T_, D = x.shape
    Dh = cfg.head_dim
    h = _norm(x, lp["attn_norm_w"], None, cfg) if mode >= 1 else x
    q = linear(h, lp["wq"], out_dtype=jnp.bfloat16, lidx=lidx)
    k = linear(h, lp["wk"], out_dtype=jnp.bfloat16, lidx=lidx)
    v = linear(h, lp["wv"], out_dtype=jnp.bfloat16, lidx=lidx)
    Hq, Hkv = q.shape[-1] // Dh, k.shape[-1] // Dh
    q = q.reshape(B, T_, Hq, Dh)
    k = k.reshape(B, T_, Hkv, Dh)
    v = v.reshape(B, T_, Hkv, Dh)
    if mode >= 1:
        cos, sin = rope_cos_sin(positions, inv_freqs)
        q = apply_rope(q, cos, sin, cfg.rope_style, cfg.rope_dim)
        k = apply_rope(k, cos, sin, cfg.rope_style, cfg.rope_dim)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    if mode >= 2:
        for b in range(B):
            k_all = jax.lax.dynamic_update_slice(
                k_all, kt[b][None, None].astype(k_all.dtype),
                (lidx, b, 0, start[b], 0))
            v_all = jax.lax.dynamic_update_slice(
                v_all, vt[b][None, None].astype(v_all.dtype),
                (lidx, b, 0, start[b], 0))
    if mode >= 3:
        out = attend(q, k_all, v_all, None, None, positions, cfg,
                     lidx=jnp.int32(lidx)).astype(x.dtype)
    else:
        out = (q.reshape(B, T_, -1) * 1e-3 +
               jnp.repeat(v.reshape(B, T_, -1), Hq // Hkv, -1) * 1e-3)
    attn_out = linear(out, lp["wo"], out_dtype=jnp.bfloat16, lidx=lidx)
    x = x + attn_out if mode >= 1 else x + attn_out * 1e-3
    h2 = _norm(x, lp["ffn_norm_w"], None, cfg) if mode >= 1 else x
    g = linear(h2, lp["w_gate"], out_dtype=jnp.bfloat16, lidx=lidx)
    u = linear(h2, lp["w_up"], out_dtype=jnp.bfloat16, lidx=lidx)
    act = jax.nn.silu(g) * u if mode >= 1 else g * 1e-3 + u * 1e-3
    d = linear(act, lp["w_down"], out_dtype=jnp.bfloat16, lidx=lidx)
    x = x + d if mode >= 1 else x + d * 1e-3
    return x, k_all, v_all


@functools.partial(jax.jit, static_argnames=("n", "mode"))
def chain(params, tokens, n, mode):
    start = jnp.zeros((1,), jnp.int32)
    positions = start[:, None] + jnp.arange(T)[None, :]
    inv_freqs = params.get("rope_inv_freqs")

    def one(tok):
        if mode == 4:
            cache = init_cache(cfg, 1, S)
            logits, _ = forward(params, tok, start, cache, cfg,
                                logits_dtype=jnp.bfloat16)
            return logits[0, -1, :4]
        cache = init_cache(cfg, 1, S)
        k_all, v_all = cache[0], cache[1]
        x = jnp.take(params["embed"], tok, axis=0).astype(jnp.bfloat16)
        from neural_tpu.core.qtensor import QTensor
        layers = params["layers"]

        def body(carry, lidx):
            x, k_all, v_all = carry
            lp = {}
            for name, vv in layers.items():
                if isinstance(vv, QTensor):
                    lp[name] = vv      # stacked; lidx at matmul (zero-copy)
                else:
                    lp[name] = jax.lax.dynamic_index_in_dim(
                        vv, lidx, 0, keepdims=False)
            x, k_all, v_all = block2(x, lp, lidx, k_all, v_all, start,
                                     positions, inv_freqs, mode)
            return (x, k_all, v_all), None

        (x, k_all, v_all), _ = jax.lax.scan(
            body, (x, k_all, v_all), jnp.arange(cfg.n_layers))
        x = _norm(x, params["final_norm_w"], None, cfg)
        logits = linear(x[:, -1:], params["lm_head"],
                        out_dtype=jnp.bfloat16)
        return logits[0, -1, :4]

    def body(i, tok):
        lg = one(tok)
        bump = (lg[:1] * 0).astype(jnp.int32)
        return tok.at[0, 0].set(tok[0, 0] + bump[0])
    return jax.lax.fori_loop(0, n, body, tokens)[0, 0]


def bench(params, tokens, mode):
    def run(n):
        return fetch(chain(params, tokens, n, mode))
    run(1)
    def timed(n):
        best = 1e9
        for _ in range(2):
            t0 = time.time(); run(n); best = min(best, time.time() - t0)
        return best
    t1, t3 = timed(1), timed(3)
    return (t3 - t1) / 2


def main():
    print("backend:", jax.default_backend(), flush=True)
    t0 = time.time()
    params = rand_quant_params(cfg)
    print(f"# init {time.time()-t0:.1f}s", flush=True)
    tokens = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (1, T), np.int32))
    names = {0: "mm", 1: "mm+norm+rope", 2: "mm+cache", 3: "full(last-tok)",
             4: "forward(full-logits)"}
    prev = 0.0
    for mode in (0, 1, 2, 3, 4):
        dt = bench(params, tokens, mode) * 1e3
        print(f"{names[mode]:22s}: {dt:7.1f} ms  (+{dt-prev:6.1f})",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
