"""On-TPU end-to-end decode correctness + packed-vs-native decode timing.

Builds a small random llama, quantizes q4_0, runs the full jitted
decode_loop on the real chip, and compares the generated token stream
against the XLA-fallback path (force='xla' via a CPU run of the same graph).
"""
import functools
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from neural_tpu.core import PRESETS, quantize
from neural_tpu.models.config import ModelConfig
from neural_tpu.runtime import init_cache
from neural_tpu.runtime.generate import model_step, prepare_params
from neural_tpu.models.transformer import forward

CFG = ModelConfig(
    arch="llama", vocab_size=1024, hidden_size=512, n_layers=4,
    n_heads=8, n_kv_heads=8, head_dim=64, intermediate_size=1536,
    norm_eps=1e-5, rope_theta=10000.0, max_seq_len=256)


def make_params(cfg, seed=0):
    from neural_tpu.convert.hf import _shape_for, _add_aux
    qcfg = PRESETS["q4_0"]
    key = jax.random.PRNGKey(seed)
    names = ["wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"]
    per = {n: [] for n in names}
    norms = {"attn_norm_w": [], "ffn_norm_w": []}

    @functools.partial(jax.jit, static_argnames=("K", "N"))
    def mk(key, K, N):
        w = jax.random.normal(key, (K, N), jnp.float32) * 0.05
        return quantize(w, qcfg)

    for i in range(cfg.n_layers):
        for n in names:
            key, k2 = jax.random.split(key)
            K, N = _shape_for(n, cfg)
            per[n].append(mk(k2, K, N))
        for n in norms:
            norms[n].append(jnp.ones((cfg.hidden_size,), jnp.float32))
    layers = {n: jax.tree.map(lambda *a: jnp.stack(a), *v)
              for n, v in per.items()}
    layers.update({n: jnp.stack(v) for n, v in norms.items()})
    key, k1, k2, k3 = jax.random.split(key, 4)
    params = {
        "layers": layers,
        "embed": jax.random.normal(k1, (cfg.vocab_size, cfg.hidden_size),
                                   jnp.bfloat16) * 0.05,
        "final_norm_w": jnp.ones((cfg.hidden_size,), jnp.float32),
        "lm_head": mk(k3, cfg.hidden_size, cfg.vocab_size),
    }
    _add_aux(params, cfg)
    return params


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "native"),
                   donate_argnums=(3,))
def dec(params, token, pos, cache, cfg, n_steps, native):
    params = prepare_params(params, native=native)

    def body(carry, _):
        token, pos, cache = carry
        logits, cache = forward(params, token, pos, cache, cfg,
                                logits_dtype=jnp.float32)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        return (nxt[:, None], pos + 1, cache), (nxt, logits[:, -1])

    carry, (toks, lg) = jax.lax.scan(body, (token, pos, cache), None,
                                     length=n_steps)
    return toks, lg


def run(params, native, n_steps=24):
    prompt = np.arange(1, 9, dtype=np.int32)[None, :]
    cache = init_cache(CFG, 1, 128)
    logits, cache = model_step(params, jnp.asarray(prompt),
                               jnp.zeros((1,), jnp.int32), cache, CFG)
    tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
    toks, lg = dec(params, tok, jnp.asarray([prompt.shape[1]], jnp.int32),
                   cache, CFG, n_steps, native)
    return np.asarray(toks)[:, 0], np.asarray(lg)


def main():
    print("backend:", jax.default_backend(), flush=True)
    params = make_params(CFG)

    t_pack, lg_pack = run(params, native=False)
    t_nat, lg_nat = run(params, native=True)

    # XLA-oracle on the same chip: force the fallback by a flag env var?
    # Instead compare against per-step model_step with force='xla' qmatmul:
    import importlib
    qm = importlib.import_module("neural_tpu.ops.qmatmul")
    tr = importlib.import_module("neural_tpu.models.transformer")
    orig = qm.qmatmul
    forced = functools.partial(orig, force="xla")
    qm.qmatmul = forced
    tr.qmatmul = forced
    jax.clear_caches()
    try:
        t_ref, lg_ref = run(params, native=False)
    finally:
        qm.qmatmul = orig
        tr.qmatmul = orig

    print("tokens packed :", t_pack.tolist())
    print("tokens native :", t_nat.tolist())
    print("tokens xla-ref:", t_ref.tolist())
    agree_p = int((t_pack == t_ref).sum())
    agree_n = int((t_nat == t_ref).sum())
    print(f"agreement packed {agree_p}/{len(t_ref)}, native {agree_n}/{len(t_ref)}")
    def rms(a, b):
        return float(np.sqrt(np.mean((a - b) ** 2)))
    scale = float(np.sqrt(np.mean(lg_ref[0] ** 2)))
    print("step0 logit rms/scale packed vs ref:", rms(lg_pack[0], lg_ref[0]) / scale)
    print("step0 logit rms/scale native vs ref:", rms(lg_nat[0], lg_ref[0]) / scale)
    print("step0 logit rms/scale packed vs native:", rms(lg_pack[0], lg_nat[0]) / scale)


if __name__ == "__main__":
    main()
