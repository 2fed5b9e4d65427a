"""Driver benchmark: Llama-2-7B-architecture int4, single chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Headline: greedy decode tokens/sec/chip (reference baseline: 41.27 ms
next-token latency on 56-core Xeon 8480L with fused attention ON →
24.23 tok/s; BASELINE.md / docs/fused_attention.md:111).

Every leg runs in its OWN SUBPROCESS (``python bench.py --leg <name>``):
a leg's executables, weight buffers and KV caches are fully freed when it
exits, so one leg's HBM footprint never stacks on another's (the round-2
failure mode: the batch-8 leg OOMed on top of earlier legs' live
executables). A hung or failed leg forfeits only its own extras — the
headline comes from the first leg and is required.

Weights are random, generated and quantized on-device layer by layer
(numerics don't affect throughput). Timing: the tunneled backend's
block_until_ready doesn't block, so every measurement chains work inside
one jit and fetches a scalar; fixed dispatch overhead cancels via slope.
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_DECODE_TPS = 1000.0 / 41.27  # reference fused-attn next-token
BASELINE_TTFT_MS = 1475.57            # reference 1975-token prompt
LEG_TIMEOUT_S = int(os.environ.get("NTPU_BENCH_LEG_TIMEOUT", "1500"))


def _llama2_7b():
    from neural_tpu.models.config import ModelConfig
    cfg = ModelConfig(
        arch="llama", vocab_size=32000, hidden_size=4096, n_layers=32,
        n_heads=32, n_kv_heads=32, head_dim=128, intermediate_size=11008,
        norm_eps=1e-5, rope_theta=10000.0, max_seq_len=4096)
    if os.environ.get("NTPU_BENCH_TINY"):  # CPU smoke of the harness only
        import dataclasses
        cfg = dataclasses.replace(
            cfg, hidden_size=256, n_layers=2, n_heads=4, n_kv_heads=4,
            head_dim=64, intermediate_size=512, vocab_size=512)
    return cfg


# module-level alias for scripts/bench_configs.py (lazy: building it pulls
# in jax, which the orchestrator process must NOT touch)
def __getattr__(name):
    if name == "LLAMA2_7B":
        return _llama2_7b()
    raise AttributeError(name)


def rand_quant_params(cfg, quant="q4_0", seed=0):
    """Random int4 params generated on device (never materializes fp32 7B)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from neural_tpu.core import PRESETS, quantize
    from neural_tpu.convert.hf import _add_aux, _shape_for, ffn_padded_size
    from neural_tpu.convert.quant_registry import MIXED_PRESETS, QuantRegistry

    if isinstance(quant, str):
        if quant in MIXED_PRESETS:
            qcfg = MIXED_PRESETS[quant]
        else:
            qcfg = PRESETS[quant]       # loud KeyError on a typoed name
    else:
        qcfg = quant
    key = jax.random.PRNGKey(seed)

    @partial(jax.jit, static_argnames=("shape_k", "shape_n", "qc"))
    def make(key, shape_k, shape_n, qc):
        w = jax.random.normal(key, (shape_k, shape_n), jnp.float32) * 0.02
        return quantize(w, qc)

    def cfg_for(name):
        return qcfg.resolve(name) if isinstance(qcfg, QuantRegistry) else qcfg

    layer_names = ["wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"]
    per_layer = {n: [] for n in layer_names}
    norms = {"attn_norm_w": [], "ffn_norm_w": []}
    Ip = ffn_padded_size(cfg.intermediate_size)
    for i in range(cfg.n_layers):
        for n in layer_names:
            key, k2 = jax.random.split(key)
            K, N = _shape_for(n, cfg)
            # conversion-time FFN padding (convert/hf.py build_params)
            if n in ("w_gate", "w_up") and N == cfg.intermediate_size:
                N = Ip
            elif n == "w_down" and K == cfg.intermediate_size:
                K = Ip
            per_layer[n].append(make(k2, K, N, cfg_for(n)))
        for n in norms:
            norms[n].append(jnp.ones((cfg.hidden_size,), jnp.float32))
    layers = {}
    for n in layer_names:  # stack then FREE each name (halves peak HBM)
        layers[n] = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer[n])
        per_layer[n] = None
    layers.update({n: jnp.stack(v) for n, v in norms.items()})

    key, k2, k3 = jax.random.split(key, 3)
    params = {
        "layers": layers,
        "embed": (jax.random.normal(k2, (cfg.vocab_size, cfg.hidden_size),
                                    jnp.bfloat16) * 0.02),
        "final_norm_w": jnp.ones((cfg.hidden_size,), jnp.float32),
        "lm_head": make(k3, cfg.hidden_size, cfg.vocab_size,
                        cfg_for("lm_head")),
    }
    _add_aux(params, cfg)
    return params


def fetch(x):
    import jax.numpy as jnp
    return float(jnp.asarray(x).astype(jnp.float32).reshape(-1)[0])


def apply_residency(params, cfg, batch, S=2048, kv_dtype=None):
    """Automatic packed vs native-at-rest choice for the leg's decode
    shape (runtime.residency) — batch 1 keeps the fast packed path, the
    batch-8 serving shape converts to single-copy native-at-rest instead
    of OOMing on the in-jit conversion's double residency (the round-2/3
    failure). Caller MUST rebind: the packed buffers are donated."""
    import jax.numpy as jnp
    from neural_tpu.runtime.residency import ensure_decode_residency
    return ensure_decode_residency(params, cfg, batch, S,
                                   kv_dtype or jnp.bfloat16)


def bench_decode(params, cfg, S=2048, prompt_len=128, lo=4, hi=36,
                 kv_dtype=None, batch=1):
    import jax.numpy as jnp
    from neural_tpu.runtime import init_cache
    from neural_tpu.runtime.generate import decode_loop

    kv_dtype = kv_dtype or jnp.bfloat16
    token = jnp.full((batch, 1), 17, jnp.int32)

    def run(n):
        cache = init_cache(cfg, batch, S, kv_dtype)
        pos = jnp.full((batch,), prompt_len, jnp.int32)
        toks, cache = decode_loop(params, token, pos, cache, cfg, n,
                                  fill_hint=prompt_len + hi)
        return fetch(toks[-1])

    run(lo); run(hi)  # compile both

    def timed(n):  # best of 3
        best = 1e9
        for _ in range(3):
            t0 = time.time(); run(n); best = min(best, time.time() - t0)
        return best
    t_lo, t_hi = timed(lo), timed(hi)
    per_tok = (t_hi - t_lo) / (hi - lo)
    return batch / per_tok, per_tok * 1e3


def bench_prefill(params, cfg, T=1975, S=2048, kv_dtype=None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial
    from neural_tpu.models.transformer import forward
    from neural_tpu.runtime import init_cache

    kv_dtype = kv_dtype or jnp.bfloat16
    tokens = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (1, T), np.int32))
    start = jnp.zeros((1,), jnp.int32)

    @partial(jax.jit, static_argnames=("n",))
    def chain(params, tokens, n):
        def body(i, tok):
            cache = init_cache(cfg, 1, S, kv_dtype)
            # last-token logits only (forward's logit_positions) — what
            # the generate prefill actually computes, and what the
            # reference's model_eval computes (logits for the last
            # position unless logits_all): skips the dead [T, V] vocab
            # matmul + 250 MB f32 materialization
            logits, _ = forward(params, tok, start, cache, cfg,
                                logits_dtype=jnp.bfloat16,
                                logit_positions=jnp.asarray([T - 1],
                                                            jnp.int32))
            bump = (logits[0, -1, :1] * 0).astype(jnp.int32)
            return tok.at[0, 0].set(tok[0, 0] + bump[0])
        return jax.lax.fori_loop(0, n, body, tokens)[0, 0]

    def timed(n):
        fetch(chain(params, tokens, n))
        best = 1e9
        for _ in range(2):
            t0 = time.time(); fetch(chain(params, tokens, n))
            best = min(best, time.time() - t0)
        return best
    t1, t3 = timed(1), timed(3)
    return (t3 - t1) / 2 * 1e3  # ms per prefill


# ---------------------------------------------------------------------------
# Legs (each runs in its own subprocess; prints one JSON dict on stdout)
# ---------------------------------------------------------------------------


def leg_decode():
    """fill-128 and fill-1975 greedy decode, bf16 KV. Headline source.

    Config: q4_j (int4 g128 sym) — the SAME precision as the reference's
    headline 41.27 ms next-token number ("llama-7b q4j",
    docs/fused_attention.md:105-115; cpp_graph_inference.sh:427 int4
    g128 sym). q4_0 (g32) is tracked in its own leg: its 4x scale bytes
    cost ~0.33 ms/tok of pure HBM streaming on the bandwidth-bound step."""
    cfg = _llama2_7b()
    params = rand_quant_params(cfg, quant="q4_j")
    params = apply_residency(params, cfg, batch=1)   # keeps packed (fits)
    tps, ms = bench_decode(params, cfg)
    _, ms_1975 = bench_decode(params, cfg, prompt_len=1975)
    return {"decode_tps": tps, "next_token_ms": ms,
            "next_token_ms_fill1975": ms_1975, "headline_quant": "q4_j"}


def leg_decode_q40():
    """fill-128 decode at q4_0 (BASELINE config 1's GGUF precision)."""
    cfg = _llama2_7b()
    params = rand_quant_params(cfg, quant="q4_0")
    params = apply_residency(params, cfg, batch=1)
    _, ms = bench_decode(params, cfg)
    return {"next_token_ms_q4_0": ms,
            "decode_tps_q4_0": round(1000.0 / ms, 2)}


def leg_decode_i8kv():
    """fill-1975 decode with int8 KV (the reference's packed-KV default)."""
    cfg = _llama2_7b()
    params = rand_quant_params(cfg)
    params = apply_residency(params, cfg, batch=1, kv_dtype="int8")
    _, ms = bench_decode(params, cfg, prompt_len=1975, kv_dtype="int8")
    return {"next_token_ms_fill1975_int8kv": ms}


def leg_batch8():
    """batch-8 aggregate decode (continuous-batching serving shape).

    int8 KV: the serving default, and the config that fits one 16 GB chip
    next to the model — batch-8 bf16 KV at S=2048 is ~8.6 GB which with
    packed+converted weights exceeded HBM (round-2 OOM)."""
    cfg = _llama2_7b()
    params = rand_quant_params(cfg)
    params = apply_residency(params, cfg, batch=8, kv_dtype="int8")
    tps, step_ms = bench_decode(params, cfg, batch=8, kv_dtype="int8")
    return {"batch8_agg_tokens_per_sec": tps, "batch8_step_ms": step_ms,
            "batch8_kv_dtype": "int8"}


def leg_prefill():
    """1975-token prompt TTFT at the q4_j headline precision (its
    act_bits=8 routes prefill GEMMs through the int8-compute kernel —
    199 vs 141 TF/s measured), bf16 and int8 KV."""
    cfg = _llama2_7b()
    params = rand_quant_params(cfg, quant="q4_j")
    ttft = bench_prefill(params, cfg)
    ttft_i8 = bench_prefill(params, cfg, kv_dtype="int8")
    return {"ttft_1975_ms": ttft, "ttft_1975_int8kv_ms": ttft_i8,
            "ttft_quant": "q4_j (w4a8 prefill)"}


LEGS = {
    "decode": leg_decode,
    "decode_q40": leg_decode_q40,
    "decode_i8kv": leg_decode_i8kv,
    "batch8": leg_batch8,
    "prefill": leg_prefill,
}


def run_leg_subprocess(name):
    """Run one leg isolated; returns (dict | None, err_string | None)."""
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg", name],
            capture_output=True, text=True, timeout=LEG_TIMEOUT_S)
    except subprocess.TimeoutExpired:
        return None, f"{name}: timeout after {LEG_TIMEOUT_S}s"
    dt = time.time() - t0
    if proc.returncode != 0:
        tail = (proc.stderr or "")[-2000:]
        return None, f"{name}: rc={proc.returncode} after {dt:.0f}s: {tail}"
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line), None
            except json.JSONDecodeError:
                continue
    return None, f"{name}: no JSON in output: {proc.stdout[-500:]}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", choices=sorted(LEGS))
    args = ap.parse_args()

    if args.leg:
        out = LEGS[args.leg]()
        print(json.dumps(out))
        return

    extras, errors = {}, []
    decode_samples = []
    for name in ("decode", "decode", "decode_q40", "decode_i8kv", "batch8",
                 "prefill"):
        # the headline decode leg runs TWICE and keeps the faster sample:
        # HBM buffer placement is fixed per process and adds ±0.2 ms/tok
        # of cross-process variance on the tunneled runtime (device time
        # from the jax trace is stable at 4.96 ms/tok q4_j). BOTH samples
        # are recorded in the output (next_token_ms_samples) so the
        # methodology is visible and any baseline comparison can use the
        # same best-of-2 policy (round-4 advisor note).
        res, err = run_leg_subprocess(name)
        if res is not None:
            if name == "decode":
                decode_samples.append(res["next_token_ms"])
                if "next_token_ms" in extras \
                        and res["next_token_ms"] >= extras["next_token_ms"]:
                    res = {}
            extras.update(res)
            print(f"# leg {name}: {res}", file=sys.stderr)
        elif name == "decode" and "next_token_ms" in extras:
            # second headline sample failed but the first stands — noise
            # reduction is best-effort, not a new failure mode
            print(f"# leg decode resample failed (kept 1st): {err}",
                  file=sys.stderr)
        else:
            errors.append(err)
            print(f"# leg FAILED {err}", file=sys.stderr)

    tps = extras.pop("decode_tps", None)
    if tps is None:
        print(json.dumps({"metric": "bench_failed", "value": 0,
                          "unit": "tokens/s", "vs_baseline": 0,
                          "errors": errors}))
        sys.exit(1)

    if len(decode_samples) > 1:
        extras["next_token_ms_samples"] = [round(s, 3)
                                           for s in decode_samples]
    if "next_token_ms_fill1975" in extras:
        extras["decode_tps_fill1975"] = round(
            1000.0 / extras["next_token_ms_fill1975"], 2)
    if "ttft_1975_ms" in extras:
        extras["ttft_vs_baseline"] = round(
            BASELINE_TTFT_MS / max(extras["ttft_1975_ms"], 1e-9), 2)
    extras["baseline_next_token_ms"] = 41.27
    extras["baseline_ttft_ms"] = BASELINE_TTFT_MS
    extras = {k: (round(v, 2) if isinstance(v, float) else v)
              for k, v in extras.items()}
    if errors:
        extras["leg_errors"] = errors

    print(json.dumps({
        "metric": "llama2_7b_int4_decode_tokens_per_sec_per_chip",
        "value": round(tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tps / BASELINE_DECODE_TPS, 2),
        "extra": extras,
    }))


if __name__ == "__main__":
    main()
