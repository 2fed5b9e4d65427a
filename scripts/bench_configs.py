"""BASELINE.json target-config benchmarks (real chip, random weights).

Configs (BASELINE.md):
  1. llama7b-q4       Llama-2-7B q4_0 g=32 greedy decode      (== bench.py)
  2. mistral-gptq     Mistral-7B int4 asym g=128 act-order + int8 KV
  3. llama7b-server   Llama-2-7B int8 weights, continuous-batching server
  4. qwen-oddbit      Qwen-7B-shaped int3/int5 + shift-RoPE streaming
  5. 70b-tp           multi-host TP — validated via dryrun_multichip (no
                      second host in this environment)

Usage: python scripts/bench_configs.py [config ...]
Weights are random (throughput doesn't depend on values); numerical
correctness of each path is pinned separately in tests/.
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from neural_tpu.core import PRESETS, quantize, QuantConfig
from neural_tpu.models.config import ModelConfig
from neural_tpu.runtime import init_cache
from neural_tpu.runtime.generate import decode_loop

sys.path.insert(0, "/root/repo")
from bench import LLAMA2_7B, rand_quant_params, fetch, BASELINE_DECODE_TPS

MISTRAL_7B = ModelConfig(
    arch="mistral", vocab_size=32000, hidden_size=4096, n_layers=32,
    n_heads=32, n_kv_heads=8, head_dim=128, intermediate_size=14336,
    max_seq_len=4096)

QWEN_7B = ModelConfig(
    arch="qwen2", vocab_size=151936, hidden_size=4096, n_layers=32,
    n_heads=32, n_kv_heads=32, head_dim=128, intermediate_size=11008,
    max_seq_len=4096)


def rand_params(cfg, qcfg, seed=0):
    """rand_quant_params with an arbitrary QuantConfig."""
    import bench
    name = f"__cfg_{id(qcfg)}"
    PRESETS[name] = qcfg
    try:
        return bench.rand_quant_params(cfg, quant=name, seed=seed)
    finally:
        del PRESETS[name]


def slope_decode(params, cfg, S=2048, fill=128, lo=4, hi=36,
                 cache_dtype=jnp.bfloat16):
    token = jnp.asarray([[17]], jnp.int32)

    def run(n):
        cache = init_cache(cfg, 1, S, cache_dtype)
        toks, _ = decode_loop(params, token, jnp.asarray([fill], jnp.int32),
                              cache, cfg, n)
        return fetch(toks[-1])

    run(lo); run(hi)

    def timed(n):
        best = 1e9
        for _ in range(3):
            t0 = time.time(); run(n); best = min(best, time.time() - t0)
        return best
    return (timed(hi) - timed(lo)) / (hi - lo)


def cfg2_mistral_gptq():
    """int4 asym g=128 with act-order perms + int8 KV cache.

    Perm layout matches a real GPTQ import (convert/gptq.py): q/k/v share
    one g_idx (same Hessian), gate/up share one, w_down's perm is folded
    into gate/up output columns, wo keeps its own — and fuse_layer_weights
    merges qkv / gate-up so decode pays 3 shared activation gathers per
    layer instead of 6.
    """
    from neural_tpu.core.qtensor import QTensor
    from neural_tpu.runtime.generate import fuse_layer_weights
    qcfg = QuantConfig(bits=4, group_size=128, sym=False)
    params = rand_params(MISTRAL_7B, qcfg)
    rng = np.random.default_rng(0)
    layers = dict(params["layers"])
    L = layers["wq"].planes[0].shape[0]
    D = MISTRAL_7B.hidden_size

    def perms(k):
        return jnp.asarray(np.stack([rng.permutation(k) for _ in range(L)]),
                           jnp.int32)
    pq, po, pg = perms(D), perms(D), perms(D)
    for n, p in (("wq", pq), ("wk", pq), ("wv", pq), ("wo", po),
                 ("w_gate", pg), ("w_up", pg)):
        qt = layers[n]
        layers[n] = QTensor(qt.planes, qt.scales, qt.zeros, p, qt.cfg)
    params = fuse_layer_weights(dict(params, layers=layers), MISTRAL_7B)
    dt = slope_decode(params, MISTRAL_7B, cache_dtype="int8")
    return {"config": "mistral7b_gptq_int4_asym_actorder_int8kv",
            "next_token_ms": round(dt * 1e3, 2),
            "tokens_per_sec": round(1 / dt, 1)}


def cfg5_alibi_sliding():
    """Fused-kernel coverage shapes: MPT-7B (ALiBi) and a Gemma-2-styled 7B
    (per-layer sliding + softcaps) — both must decode on the Pallas kernel
    within ~10% of the plain llama shape (VERDICT r1 item 2)."""
    import dataclasses
    out = {}
    qcfg = QuantConfig(bits=4, group_size=32, sym=True)

    llama = LLAMA2_7B
    dt0 = slope_decode(rand_params(llama, qcfg), llama)
    out["llama7b_next_token_ms"] = round(dt0 * 1e3, 2)

    mpt = ModelConfig(
        arch="mpt", vocab_size=50432, hidden_size=4096, n_layers=32,
        n_heads=32, n_kv_heads=32, head_dim=128, intermediate_size=16384,
        max_seq_len=2048, use_alibi=True, rope_style="none",
        norm_type="layernorm", mlp_gated=False, act="gelu")
    dt = slope_decode(rand_params(mpt, qcfg), mpt)
    out["mpt7b_alibi_next_token_ms"] = round(dt * 1e3, 2)
    # mpt has a larger FFN (no gating): compare per-GB streamed instead of
    # absolute — report the ratio for the gate
    out["mpt_vs_llama"] = round(dt / dt0, 3)

    g2 = dataclasses.replace(
        LLAMA2_7B, arch="gemma2", sliding_window=1024, attn_softcap=50.0,
        logit_softcap=30.0)
    params = rand_params(g2, qcfg)
    # per-layer alternating sliding flags (gemma-2: every other layer)
    params["layers"]["use_sliding"] = jnp.asarray(
        [l % 2 == 0 for l in range(g2.n_layers)])
    dt = slope_decode(params, g2)
    out["gemma2_7bshape_sliding_next_token_ms"] = round(dt * 1e3, 2)
    out["gemma2_vs_llama"] = round(dt / dt0, 3)
    return {"config": "alibi_sliding_kernel_coverage", **out}


def cfg3_server():
    """Llama-2-7B int8 weights, continuous-batching server throughput.

    Three schedulers over the same weights: per-token host stepping
    (decode_block=1 — the tunneled runtime pays a measured ~229 ms
    dispatch+fetch RTT, so this is the known-slow path), decode_block=8
    and 16 (N on-device steps per host round trip — reference analog:
    the decode-only phases of scheduler.cpp:355), and decode_block=8
    over the paged KV pool. The committed serving capability is the
    blk8/blk16/paged rows; all are TUNNEL-RTT-BOUND (see tunnel_rtt in
    the output), not device-bound.
    """
    import jax.numpy as jnp
    from neural_tpu.runtime.residency import ensure_decode_residency
    from neural_tpu.serving.scheduler import Scheduler
    qcfg = QuantConfig(bits=8, group_size=32, sym=True)
    params = rand_params(LLAMA2_7B, qcfg)
    # residency once up front (native-at-rest at this serving shape);
    # the schedulers then share the converted tree untouched
    params = ensure_decode_residency(params, LLAMA2_7B, 8, 512,
                                     jnp.bfloat16)
    rng = np.random.default_rng(0)
    n_req, plen, new = 12, 128, 64
    out = {"config": "llama7b_int8_cont_batching_server",
           "requests": n_req, "new_tokens": n_req * new}
    # measure the tunnel's dispatch+fetch round-trip: with decode_block=B
    # the wall floor is ~(#blocks + #prefills) * 2 * RTT — on this
    # runtime the aggregate is RTT-BOUND, not device-bound (the blk16
    # sweep: 8->138.7, 16->150.1, 32->116.3, 64->128.9 tok/s while the
    # same weights decode 905+ tok/s aggregate in one on-device loop).
    # A real-host deployment has ~none of this floor.
    x = jnp.zeros(())
    t0 = time.time()
    for _ in range(10):
        x = (x + 1.0); float(jax.device_get(x))
    out["tunnel_rtt"] = round((time.time() - t0) / 10 * 1e3, 1)  # ms; informational, not gated
    for tag, kw in [("", {}),
                    ("blk8_", {"decode_block": 8}),
                    ("blk16_", {"decode_block": 16}),
                    ("blk8_paged_", {"decode_block": 8,
                                     "kv_mode": "paged",
                                     "page_size": 64})]:
        sched = Scheduler(params, LLAMA2_7B, max_batch=8, max_len=512, **kw)
        for i in range(n_req):
            sched.add_request(f"q{i}",
                              rng.integers(0, 32000, plen).tolist(),
                              max_new_tokens=new)
        sched.run_to_completion()   # compile pass
        for i in range(n_req):
            sched.add_request(f"w{i}",
                              rng.integers(0, 32000, plen).tolist(),
                              max_new_tokens=new)
        t0 = time.time()
        sched.run_to_completion()
        wall = time.time() - t0
        out[tag + "wall_s"] = round(wall, 2)
        out[tag + "agg_tokens_per_sec"] = round(n_req * new / wall, 1)
        del sched
    return out


def cfg4_qwen_oddbit():
    """int3 / int5 odd-bit decode + shift-RoPE streaming overhead."""
    from neural_tpu.runtime.generate import prepare_params
    out = {}
    for bits in (3, 5):
        qcfg = QuantConfig(bits=bits, group_size=32, sym=True)
        params = rand_params(QWEN_7B, qcfg)
        # convert to native codes up front WITH DONATION: the 152k-vocab
        # qwen shape OOMs when the packed planes stay alive next to the
        # native copies inside decode_loop's own conversion
        params = jax.jit(prepare_params, donate_argnums=0)(params)
        dt = slope_decode(params, QWEN_7B)
        out[f"int{bits}_next_token_ms"] = round(dt * 1e3, 2)
        if bits == 3:
            # streaming overhead: decode at near-full cache with periodic
            # compact-and-shift vs plain decode at the same fill
            from neural_tpu.runtime.streaming import shift_cache
            S, n_keep, n_disc = 2048, 4, 512
            dt_fix = slope_decode(params, QWEN_7B, S=S, fill=S - 600)
            cache = init_cache(QWEN_7B, 1, S)
            inv = params.get("rope_inv_freqs")

            @jax.jit
            def do_shift(cache):
                return shift_cache(cache, inv, QWEN_7B, n_keep, n_disc)
            do_shift(cache)
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                c2 = do_shift(cache)
                fetch(c2[0][0, 0, 0, 0])
                best = min(best, time.time() - t0)
            # amortized: one shift per n_disc tokens
            ovh = best / n_disc
            out["int3_stream_overhead_pct"] = round(
                100 * ovh / dt_fix, 2)
    return {"config": "qwen7b_oddbit_streaming", **out}


def cfg6_paged_prefill():
    """Paged vs slots prefill at 2k tokens (round-5: attend_paged's T>1
    path now routes the gathered pages through the Pallas flash_prefill
    kernel instead of materializing the [B, Hkv, G, T, S] scores via
    attend_xla — the reference's fused-prefill win, docs/
    fused_attention.md). Target: paged within ~10% of slots."""
    from neural_tpu.models.transformer import forward
    from neural_tpu.runtime.paged import init_paged_cache, PagedKVCache

    cfg = LLAMA2_7B
    params = rand_quant_params(cfg, quant="q4_j")
    T = 2048 if not os.environ.get("NTPU_BENCH_TINY") else 256
    S, ps = T, 256
    tokens = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (1, T), np.int32))
    start = jnp.zeros((1,), jnp.int32)

    def timed(mk_cache):
        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(params, tokens, n):
            def body(i, tok):
                logits, _ = forward(params, tok, start, mk_cache(), cfg,
                                    logits_dtype=jnp.bfloat16)
                bump = (logits[0, -1, :1] * 0).astype(jnp.int32)
                return tok.at[0, 0].set(tok[0, 0] + bump[0])
            return jax.lax.fori_loop(0, n, body, tokens)[0, 0]

        def t(n):
            fetch(chain(params, tokens, n))
            best = 1e9
            for _ in range(2):
                t0 = time.time()
                fetch(chain(params, tokens, n))
                best = min(best, time.time() - t0)
            return best
        return (t(3) - t(1)) / 2 * 1e3

    slots_ms = timed(lambda: init_cache(cfg, 1, S, jnp.bfloat16))
    maxp = S // ps
    table = jnp.arange(maxp, dtype=jnp.int32).reshape(1, maxp)

    def mk_paged():
        pool = init_paged_cache(cfg, 1, S, page_size=ps, dtype=jnp.bfloat16)
        return PagedKVCache(*pool[:4], table)
    paged_ms = timed(mk_paged)
    return {"config": "paged_prefill_parity",
            "slots_prefill_ms": round(slots_ms, 2),
            "paged_prefill_ms": round(paged_ms, 2),
            "paged_over_slots": round(paged_ms / slots_ms, 3)}


def gate_results(lines, base_path, tol=0.15):
    """Compare measured config rows against the committed baseline
    (baselines/configs_tpu.json): *_ms keys fail when >tol above the
    baseline, *tokens_per_sec keys when >tol below (reference analog:
    the cpp-graph-test 'Performance Regression' CI gate)."""
    with open(base_path) as f:
        base = {r["config"]: r for r in json.load(f)["results"]}
    ok = True
    for line in lines:
        got = json.loads(line)
        want = base.get(got.get("config"))
        if want is None:
            continue
        for k, wv in want.items():
            if k not in got or not isinstance(wv, (int, float)):
                continue
            gv = got[k]
            if k.endswith("_ms") and gv > wv * (1 + tol):
                print(f"GATE FAIL {got['config']}.{k}: {gv} > {wv} "
                      f"(+{tol:.0%})", file=sys.stderr)
                ok = False
            elif "tokens_per_sec" in k and gv < wv * (1 - tol):
                print(f"GATE FAIL {got['config']}.{k}: {gv} < {wv} "
                      f"(-{tol:.0%})", file=sys.stderr)
                ok = False
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="*",
                    default=["mistral-gptq", "qwen-oddbit", "server",
                             "alibi-sliding"])
    ap.add_argument("--gate", help="baseline json (configs_tpu.json) to "
                    "fail against on regression")
    args = ap.parse_args()
    if os.environ.get("NTPU_BENCH_TINY"):  # CPU smoke test of the harness
        import dataclasses
        global MISTRAL_7B, QWEN_7B
        tiny = dict(hidden_size=256, n_layers=2, n_heads=4, n_kv_heads=2,
                    head_dim=64, intermediate_size=512, vocab_size=512)
        MISTRAL_7B = dataclasses.replace(MISTRAL_7B, **tiny)
        QWEN_7B = dataclasses.replace(QWEN_7B, **tiny)
        import bench
        bench.LLAMA2_7B = dataclasses.replace(
            bench.LLAMA2_7B, **dict(tiny, n_kv_heads=4))
        globals()["LLAMA2_7B"] = bench.LLAMA2_7B
    fns = {"mistral-gptq": cfg2_mistral_gptq, "server": cfg3_server,
           "qwen-oddbit": cfg4_qwen_oddbit, "alibi-sliding": cfg5_alibi_sliding,
           "paged-prefill": cfg6_paged_prefill}
    if len(args.configs) > 1 and not os.environ.get("NTPU_SUBPROC"):
        # one fresh process per config: a prior 7B model's HBM
        # fragmentation OOMs the next one on the 16 GB chip
        import subprocess
        lines = []
        for name in args.configs:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), name],
                env={**os.environ, "NTPU_SUBPROC": "1"},
                capture_output=True, text=True)
            sys.stderr.write(p.stderr)
            for ln in p.stdout.strip().splitlines():
                print(ln, flush=True)
                if ln.startswith("{"):
                    lines.append(ln)
        if args.gate and not gate_results(lines, args.gate):
            sys.exit(1)
        return
    out_lines = []
    for name in args.configs:
        t0 = time.time()
        res = fns[name]()
        res["measure_s"] = round(time.time() - t0, 1)
        line = json.dumps(res)
        out_lines.append(line)
        print(line, flush=True)
    if args.gate and not gate_results(out_lines, args.gate):
        sys.exit(1)


if __name__ == "__main__":
    main()
