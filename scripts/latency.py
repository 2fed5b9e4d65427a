"""Percentile latency harness + perf-regression gate.

TPU analog of the reference model-test harness
(tests/model-test/cpp_graph_inference.sh runs run_<arch> over a matrix of
cores × batch × input-len and calculate_percentiles.py:101-110 reports
first-token latency, mean next-token latency, P90, P99, total) and of the
CI "Performance Regression" gate (.github/workflows/cpp-graph-test.yml:155).

Usage:
  python scripts/latency.py --out lat.json                 # measure
  python scripts/latency.py --out lat.json --gate base.json --tol 0.10

Measurement notes (docs/design.md §8): on the tunneled runtime
block_until_ready doesn't block, so "mean" latencies are slope-timed
(dispatch RTT cancels); P90/P99 come from individual per-step walls and
therefore include one host↔device round trip each — they are upper bounds,
reported with the measured dispatch floor for context.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fetch(x):
    import jax.numpy as jnp
    return float(jnp.asarray(x).astype(jnp.float32).reshape(-1)[0])


def measure_config(params, cfg, batch, input_len, n_new, S):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from neural_tpu.runtime import init_cache
    from neural_tpu.runtime.generate import decode_loop, model_step

    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, input_len)),
                       jnp.int32)
    start = jnp.zeros((batch,), jnp.int32)

    # --- first token (prefill) ---------------------------------------------
    def prefill_once():
        cache = init_cache(cfg, batch, S)
        t0 = time.time()
        logits, cache = model_step(params, toks, start, cache, cfg)
        nxt = jnp.argmax(logits[:, -1], -1)
        fetch(nxt)
        return time.time() - t0, cache

    prefill_once()  # compile
    first_ms, cache = min(
        ((t, c) for t, c in (prefill_once() for _ in range(3))),
        key=lambda tc: tc[0])
    first_ms *= 1e3

    # --- next-token mean via slope (dispatch-free) --------------------------
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, 1)), jnp.int32)

    def run_chain(n):
        c = init_cache(cfg, batch, S)
        pos = jnp.full((batch,), input_len, jnp.int32)
        out, _ = decode_loop(params, tok, pos, c, cfg, n)
        return fetch(out[-1, 0])

    lo, hi = 4, 4 + max(8, n_new)
    run_chain(lo); run_chain(hi)

    def timed(n):
        best = 1e9
        for _ in range(3):
            t0 = time.time(); run_chain(n); best = min(best, time.time() - t0)
        return best
    mean_ms = (timed(hi) - timed(lo)) / (hi - lo) * 1e3

    # --- per-step walls → percentiles (include 1 dispatch RTT each) ---------
    pos = jnp.full((batch,), input_len, jnp.int32)
    walls = []
    t = tok
    for i in range(n_new):
        t0 = time.time()
        logits, cache = model_step(params, t, pos + i, cache, cfg)
        t = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
        fetch(t)
        walls.append((time.time() - t0) * 1e3)
    walls = np.asarray(walls[1:])  # drop the compile/warm step

    # dispatch floor: a no-op fetch round trip
    zero = jnp.zeros(())
    floors = []
    for _ in range(5):
        t0 = time.time(); fetch(zero + 1); floors.append((time.time() - t0) * 1e3)
    return {
        "batch": batch, "input_len": input_len, "n_new": n_new,
        "first_token_ms": round(first_ms, 2),
        "next_token_mean_ms": round(mean_ms, 3),
        "next_token_p90_ms": round(float(np.percentile(walls, 90)), 2),
        "next_token_p99_ms": round(float(np.percentile(walls, 99)), 2),
        "total_ms": round(first_ms + mean_ms * (n_new - 1), 1),
        "dispatch_floor_ms": round(float(np.median(floors)), 2),
        "tokens_per_sec": round(1000.0 / max(mean_ms, 1e-9), 2),
    }


def gate(results, baseline_path, tol):
    """Fail (exit 1) if any metric regressed more than ``tol`` vs baseline
    (reference: 'Performance Regression' CI gate)."""
    with open(baseline_path) as f:
        base = json.load(f)
    bmap = {(r["batch"], r["input_len"]): r for r in base["results"]}
    worst = []
    for r in results:
        b = bmap.get((r["batch"], r["input_len"]))
        if b is None:
            continue
        for key in ("first_token_ms", "next_token_mean_ms"):
            if r[key] > b[key] * (1 + tol):
                worst.append((r["batch"], r["input_len"], key, b[key], r[key]))
    if worst:
        for w in worst:
            print(f"REGRESSION batch={w[0]} in={w[1]} {w[2]}: "
                  f"{w[3]:.2f} → {w[4]:.2f} ms", file=sys.stderr)
        return 1
    print("perf gate: OK", file=sys.stderr)
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", help=".gguf/.ntpu checkpoint (default: "
                    "random-weight llama2-7b int4 like bench.py)")
    ap.add_argument("--batches", default="1", help="comma list")
    ap.add_argument("--input-lens", default="32,1024,2012",
                    help="comma list (reference matrix: 32,1024,2012)")
    ap.add_argument("--n-new", type=int, default=32)
    ap.add_argument("--max-len", type=int, default=2048)
    ap.add_argument("--out", default="latency.json")
    ap.add_argument("--gate", help="baseline json to compare against")
    ap.add_argument("--tol", type=float, default=0.10)
    args = ap.parse_args()

    import jax

    if args.model:
        import neural_tpu as nt
        m = nt.Model()
        m.init_from_bin(args.model)
        params, cfg = m.params, m.cfg
    else:
        from bench import rand_quant_params, LLAMA2_7B
        cfg = LLAMA2_7B
        # q4_j: the headline precision (bench.py) — its act_bits=8 routes
        # prefill through the w4a8 kernel, so first_token_ms reflects the
        # shipped TTFT path (round 5; was q4_0/act16 before)
        params = rand_quant_params(cfg, quant="q4_j")

    results = []
    for b in map(int, args.batches.split(",")):
        for il in map(int, args.input_lens.split(",")):
            S = max(args.max_len, il + args.n_new)
            S = -(-S // 512) * 512
            r = measure_config(params, cfg, b, il, args.n_new, S)
            print(json.dumps(r), file=sys.stderr)
            results.append(r)

    report = {"device": str(jax.devices()[0]), "results": results}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    if args.gate:
        sys.exit(gate(results, args.gate, args.tol))


if __name__ == "__main__":
    main()
