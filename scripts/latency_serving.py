"""Serving decode-latency percentiles under arrivals (chip harness).

Drives the continuous-batching Scheduler with a Poisson short-request
stream plus ONE long-prompt injection, and reports per-step decode-latency
percentiles with chunked prefill ON vs OFF — the scheduler-level analog of
the reference CI's percentile tracking
(tests/model-test/calculate_percentiles.py:101-110) applied to the mixed
prefill+decode policy (reference scheduler.cpp:355 prefill-defer; our
chunked interleave bounds the decode stall at one chunk's prefill).

The design intent: with chunking, the worst decode stall under a
long-prompt arrival is bounded by ONE chunk's prefill instead of the
whole prompt's. Measured caveat (baselines/serving_tpu.json note): on the
tunneled chip the per-step RTT (~30 ms) already exceeds a 1536-token
prefill's marginal cost, so chunked and single-shot p50/p90 match there,
and sporadic multi-second runtime stalls own the p99 — gate p50/p90.

Usage:
  python scripts/latency_serving.py --out baselines/serving_tpu.json
  python scripts/latency_serving.py --gate baselines/serving_tpu.json

Tunnel note: every step's wall time includes one host<->device dispatch
(~30 ms RTT on axon); the dispatch floor is measured and reported so the
percentiles can be read net of it.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_case(params, cfg, prefill_chunk, max_len, long_T, seed=0,
             n_steps=120, arrival_p=0.10):
    import numpy as np
    from neural_tpu.runtime.sampling import SamplingParams
    from neural_tpu.serving.scheduler import Scheduler

    rng = np.random.default_rng(seed)
    sched = Scheduler(params, cfg, max_batch=4, max_len=max_len,
                      kv_dtype="int8", prefill_chunk=prefill_chunk,
                      sampling=SamplingParams(greedy=True,
                                              repeat_penalty=1.0))

    def prompt(n):
        return rng.integers(1, cfg.vocab_size, n).tolist()

    # warm the executables (short and long prefill buckets + decode)
    # before timing — mid-run compiles would otherwise dominate p99
    sched.add_request("warm", prompt(64), max_new_tokens=4)
    sched.add_request("warm_long", prompt(long_T), max_new_tokens=2)
    while sched.has_work:
        sched.step()
    sched.pop_finished()

    n_req = 0
    decode_ms = []
    injected = False
    for i in range(n_steps):
        if rng.random() < arrival_p and len(sched.waiting) < 2:
            n_req += 1
            sched.add_request(f"r{n_req}", prompt(64), max_new_tokens=48)
        if i == 20:  # the long-prompt injection
            injected = True
            sched.add_request("long", prompt(long_T), max_new_tokens=16)
        had_decode = bool(sched.running)
        t0 = time.time()
        sched.step()
        dt = (time.time() - t0) * 1e3
        if had_decode:
            decode_ms.append(dt)
        sched.pop_finished()
    while sched.has_work:
        sched.step()
        sched.pop_finished()
    assert injected
    arr = np.asarray(decode_ms)
    return {
        "n_decode_steps": int(arr.size),
        "p50_ms": round(float(np.percentile(arr, 50)), 2),
        "p90_ms": round(float(np.percentile(arr, 90)), 2),
        "p99_ms": round(float(np.percentile(arr, 99)), 2),
        "max_ms": round(float(arr.max()), 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out")
    ap.add_argument("--gate", help="baseline json to compare against")
    ap.add_argument("--tol", type=float, default=0.25)
    ap.add_argument("--tiny", action="store_true",
                    help="small model (CPU smoke of the harness)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.tiny:
        os.environ.setdefault("NTPU_BENCH_TINY", "1")
        jax.config.update("jax_platforms", "cpu")  # harness smoke: CPU
    from bench import _llama2_7b, rand_quant_params
    cfg = _llama2_7b()
    params = rand_quant_params(cfg)

    max_len = 512 if args.tiny else 2048
    long_T = 300 if args.tiny else 1536
    n_steps = 60 if args.tiny else 120

    # dispatch floor: the minimal host->device->host round trip
    x = jnp.zeros((8,), jnp.float32)
    f = jax.jit(lambda a: a + 1)
    f(x)
    floor = min(
        (lambda t0: (float(f(x)[0]), time.time() - t0)[1])(time.time())
        for _ in range(5)) * 1e3

    res = {"dispatch_floor_ms": round(floor, 1)}
    for name, chunk in (("chunked", 512), ("single_shot", None)):
        res[name] = run_case(params, cfg, chunk, max_len, long_T,
                             n_steps=n_steps)
        print(f"# {name}: {res[name]}", file=sys.stderr)
    ratio = res["chunked"]["p99_ms"] / max(res["chunked"]["p50_ms"], 1e-9)
    res["chunked_p99_over_p50"] = round(ratio, 2)

    print(json.dumps(res))
    if args.out:
        with open(args.out, "w") as f_:
            json.dump(res, f_, indent=1)
    if args.gate:
        with open(args.gate) as f_:
            base = json.load(f_)
        ok = True
        for name in ("chunked",):
            # p99 on the tunneled runtime is dominated by sporadic
            # multi-second allocator/compile stalls (see the baseline
            # note) — gate the stable percentiles only by default.
            # TODO(off-tunnel): on a real host the p99 exclusion rationale
            # disappears — re-record the baseline there and run with
            # NTPU_GATE_P99=1 to reinstate the p99 gate.
            keys = ("p50_ms", "p90_ms", "p99_ms") \
                if os.environ.get("NTPU_GATE_P99") else ("p50_ms", "p90_ms")
            for k in keys:
                got, want = res[name][k], base[name][k]
                if got > want * (1 + args.tol):
                    print(f"GATE FAIL {name}.{k}: {got} > {want} "
                          f"(+{args.tol:.0%})", file=sys.stderr)
                    ok = False
        if not ok:
            sys.exit(1)
        print("# gate OK (p50/p90 gated; p99 NOT gated — on the tunneled "
              "runtime it is owned by sporadic multi-second allocator/"
              "compile stalls unrelated to scheduler behavior, see "
              "baselines/serving_tpu.json note)", file=sys.stderr)


if __name__ == "__main__":
    main()
