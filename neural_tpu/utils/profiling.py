"""Eval-time verbosity + per-op profiling.

Reference: ``NEURAL_SPEED_VERBOSE`` ∈ {0,1,2} (README "Performance
profiling"), per-node perf counters (ne.h:186) aggregated by
ne_graph_profiling (ne_layers.c:12030), and model_print_timings
(model_utils.cpp:1903).

Here: ``NEURAL_TPU_VERBOSE=1`` prints per-phase wall times from the
generation loops; ``=2`` additionally captures a jax profiler trace per
generate call and prints the top device ops (the XLA analog of the per-op
table).
"""
from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import os
import time
from typing import Optional


def verbosity() -> int:
    try:
        return int(os.environ.get("NEURAL_TPU_VERBOSE", "0"))
    except ValueError:
        return 0


class Timings:
    """Accumulates phase timings (model_print_timings analog)."""

    def __init__(self):
        self.load_ms = 0.0
        self.prefill_ms = 0.0
        self.prefill_tokens = 0
        self.decode_ms = 0.0
        self.decode_tokens = 0

    @contextlib.contextmanager
    def phase(self, name: str, tokens: int = 0):
        t0 = time.time()
        yield
        dt = (time.time() - t0) * 1e3
        if name == "load":
            self.load_ms += dt
        elif name == "prefill":
            self.prefill_ms += dt
            self.prefill_tokens += tokens
        elif name == "decode":
            self.decode_ms += dt
            self.decode_tokens += tokens

    def report(self) -> str:
        lines = ["neural-tpu timings:"]
        if self.load_ms:
            lines.append(f"  load    : {self.load_ms:9.2f} ms")
        if self.prefill_tokens:
            lines.append(
                f"  prefill : {self.prefill_ms:9.2f} ms / "
                f"{self.prefill_tokens} tok "
                f"({self.prefill_ms / max(self.prefill_tokens, 1):.2f} ms/tok)")
        if self.decode_tokens:
            lines.append(
                f"  decode  : {self.decode_ms:9.2f} ms / "
                f"{self.decode_tokens} tok "
                f"({self.decode_ms / max(self.decode_tokens, 1):.2f} ms/tok)")
        return "\n".join(lines)

    def print_if_verbose(self):
        if verbosity() >= 1:
            print(self.report(), flush=True)


@contextlib.contextmanager
def maybe_trace(tag: str = "generate", top: int = 12):
    """At NEURAL_TPU_VERBOSE>=2, trace the block and print top device ops
    (the per-op profiling table analog)."""
    if verbosity() < 2:
        yield
        return
    import jax
    d = f"/tmp/ntpu_trace_{tag}_{os.getpid()}"
    with jax.profiler.trace(d):
        yield
    try:
        f = sorted(glob.glob(d + "/**/*.trace.json.gz", recursive=True))[-1]
        data = json.loads(gzip.open(f).read())
        names = {e["pid"]: e["args"].get("name", "")
                 for e in data["traceEvents"]
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
        dev = [p for p, n in names.items() if "TPU" in n or "tpu" in n]
        agg = collections.Counter()
        for e in data["traceEvents"]:
            if e.get("ph") == "X" and (not dev or e.get("pid") in dev):
                agg[e["name"].split(".")[0].split("(")[0][:48]] += \
                    e.get("dur", 0) / 1e3
        print(f"top device ops ({tag}):")
        for k, v in agg.most_common(top):
            print(f"  {v:10.3f} ms  {k}", flush=True)
    except Exception as e:  # profiling must never break generation
        print(f"[profiling] trace analysis failed: {e}", flush=True)
