"""Native-pack (uint8 bitcast) storage sweep — round-3 measurement harness.

Decode fill-128 slope for per-tensor storage choices on the random 7B
(results recorded in PARITY.md "native-at-rest storage"):

  all-conv (packed u8 at rest + in-jit to_native)    5.34-5.50 ms/tok
  np-lmhead (native-pack lm_head only)               5.46        (free)
  np-attn   (native-pack wq/wk/wv/wo)                6.16        (+0.8)
  np-all    (everything native-pack, per-layer)      6.11
  hybrid    (np bigs + in-jit attn)                  6.53-6.65
  np-all stacked-index streaming                     7.46        (+1.3)
  variants: per-group bitcast 6.31, bf16 convert 6.76, tn=1024 cap 6.21
  fused qkv/gate-up (conv)                           5.76  (fusion loses)

The npack penalty concentrates in small-grid kernels (2-4 N-steps can't
hide the u8→s4 bitcast's register shuffle behind the DMA pipeline).

Usage (real chip): python scripts/exp_npack.py [cases...]
  cases: all-conv np-lmhead np-bigs np-attn np-all   (default: all)
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import _llama2_7b, rand_quant_params, bench_decode
from neural_tpu.core.qtensor import to_native_packed


def main():
    cases = sys.argv[1:] or ["all-conv", "np-lmhead", "np-bigs", "np-attn",
                             "np-all"]
    cfg = _llama2_7b()
    base = rand_quant_params(cfg)
    npack = jax.jit(to_native_packed)   # non-donating: base stays usable

    def variant(names=(), lm=False, all_np=False):
        layers = dict(base["layers"])
        for n in (list(layers) if all_np else names):
            if hasattr(layers[n], "planes"):
                layers[n] = npack(layers[n])
        p = dict(base, layers=layers)
        if lm or all_np:
            p["lm_head"] = npack(base["lm_head"])
        return p

    table = {
        "all-conv": dict(),
        "np-lmhead": dict(lm=True),
        "np-bigs": dict(names=("w_gate", "w_up", "w_down"), lm=True),
        "np-attn": dict(names=("wq", "wk", "wv", "wo")),
        "np-all": dict(all_np=True),
    }
    for name in cases:
        t0 = time.time()
        tps, ms = bench_decode(variant(**table[name]), cfg)
        print(f"{name}: {ms:.2f} ms/tok ({tps:.1f} tok/s) "
              f"[{time.time() - t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
