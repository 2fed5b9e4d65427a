"""Sub-4-bit decode recipe evaluation (round-5, VERDICT item 5).

Question: is there a PPL-viable recipe with fewer decode bytes/step than
the q4_j headline (int4 g128 sym, ~4.25 bits/weight incl. f32 scales;
~101 MB/layer on a 7B)? Candidates (reference cites production
"llama int2&int4 mixed", core/README.md:252; gemv_nbits::S3
bestla_wrapper.h:129):

- int3 g64/g128 sym — byte win exists ON PAPER (3.25/3.125 b/w) but the
  TPU decode kernel streams 2-4-bit codes in int4 nibble containers
  (hardware int4->f32 convert, ~660-900 GB/s vs ~70-230 for VPU bit-plane
  unpack — core/qtensor.to_native: int3-as-int4 is 7x faster end-to-end
  despite 33% more bytes). int3's moved bytes therefore EQUAL int4's.
- int2 gXX sym — a native-int2 path is buildable (pltpu.bitcast uint8 ->
  jnp.int2 + hardware convert verified round 4), so int2's 4-codes/byte
  would halve the weight stream IF the PPL gate passes.
- mixed registries: int2 on the most-tolerant tensors, int4 elsewhere.

This script measures the PPL ratio of each candidate on the gate corpus
(scripts/gate.py methodology) and prints bits/weight + est. 7B per-layer
decode MB. Run on CPU: JAX_PLATFORMS=cpu python scripts/exp_sub4_recipes.py
"""
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from gate import build_corpus, _amp_head  # noqa: E402
from neural_tpu.convert import init_random  # noqa: E402
from neural_tpu.convert.quant_registry import QuantRegistry  # noqa: E402
from neural_tpu.core.dtypes import QuantConfig  # noqa: E402
from neural_tpu.eval import perplexity  # noqa: E402


def bits_per_weight(cfg: QuantConfig, scale_bytes=2):
    g = cfg.group_size
    b = cfg.bits if cfg.bits != 3 else 4   # int3 streams int4 containers
    per = b + (scale_bytes * 8) / g
    if not cfg.sym:
        per += (scale_bytes * 8) / g
    return per


# 7B layer: 4x(4096x4096) + 2x(4096x11264) + 11264x4096
LAYER_W = 4 * 4096 * 4096 + 3 * 4096 * 11264


def layer_mb(avg_bpw):
    return LAYER_W * avg_bpw / 8 / 2**20


def main():
    params, cfg, corpus = build_corpus()
    p_fp = perplexity(params, cfg, corpus, ctx_size=128, stride=64,
                      batch=4)["ppl"]
    i4 = QuantConfig(bits=4, group_size=128, sym=True)
    i2_64 = QuantConfig(bits=2, group_size=64, sym=True)
    i2_32 = QuantConfig(bits=2, group_size=32, sym=True)
    candidates = [
        ("q4_j (headline)", i4),
        ("int3_g64", QuantConfig(bits=3, group_size=64, sym=True)),
        ("int3_g128", QuantConfig(bits=3, group_size=128, sym=True)),
        ("int2_g64", i2_64),
        ("int2_g32", i2_32),
        # mixed: int2 on the FFN up/gate (the bulk of the bytes, most
        # redundant), int4 g128 elsewhere
        ("mix_i2g64_ffn_up_gate", QuantRegistry(
            [("*w_up", i2_64), ("*w_gate", i2_64), ("*", i4)])),
        ("mix_i2g32_ffn_up_gate", QuantRegistry(
            [("*w_up", i2_32), ("*w_gate", i2_32), ("*", i4)])),
        # int2 only on up (gentler)
        ("mix_i2g32_ffn_up", QuantRegistry(
            [("*w_up", i2_32), ("*", i4)])),
    ]
    print(f"fp32 ppl {p_fp:.3f}")
    rows = []
    for name, qc in candidates:
        qp = _amp_head(init_random(cfg, seed=0, quant=qc, dtype=jnp.float32))
        ppl = perplexity(qp, cfg, corpus, ctx_size=128, stride=64,
                         batch=4)["ppl"]
        if isinstance(qc, QuantRegistry):
            # weighted bits over the 7B layer shape
            w_i2 = sum(n for pat, n in [("*w_up", 4096 * 11264),
                                        ("*w_gate", 4096 * 11264)]
                       if any(p == pat for p, _ in qc.rules[:len(qc.rules)-1]))
            bpw = (w_i2 * bits_per_weight(qc.rules[0][1])
                   + (LAYER_W - w_i2) * bits_per_weight(i4)) / LAYER_W
        else:
            bpw = bits_per_weight(qc)
        rows.append((name, ppl / p_fp, bpw, layer_mb(bpw)))
        print(f"{name:26s} ratio {ppl / p_fp:7.4f}  ~{bpw:.2f} b/w  "
              f"~{layer_mb(bpw):5.1f} MB/layer(7B)")
    print("\n(q4_j committed gate ratio: 1.0455; int3_g32 capability "
          "ratio: 1.1976)")


if __name__ == "__main__":
    main()
