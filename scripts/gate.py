"""One-command accuracy + perf regression gate.

TPU analog of the reference CI gates: the perplexity accuracy check
(/root/reference/scripts/perplexity.py:58 drives wikitext-2 PPL in
tests/model-test/cpp_graph_inference.sh:129) and the "Performance
Regression" gate (.github/workflows/cpp-graph-test.yml:48-155).

No datasets exist offline, so the accuracy leg scores a SYNTHETIC corpus
sampled from the fixed-seed fp32 tiny model itself (temperature 0.9):
the fp32 model predicts it well (low PPL), which makes quantization
deltas visible — random tokens would score ~vocab-size PPL at every
bit-width and hide regressions. The quantized/fp32 PPL ratios are gated
against committed expectations in baselines/accuracy.json.

Usage:
  python scripts/gate.py                  # accuracy gate (CPU, ~1 min)
  python scripts/gate.py --perf           # + latency gate vs the committed
                                          #   TPU baseline (real chip only)
  python scripts/gate.py --update         # re-record accuracy baselines
Exit code 1 on any regression (>10% PPL-ratio drift or >10% latency).
"""
import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# the accuracy leg runs on CPU (tiny model; a tunneled TPU would cost
# seconds per dispatch). The original env is preserved for the perf-leg
# subprocess, which SHOULD see the real chip. Env alone is not enough:
# sitecustomize re-registers the TPU plugin in every process, so the
# config must be overridden after import too (tests/conftest.py note).
_ORIG_PLATFORMS = os.environ.get("JAX_PLATFORMS")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
ACC_BASE = os.path.join(ROOT, "baselines", "accuracy.json")
LAT_BASE = os.path.join(ROOT, "baselines", "latency_tpu.json")

# gated quantization configs: preset → max allowed drift of the
# (quantized PPL / fp32 PPL) ratio vs the committed baseline ratio
GATED = ["q4_0", "q4_j", "int8", "int4_g128_asym", "int3", "int5",
         "mix_int2_int4",   # per-tensor mixed registry (quant_registry.py)
         "mix_i2_ffn"]      # native-int2 FFN decode-bytes recipe (round 5)


AMP = 8.0   # lm_head amplification: an untrained model's predictive
#             distribution is ~uniform (PPL ≈ vocab at every bit-width,
#             hiding quantization damage); scaling the head peaks it so
#             the self-sampled corpus has low fp32 PPL and quantized
#             deltas become visible. Exact across configs: RTN scales are
#             linear, so quantize(AMP·W) == codes(W) with AMP·scales.


def _amp_head(params):
    import dataclasses
    from neural_tpu.core.qtensor import QTensor
    params = dict(params)
    lm = params["lm_head"]
    if isinstance(lm, QTensor):
        params["lm_head"] = dataclasses.replace(lm, scales=lm.scales * AMP)
    else:
        params["lm_head"] = lm * AMP
    return params


def _gate_cfg():
    from neural_tpu.models.config import ModelConfig
    # intermediate 384: divisible by every gated bit-width's pack chunk
    return ModelConfig(arch="llama", vocab_size=256, hidden_size=128,
                       n_layers=2, n_heads=8, n_kv_heads=4, head_dim=16,
                       intermediate_size=384, max_seq_len=1024,
                       eos_token_id=-1)


def build_corpus(n_tokens=768, seed=0):
    """Fixed tiny model (peaked head) + self-sampled corpus
    (deterministic)."""
    import jax.numpy as jnp
    import numpy as np
    from neural_tpu.convert import init_random
    from neural_tpu.runtime.generate import batched_generate
    from neural_tpu.runtime.sampling import SamplingParams

    cfg = _gate_cfg()
    params = _amp_head(init_random(cfg, seed=seed, dtype=jnp.float32))
    rng = np.random.default_rng(seed)
    rows = [[int(t)] for t in rng.integers(1, 256, 4)]
    outs = batched_generate(
        params, cfg, rows,
        SamplingParams(greedy=False, temperature=0.9, top_k=0, top_p=1.0,
                       repeat_penalty=1.0, repeat_last_n=0),
        max_new_tokens=n_tokens // 4, seed=seed, stop_at_eos=False)
    corpus = [t for o in outs for t in o]
    return params, cfg, corpus


def accuracy_ratios():
    import jax.numpy as jnp
    from neural_tpu.api import quant_config_from_args
    from neural_tpu.convert import init_random
    from neural_tpu.core.dtypes import PRESETS, QuantConfig
    from neural_tpu.eval import perplexity

    params, cfg, corpus = build_corpus()
    p_fp = perplexity(params, cfg, corpus, ctx_size=128, stride=64,
                      batch=4)["ppl"]
    ratios = {"fp32_ppl": round(p_fp, 4)}
    for name in GATED:
        if name in PRESETS:
            qc = PRESETS[name]
        elif name == "int4_g128_asym":
            qc = QuantConfig(bits=4, group_size=128, sym=False)
        else:
            qc = quant_config_from_args(name)
        # same seed → the same underlying weights, quantized at this config
        qp = _amp_head(init_random(cfg, seed=0, quant=qc, dtype=jnp.float32))
        p_q = perplexity(qp, cfg, corpus, ctx_size=128, stride=64,
                         batch=4)["ppl"]
        ratios[name] = round(p_q / p_fp, 4)
        print(f"  {name}: ppl {p_q:.3f} ratio {p_q / p_fp:.4f}",
              file=sys.stderr)
    return ratios


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--perf", action="store_true",
                    help="also run the TPU latency gate")
    ap.add_argument("--update", action="store_true",
                    help="re-record the accuracy baseline")
    ap.add_argument("--tol", type=float, default=0.10)
    args = ap.parse_args()

    print("accuracy gate: measuring PPL ratios on the fixed synthetic "
          "corpus...", file=sys.stderr)
    ratios = accuracy_ratios()
    if args.update or not os.path.exists(ACC_BASE):
        os.makedirs(os.path.dirname(ACC_BASE), exist_ok=True)
        with open(ACC_BASE, "w") as f:
            json.dump(ratios, f, indent=1)
        print(f"accuracy baseline written: {ACC_BASE}", file=sys.stderr)
        rc = 0
    else:
        with open(ACC_BASE) as f:
            base = json.load(f)
        bad = []
        for name in GATED:
            if name not in base:
                continue
            if ratios[name] > base[name] * (1 + args.tol):
                bad.append((name, base[name], ratios[name]))
        if bad:
            for name, b, r in bad:
                print(f"ACCURACY REGRESSION {name}: PPL ratio "
                      f"{b:.4f} → {r:.4f}", file=sys.stderr)
            rc = 1
        else:
            print("accuracy gate: OK", file=sys.stderr)
            rc = 0

    if args.perf:
        if _ORIG_PLATFORMS == "cpu":
            print("perf gate: SKIPPED (JAX_PLATFORMS=cpu — no TPU)",
                  file=sys.stderr)
        elif not os.path.exists(LAT_BASE):
            print(f"perf gate: no baseline at {LAT_BASE}; run "
                  "scripts/latency.py --out baselines/latency_tpu.json "
                  "first", file=sys.stderr)
            rc = rc or 1
        else:
            env = dict(os.environ)
            if _ORIG_PLATFORMS is None:
                env.pop("JAX_PLATFORMS", None)
            else:
                env["JAX_PLATFORMS"] = _ORIG_PLATFORMS
            r = subprocess.run(
                [sys.executable, os.path.join(ROOT, "scripts", "latency.py"),
                 "--out", "/tmp/latency_now.json", "--gate", LAT_BASE,
                 "--tol", str(args.tol)], env=env)
            rc = rc or r.returncode
    sys.exit(rc)


if __name__ == "__main__":
    main()
