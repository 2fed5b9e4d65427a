"""Per-tensor quant config registry (reference quant_config.h:180-239 +
"llama int2&int4 mixed", core/README.md:252)."""
import numpy as np
import pytest

import jax.numpy as jnp

from neural_tpu.convert import init_random
from neural_tpu.convert.hf import requantize
from neural_tpu.convert.quant_registry import (MIX_INT2_INT4, MIXED_PRESETS,
                                               QuantRegistry)
from neural_tpu.core.dtypes import QuantConfig
from neural_tpu.core.qtensor import QTensor
from neural_tpu.models.config import ModelConfig
from neural_tpu.runtime.generate import batched_generate, greedy_generate
from neural_tpu.runtime.sampling import SamplingParams

CFG = ModelConfig(arch="llama", vocab_size=256, hidden_size=128,
                  n_layers=3, n_heads=8, n_kv_heads=4, head_dim=16,
                  intermediate_size=256, max_seq_len=64)


def test_resolve_first_match_wins():
    reg = QuantRegistry(rules=[("layers.0.*", "int8"),
                               ("w_down", "q4_0"),
                               ("*", "int3")], default=None)
    assert reg.resolve("w_down", 0).bits == 8       # layer rule first
    assert reg.resolve("w_down", 2).bits == 4
    assert reg.resolve("wq", 1).bits == 3
    assert reg.resolve("lm_head") is not None        # "*" matches bare name
    reg2 = QuantRegistry(rules=[("w_*", "q4_0")])
    assert reg2.resolve("embed") is None             # default None = fp


def test_mixed_preset_layout_and_generation():
    params = init_random(CFG, quant=MIX_INT2_INT4, dtype=jnp.float32)
    lp = params["layers"]
    assert isinstance(lp, dict)                      # layer-uniform: stacked
    assert lp["w_gate"].cfg.bits == 2 and lp["w_gate"].cfg.group_size == 16
    assert lp["w_up"].cfg.bits == 2
    assert lp["w_down"].cfg.bits == 4 and not lp["w_down"].cfg.sym
    assert lp["wq"].cfg.bits == 4 and lp["wq"].cfg.sym
    assert params["lm_head"].cfg.bits == 8
    out = greedy_generate(params, CFG, [3, 5, 7], max_new_tokens=4,
                          stop_at_eos=False)
    assert len(out) == 7
    assert "mix_int2_int4" in MIXED_PRESETS


def test_hetero_registry_tuple_layout():
    reg = QuantRegistry(rules=[("layers.0.w_up", "int8"),
                               ("layers.2.*", QuantConfig(bits=3,
                                                          group_size=32))],
                        default="q4_0")
    params = init_random(CFG, quant=reg, dtype=jnp.float32)
    lp = params["layers"]
    assert isinstance(lp, tuple) and len(lp) == 3
    assert lp[0]["w_up"].cfg.bits == 8
    assert lp[1]["w_up"].cfg.bits == 4
    assert lp[2]["w_up"].cfg.bits == 3 and lp[2]["wq"].cfg.bits == 3
    outs = batched_generate(params, CFG, [[3, 5], [7, 2, 9]],
                            SamplingParams(greedy=True, repeat_last_n=0),
                            max_new_tokens=4, stop_at_eos=False)
    assert [len(o) for o in outs] == [6, 7]


def test_registry_requantize_stacked():
    params = init_random(CFG, quant="q4_0", dtype=jnp.float32)
    out = requantize(params, MIX_INT2_INT4)
    lp = out["layers"]
    assert isinstance(lp, dict)                      # uniform → restacked
    assert lp["w_gate"].cfg.bits == 2
    assert lp["wq"].cfg.bits == 4 and lp["wq"].cfg.sym
    assert out["lm_head"].cfg.bits == 8
    ids = greedy_generate(out, CFG, [3, 5], max_new_tokens=3,
                          stop_at_eos=False)
    assert len(ids) == 5


def test_registry_requantize_hetero_and_fp_rule():
    params = init_random(CFG, quant="q4_0", dtype=jnp.float32)
    reg = QuantRegistry(rules=[("layers.1.*", None),       # → bf16
                               ("*", "int8")])
    out = requantize(params, reg)
    lp = out["layers"]
    assert isinstance(lp, tuple)
    assert lp[0]["wq"].cfg.bits == 8
    assert not isinstance(lp[1]["wq"], QTensor)      # dequantized to fp
    assert lp[1]["wq"].dtype == jnp.bfloat16
    assert lp[2]["w_down"].cfg.bits == 8


def test_registry_quality_ordering():
    """Mixed int2+int4 must sit between all-int4 and all-int2 in weight
    reconstruction error (sanity that the recipe does what it claims)."""
    from neural_tpu.core.qtensor import dequantize, quantize
    rng = np.random.default_rng(0)
    w = rng.standard_normal((128, 96)).astype(np.float32)
    e = {}
    for name, qc in [("int4", QuantConfig(bits=4, group_size=32, sym=True)),
                     ("int2", QuantConfig(bits=2, group_size=16, sym=False)),
                     ]:
        e[name] = float(np.abs(
            np.asarray(dequantize(quantize(jnp.asarray(w), qc))) - w).mean())
    assert e["int4"] < e["int2"]


def test_hetero_registry_checkpoint_roundtrip(tmp_path):
    """Mixed-bit tuple-layout params survive the NTPU checkpoint."""
    from neural_tpu.convert.checkpoint import load_checkpoint, \
        save_checkpoint
    reg = QuantRegistry(rules=[("layers.0.w_up", "int8")], default="q4_0")
    params = init_random(CFG, quant=reg, dtype=jnp.float32)
    ref = greedy_generate(params, CFG, [3, 5, 7], max_new_tokens=4,
                          stop_at_eos=False)
    p = str(tmp_path / "m.ntpu")
    save_checkpoint(p, params, CFG)
    params2, cfg2, _ = load_checkpoint(p)
    assert cfg2 == CFG and isinstance(params2["layers"], tuple)
    assert params2["layers"][0]["w_up"].cfg.bits == 8
    out = greedy_generate(params2, CFG, [3, 5, 7], max_new_tokens=4,
                          stop_at_eos=False)
    assert out == ref
