"""Streamed safetensors conversion (convert/stream.py): bit-exactness vs
the in-memory torch path and the bounded-RSS property (reference analog:
the LazyTensor converter, convert_llama.py:146-520)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_tpu.core.qtensor import QTensor

TINY_LLAMA = dict(
    architectures=["LlamaForCausalLM"], model_type="llama",
    hidden_size=64, intermediate_size=96, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2,
    vocab_size=128, rms_norm_eps=1e-5, max_position_embeddings=64,
    tie_word_embeddings=False)


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    """A real transformers tiny llama saved as MULTI-SHARD safetensors."""
    import transformers
    d = tmp_path_factory.mktemp("tiny_llama_shards")
    cfg = transformers.LlamaConfig(**{k: v for k, v in TINY_LLAMA.items()
                                      if k != "architectures"})
    torch_model = transformers.LlamaForCausalLM(cfg)
    torch_model.save_pretrained(d, max_shard_size="100KB",
                                safe_serialization=True)
    assert os.path.exists(os.path.join(d, "model.safetensors.index.json"))
    return str(d), torch_model


def _tree_equal(a, b):
    la = jax.tree.leaves(a, is_leaf=lambda x: isinstance(x, QTensor))
    lb = jax.tree.leaves(b, is_leaf=lambda x: isinstance(x, QTensor))
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        if isinstance(x, QTensor):
            assert isinstance(y, QTensor) and x.cfg == y.cfg
            for p, q in zip(jax.tree.leaves(x), jax.tree.leaves(y)):
                np.testing.assert_array_equal(np.asarray(p), np.asarray(q))
        else:
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("quant", [None, "q4_0"])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_streamed_matches_from_hf_model(hf_dir, quant, dtype):
    # bf16 included: the streamed path must cast per-layer 1-D tensors
    # (norms/biases) to ``dtype`` exactly like build_params — a round-4
    # review caught them landing in f32 and breaking bit-exactness
    d, torch_model = hf_dir
    from neural_tpu.convert.hf import from_hf_model
    from neural_tpu.convert.stream import params_from_hf_dir
    ref, cfg_ref = from_hf_model(torch_model, quant, dtype)
    got, cfg = params_from_hf_dir(d, quant, dtype)
    assert cfg == cfg_ref
    _tree_equal(got, ref)


def test_streamed_through_model_init(hf_dir):
    d, _ = hf_dir
    import neural_tpu as nt
    m = nt.Model().init(d, weight_dtype="q4_0")
    out = m.generate([[3, 5, 7]], max_new_tokens=4, stop_at_eos=False)
    assert len(out[0]) == 7


def test_streamed_registry_mixed(hf_dir):
    """A layer-heterogeneous registry through the streamed path emits the
    tuple layout and still generates."""
    d, _ = hf_dir
    from neural_tpu.convert.quant_registry import QuantRegistry
    from neural_tpu.convert.stream import params_from_hf_dir
    from neural_tpu.runtime.generate import greedy_generate
    reg = QuantRegistry(rules=[("layers.0.w_up", "int8")], default="q4_0")
    params, cfg = params_from_hf_dir(d, reg, jnp.float32)
    assert isinstance(params["layers"], tuple)
    assert params["layers"][0]["w_up"].cfg.bits == 8
    assert params["layers"][1]["w_up"].cfg.bits == 4
    out = greedy_generate(params, cfg, [3, 5], max_new_tokens=3,
                          stop_at_eos=False)
    assert len(out) == 5


_RSS_SCRIPT = r"""
import json, os, sys
sys.path.insert(0, {root!r})
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

def vm(field):
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith(field):
                return int(line.split()[1])   # kB
    raise KeyError(field)

from neural_tpu.models import llama as llama_mod
from neural_tpu.models.config import ModelConfig
cfg = ModelConfig(arch="llama", vocab_size=8192, hidden_size=1024,
                  n_layers=4, n_heads=8, n_kv_heads=8, head_dim=128,
                  intermediate_size=2816, max_seq_len=128)
hwm0 = vm("VmHWM")
if {streamed!r} == "streamed":
    from neural_tpu.convert.stream import params_from_hf_dir
    params, _ = params_from_hf_dir({ckpt!r}, "q4_0", cfg=cfg,
                                   arch_mod=llama_mod)
else:   # control: full state-dict materialization (the old path)
    from neural_tpu.convert.hf import build_params
    from neural_tpu.convert.stream import ShardedCheckpoint
    r = ShardedCheckpoint({ckpt!r})
    sd = dict((n, r.tensor(n)) for n in r.names())
    params = build_params(sd, cfg, llama_mod, "q4_0")
hwm1 = vm("VmHWM")
leaves = jax.tree.leaves(params)
print(json.dumps({{"hwm0_kb": hwm0, "hwm1_kb": hwm1,
                   "n_leaves": len(leaves)}}))
"""


def test_streamed_rss_bounded(tmp_path):
    """Convert a ~270 MB fp32 multi-shard synthetic checkpoint; the
    streamed path's RSS high-water delta must stay far below the full
    state-dict size (one layer ≈ 51 MB + one shard ≈ 34 MB + outputs)."""
    from safetensors.numpy import save_file
    from neural_tpu.models import llama as llama_mod
    from neural_tpu.models.config import ModelConfig

    cfg = ModelConfig(arch="llama", vocab_size=8192, hidden_size=1024,
                      n_layers=4, n_heads=8, n_kv_heads=8, head_dim=128,
                      intermediate_size=2816, max_seq_len=128)
    d = tmp_path / "big"
    d.mkdir()
    rng = np.random.default_rng(0)
    weight_map, total = {}, 0
    for i in range(cfg.n_layers):
        m = llama_mod.hf_layer_map(i, cfg)
        shard = {}
        for ours, (hf, tr) in m.items():
            if ours.startswith(("attn_norm", "ffn_norm")):
                shard[hf] = np.ones(cfg.hidden_size, np.float32)
            else:
                from neural_tpu.convert.hf import _shape_for
                K, N = _shape_for(ours, cfg)
                shard[hf] = rng.standard_normal((N, K)).astype(np.float32) \
                    * 0.02
        fn = f"model-{i:05d}.safetensors"
        save_file(shard, str(d / fn))
        weight_map.update({k: fn for k in shard})
        total += sum(v.nbytes for v in shard.values())
    top = {
        "model.embed_tokens.weight": rng.standard_normal(
            (cfg.vocab_size, cfg.hidden_size)).astype(np.float32) * 0.02,
        "model.norm.weight": np.ones(cfg.hidden_size, np.float32),
        "lm_head.weight": rng.standard_normal(
            (cfg.vocab_size, cfg.hidden_size)).astype(np.float32) * 0.02,
    }
    save_file(top, str(d / "model-top.safetensors"))
    weight_map.update({k: "model-top.safetensors" for k in top})
    total += sum(v.nbytes for v in top.values())
    with open(d / "model.safetensors.index.json", "w") as f:
        json.dump({"weight_map": weight_map}, f)
    assert total > 250e6   # the checkpoint really is ~270 MB

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(mode):
        script = _RSS_SCRIPT.format(root=root, ckpt=str(d), streamed=mode)
        r = subprocess.run([sys.executable, "-c", script],
                           capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["n_leaves"] > 10
        return (out["hwm1_kb"] - out["hwm0_kb"]) / 1024

    streamed = run("streamed")
    control = run("control")
    # streamed bound: one layer fp32 (~51 MB) + one mapped shard (~34 MB)
    # + output params (host-resident on the CPU backend; HBM on TPU) +
    # allocator slack. The control holds the whole 273 MB state dict plus
    # per-name [L, K, N] stacks on top of the same outputs.
    assert streamed < 350, f"streamed RSS delta {streamed:.0f} MB"
    assert streamed < 0.62 * control, \
        f"streamed {streamed:.0f} MB vs full-materialize {control:.0f} MB"
