"""Tensor/data-parallel correctness on the virtual 8-device CPU mesh.

The reference tests TP only manually via mpirun (SURVEY.md §4); here the
sharded step must match the single-device step bit-for-bit-ish.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_tpu.convert import init_random
from neural_tpu.models.config import ModelConfig
from neural_tpu.parallel.sharding import (
    make_mesh, shard_params, shard_cache, param_specs)
from neural_tpu.parallel.tp import make_tp_step
from neural_tpu.runtime import init_cache, model_step


def tiny_cfg(**kw):
    base = dict(arch="llama", vocab_size=256, hidden_size=128, n_layers=2,
                n_heads=8, n_kv_heads=4, head_dim=16, intermediate_size=256,
                max_seq_len=64)
    base.update(kw)
    return ModelConfig(**base)


@pytest.mark.parametrize("quant", [None, "q4_0"])
def test_tp_matches_single_device(quant):
    cfg = tiny_cfg()
    params = init_random(cfg, quant=quant, dtype=jnp.float32)
    tokens = np.array([[5, 9, 2, 7, 33, 1, 8, 20]] * 2, np.int32)
    start = jnp.zeros((2,), jnp.int32)

    cache = init_cache(cfg, 2, 32)
    ref_logits, _ = model_step(params, jnp.asarray(tokens), start, cache, cfg)

    mesh = make_mesh(dp=2, tp=4)
    sp = shard_params(params, cfg, mesh)
    sc = shard_cache(init_cache(cfg, 2, 32), mesh)
    step = make_tp_step(params, cfg, mesh)
    tp_logits, new_cache = step(sp, jnp.asarray(tokens), start, sc)

    np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(ref_logits),
                               atol=2e-2, rtol=2e-2)


def test_tp_decode_continues(quant="q4_0"):
    cfg = tiny_cfg()
    params = init_random(cfg, quant=quant, dtype=jnp.float32)
    # tp=8 would split w_down's 4 scale groups 8 ways — too small a toy model
    mesh = make_mesh(dp=1, tp=4)
    sp = shard_params(params, cfg, mesh)
    sc = shard_cache(init_cache(cfg, 1, 32), mesh)
    step = make_tp_step(params, cfg, mesh)

    toks = np.array([[3, 14, 15, 9]], np.int32)
    logits, sc = step(sp, jnp.asarray(toks), jnp.zeros((1,), jnp.int32), sc)
    nxt = int(jnp.argmax(logits[0, -1]))

    # single-device reference decode
    cache = init_cache(cfg, 1, 32)
    rl, cache = model_step(params, jnp.asarray(toks),
                           jnp.zeros((1,), jnp.int32), cache, cfg)
    assert int(jnp.argmax(rl[0, -1])) == nxt

    l2, sc = step(sp, jnp.asarray([[nxt]], jnp.int32),
                  jnp.asarray([4], jnp.int32), sc)
    r2, cache = model_step(params, jnp.asarray([[nxt]], jnp.int32),
                           jnp.asarray([4], jnp.int32), cache, cfg)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(r2),
                               atol=2e-2, rtol=2e-2)


def test_moe_tp():
    cfg = tiny_cfg(arch="mixtral", n_experts=4, n_experts_active=2,
                   intermediate_size=128)
    params = init_random(cfg, quant=None, dtype=jnp.float32)
    tokens = np.array([[5, 9, 2, 7]], np.int32)
    start = jnp.zeros((1,), jnp.int32)
    cache = init_cache(cfg, 1, 16)
    ref, _ = model_step(params, jnp.asarray(tokens), start, cache, cfg)

    mesh = make_mesh(dp=1, tp=4)
    sp = shard_params(params, cfg, mesh)
    sc = shard_cache(init_cache(cfg, 1, 16), mesh)
    step = make_tp_step(params, cfg, mesh)
    out, _ = step(sp, jnp.asarray(tokens), start, sc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_auto_mesh_layout():
    from neural_tpu.parallel import auto_mesh, is_primary
    mesh = auto_mesh(tp=4)
    assert mesh.axis_names == ("dp", "tp")
    assert mesh.shape["tp"] == 4 and mesh.shape["dp"] == 2
    assert is_primary()  # single-process run
    mesh2 = auto_mesh()  # auto: tp = local devices
    assert mesh2.shape["dp"] * mesh2.shape["tp"] == 8


def test_tp8_70b_shape_gqa():
    """Llama-2-70B-shaped GQA at tp=8: 64 q heads / 8 kv heads → exactly
    one kv head per rank (the BASELINE.json config-5 sharding), tiny dims.
    Verifies the head-aligned split rules handle Hkv == tp."""
    cfg = tiny_cfg(n_heads=64, n_kv_heads=8, head_dim=8, hidden_size=512,
                   intermediate_size=1024, vocab_size=512)
    params = init_random(cfg, quant="q4_0", dtype=jnp.float32)
    tokens = np.array([[5, 9, 2, 7, 33, 1, 8, 20]], np.int32)
    start = jnp.zeros((1,), jnp.int32)

    cache = init_cache(cfg, 1, 32)
    ref_logits, _ = model_step(params, jnp.asarray(tokens), start, cache, cfg)

    mesh = make_mesh(dp=1, tp=8)
    sp = shard_params(params, cfg, mesh)
    sc = shard_cache(init_cache(cfg, 1, 32), mesh)
    step = make_tp_step(params, cfg, mesh)
    tp_logits, _ = step(sp, jnp.asarray(tokens), start, sc)
    np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(ref_logits),
                               atol=2e-2, rtol=2e-2)


def test_tp_decode_loop_greedy_matches_single_device():
    """On-device TP decode scan (shard_map around the whole loop): greedy
    tokens must match the single-device decode_loop (reference TP CLI
    generation, main_run.cpp:571-600 under mpirun)."""
    from neural_tpu.parallel.tp import make_tp_prefill, make_tp_decode_loop
    from neural_tpu.runtime.generate import decode_loop, _prefill_ragged

    cfg = tiny_cfg()
    params = init_random(cfg, quant="q4_0", dtype=jnp.float32)
    rows = np.array([[3, 14, 15, 9], [7, 1, 2, 5]], np.int32)
    lens = jnp.asarray([4, 4], jnp.int32)
    n_steps = 8

    # single-device reference: ragged prefill + decode loop
    cache = init_cache(cfg, 2, 32)
    logits, cache = _prefill_ragged(params, jnp.asarray(rows), lens, cache,
                                    cfg)
    tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    ref_toks, _ = decode_loop(params, tok0[:, None], lens, cache, cfg,
                              n_steps)

    mesh = make_mesh(dp=2, tp=4)
    sp = shard_params(params, cfg, mesh)
    sc = shard_cache(init_cache(cfg, 2, 32), mesh)
    prefill = make_tp_prefill(params, cfg, mesh)
    tl, sc = prefill(sp, jnp.asarray(rows), lens, sc)
    ttok0 = jnp.argmax(tl, axis=-1).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(ttok0), np.asarray(tok0))

    loop = make_tp_decode_loop(params, cfg, mesh, n_steps)
    tp_toks, _ = loop(sp, ttok0[:, None], lens, sc)
    np.testing.assert_array_equal(np.asarray(tp_toks), np.asarray(ref_toks))


def test_tp_sample_loop():
    """Sampled TP decode: deterministic given a key, valid token range,
    and temperature→0 equals the greedy loop."""
    from neural_tpu.parallel.tp import make_tp_prefill, make_tp_decode_loop
    from neural_tpu.runtime.sampling import SamplingParams

    cfg = tiny_cfg()
    params = init_random(cfg, quant="q4_0", dtype=jnp.float32)
    rows = np.array([[3, 14, 15, 9], [7, 1, 2, 5]], np.int32)
    lens = jnp.asarray([4, 4], jnp.int32)
    n_steps = 6
    mesh = make_mesh(dp=2, tp=4)
    sp = shard_params(params, cfg, mesh)

    def run(sampling, seed=0):
        sc = shard_cache(init_cache(cfg, 2, 32), mesh)
        prefill = make_tp_prefill(params, cfg, mesh)
        tl, sc = prefill(sp, jnp.asarray(rows), lens, sc)
        tok0 = jnp.argmax(tl, axis=-1).astype(jnp.int32)
        loop = make_tp_decode_loop(params, cfg, mesh, n_steps,
                                   sampling=sampling)
        hist = jnp.concatenate(
            [jnp.asarray(rows), tok0[:, None]], axis=1)
        hvalid = jnp.ones(hist.shape, bool)
        toks, _ = loop(sp, tok0[:, None], lens, sc,
                       jax.random.PRNGKey(seed), hist, hvalid)
        return np.asarray(toks)

    samp = SamplingParams(temperature=0.9, top_k=20, repeat_last_n=5)
    a = run(samp)
    b = run(samp)
    np.testing.assert_array_equal(a, b)          # deterministic
    assert a.shape == (n_steps, 2)
    assert ((a >= 0) & (a < cfg.vocab_size)).all()

    cold = run(SamplingParams(temperature=1e-6, top_k=1, repeat_last_n=0,
                              repeat_penalty=1.0))
    greedy = run(SamplingParams(greedy=True, repeat_last_n=0,
                                repeat_penalty=1.0))
    np.testing.assert_array_equal(cold, greedy)


def test_tp_generate_end_to_end():
    """tp_generate: ragged rows, dp padding, greedy + sampled paths."""
    from neural_tpu.parallel.tp import tp_generate
    from neural_tpu.runtime.generate import batched_generate
    from neural_tpu.runtime.sampling import SamplingParams

    cfg = tiny_cfg()
    params = init_random(cfg, quant="q4_0", dtype=jnp.float32)
    mesh = make_mesh(dp=2, tp=4)
    rows = [[3, 14, 15, 9], [7, 1, 2], [11, 6, 8, 2, 4]]  # 3 rows → pad to 4

    sp = SamplingParams(greedy=True, repeat_last_n=0)
    outs = tp_generate(params, cfg, mesh, rows, sp, max_new_tokens=6,
                       stop_at_eos=False)
    ref = batched_generate(params, cfg, rows, sp, max_new_tokens=6,
                           stop_at_eos=False)
    assert [len(o) for o in outs] == [len(r) + 6 for r in rows]
    assert outs == ref

    sampled = tp_generate(params, cfg, mesh, rows,
                          SamplingParams(temperature=0.8, top_k=30),
                          max_new_tokens=6, stop_at_eos=False)
    assert [len(o) for o in sampled] == [len(r) + 6 for r in rows]


def test_tp8_70b_real_dims_rehearsal():
    """BASELINE config-5 rehearsal at REAL Llama-2-70B layer dimensions:
    hidden 8192, ffn 28672, GQA 64:8 q/kv heads, head_dim 128, int4
    weights, tp=8 — 2 layers, reduced vocab. Beyond the tiny-dim shape
    test above, this drives throughput-shaped buffers through the real
    sharding specs end-to-end (prefill + a decode step) and pins the
    per-rank shard shapes (reference: docs/tensor_parallelism.md,
    model_files.h:82-90 TP head split).
    """
    cfg = ModelConfig(arch="llama", vocab_size=1024, hidden_size=8192,
                      n_layers=2, n_heads=64, n_kv_heads=8, head_dim=128,
                      intermediate_size=28672, max_seq_len=64)
    params = init_random(cfg, quant="q4_0", dtype=jnp.float32)
    mesh = make_mesh(dp=1, tp=8)
    sp = shard_params(params, cfg, mesh)

    # ---- per-rank buffer shapes: column-split q/o over 64 heads → 8
    # heads/rank; kv over 8 heads → exactly 1 kv head (128 cols) per rank;
    # ffn column-split 28672/8; w_down row-split along K
    lp = sp["layers"]
    def shard_shape(qt):
        return qt.planes[0].addressable_shards[0].data.shape
    assert shard_shape(lp["wq"])[-1] == 64 * 128 // 8
    assert shard_shape(lp["wk"])[-1] == 128          # one kv head per rank
    assert shard_shape(lp["w_up"])[-1] == 28672 // 8
    # w_down: K rows split 8-ways; packed u8 rows = K/2 per full tensor
    full_rows = params["layers"]["w_down"].planes[0].shape[-2]
    assert shard_shape(lp["w_down"])[-2] == full_rows // 8
    # scales follow their tensors
    assert lp["wk"].scales.addressable_shards[0].data.shape[-1] == 128

    # ---- numeric parity: prefill logits + one decode step vs single dev
    tokens = np.array([[5, 9]], np.int32)
    start = jnp.zeros((1,), jnp.int32)
    cache = init_cache(cfg, 1, 8)
    ref_logits, ref_cache = model_step(params, jnp.asarray(tokens), start,
                                       cache, cfg)
    sc = shard_cache(init_cache(cfg, 1, 8), mesh)
    step = make_tp_step(params, cfg, mesh)
    tp_logits, sc = step(sp, jnp.asarray(tokens), start, sc)
    # K=8192/28672 bf16 reductions reorder under sharding: a handful of
    # logits land ~0.06 apart — bound the noise, pin the argmax
    np.testing.assert_allclose(np.asarray(tp_logits),
                               np.asarray(ref_logits),
                               atol=1e-1, rtol=5e-2)
    ref_id = int(jnp.argmax(ref_logits[0, -1]))
    assert int(jnp.argmax(tp_logits[0, -1])) == ref_id

    nxt = jnp.asarray([[ref_id]], jnp.int32)
    pos = jnp.asarray([2], jnp.int32)
    ref2, _ = model_step(params, nxt, pos, ref_cache, cfg)
    tp2, _ = step(sp, nxt, pos, sc)
    np.testing.assert_allclose(np.asarray(tp2), np.asarray(ref2),
                               atol=1e-1, rtol=5e-2)
    assert int(jnp.argmax(tp2[0, -1])) == int(jnp.argmax(ref2[0, -1]))
