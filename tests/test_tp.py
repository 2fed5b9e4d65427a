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
