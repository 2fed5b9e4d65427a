"""PP / SP / EP correctness on the virtual 8-device CPU mesh.

The reference implements none of these (SURVEY.md §2.6: PP ❌, SP ❌,
EP ❌) — they are TPU-native extensions. Every sharded path is pinned to
the single-device oracle.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from neural_tpu.convert import init_random
from neural_tpu.models.config import ModelConfig
from neural_tpu.models.transformer import forward, _moe_mlp
from neural_tpu.parallel.sharding import (
    make_mesh, shard_params, param_specs)
from neural_tpu.runtime import init_cache, model_step


def tiny_cfg(**kw):
    base = dict(arch="llama", vocab_size=256, hidden_size=128, n_layers=2,
                n_heads=8, n_kv_heads=4, head_dim=16, intermediate_size=256,
                max_seq_len=64)
    base.update(kw)
    return ModelConfig(**base)


# ---------------------------------------------------------------------------
# cache-free (training) forward
# ---------------------------------------------------------------------------

def test_nocache_forward_matches_cached():
    """forward(cache=None) must equal the prefill path on the same tokens."""
    cfg = tiny_cfg()
    params = init_random(cfg, quant=None, dtype=jnp.float32)
    tokens = jnp.asarray(np.array([[5, 9, 2, 7, 33, 1, 8, 20]] * 2, np.int32))
    start = jnp.zeros((2,), jnp.int32)

    cache = init_cache(cfg, 2, 32)
    ref, _ = forward(params, tokens, start, cache, cfg)
    got, no_cache = forward(params, tokens, start, None, cfg)
    assert no_cache is None
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_nocache_alibi_sliding():
    cfg = tiny_cfg(arch="mpt", use_alibi=True, rope_style="none",
                   mlp_gated=False, act="gelu", norm_type="layernorm")
    params = init_random(cfg, quant=None, dtype=jnp.float32)
    tokens = jnp.asarray(np.array([[5, 9, 2, 7, 33, 1, 8, 20]], np.int32))
    start = jnp.zeros((1,), jnp.int32)
    cache = init_cache(cfg, 1, 32)
    ref, _ = forward(params, tokens, start, cache, cfg)
    got, _ = forward(params, tokens, start, None, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


# ---------------------------------------------------------------------------
# SP: ring attention
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sp,tp", [(4, 1), (2, 2)])
def test_ring_attention_matches_single_device(sp, tp):
    cfg = tiny_cfg()
    params = init_random(cfg, quant=None, dtype=jnp.float32)
    T = 16
    tokens = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, T), np.int32))

    ref, _ = forward(params, tokens, jnp.zeros((2,), jnp.int32), None, cfg)

    from neural_tpu.parallel.sp import sequence_sharded_forward
    mesh = make_mesh(dp=1, sp=sp, tp=tp)
    sharded = shard_params(params, cfg, mesh)
    got = sequence_sharded_forward(sharded, tokens, cfg, mesh,
                                   tp_axis="tp" if tp > 1 else None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_ring_attention_gqa_sliding():
    cfg = tiny_cfg(sliding_window=6)
    params = init_random(cfg, quant=None, dtype=jnp.float32)
    T = 16
    tokens = jnp.asarray(np.random.default_rng(1).integers(
        0, cfg.vocab_size, (1, T), np.int32))
    ref, _ = forward(params, tokens, jnp.zeros((1,), jnp.int32), None, cfg)

    from neural_tpu.parallel.sp import sequence_sharded_forward
    mesh = make_mesh(dp=1, sp=4)
    got = sequence_sharded_forward(params, tokens, cfg, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


# ---------------------------------------------------------------------------
# EP: expert-parallel MoE
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ep,tp", [(4, 1), (2, 2)])
def test_ep_moe_matches_dense_mixture(ep, tp):
    cfg = tiny_cfg(arch="mixtral", n_experts=4, n_experts_active=2,
                   intermediate_size=128)
    rng = np.random.default_rng(0)
    D, I_, E = cfg.hidden_size, cfg.intermediate_size, cfg.n_experts
    lp = {
        "router": jnp.asarray(rng.standard_normal((D, E)), jnp.float32) * .1,
        "experts": {
            "w_gate": jnp.asarray(rng.standard_normal((E, D, I_)),
                                  jnp.float32) * .05,
            "w_up": jnp.asarray(rng.standard_normal((E, D, I_)),
                                jnp.float32) * .05,
            "w_down": jnp.asarray(rng.standard_normal((E, I_, D)),
                                  jnp.float32) * .05,
        },
    }
    x = jnp.asarray(rng.standard_normal((2, 8, D)), jnp.float32)
    ref = _moe_mlp(x.astype(jnp.bfloat16), lp, cfg)

    from neural_tpu.parallel.ep import ep_moe
    mesh = make_mesh(dp=1, ep=ep, tp=tp)
    le = lp["experts"]
    wspec = {"w_gate": P("ep", None, "tp"), "w_up": P("ep", None, "tp"),
             "w_down": P("ep", "tp", None)} if tp > 1 else \
            {k: P("ep") for k in le}
    specs = {"router": P(), "experts": wspec}

    def fn(lp_, x_):
        return ep_moe(x_, lp_, cfg, "ep",
                      tp_axis="tp" if tp > 1 else None,
                      capacity_factor=float(E))  # no drops → exact
    got = jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=(specs, P()), out_specs=P(),
        check_vma=False))(lp, x.astype(jnp.bfloat16))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_ep_capacity_drops_are_bounded():
    """With capacity_factor=1.0 some assignments drop; output stays finite
    and close to the dense mixture for most tokens."""
    cfg = tiny_cfg(arch="mixtral", n_experts=4, n_experts_active=1,
                   intermediate_size=64)
    rng = np.random.default_rng(2)
    D, I_, E = cfg.hidden_size, cfg.intermediate_size, cfg.n_experts
    lp = {
        "router": jnp.asarray(rng.standard_normal((D, E)), jnp.float32) * .1,
        "experts": {
            "w_gate": jnp.asarray(rng.standard_normal((E, D, I_)),
                                  jnp.float32) * .05,
            "w_up": jnp.asarray(rng.standard_normal((E, D, I_)),
                                jnp.float32) * .05,
            "w_down": jnp.asarray(rng.standard_normal((E, I_, D)),
                                  jnp.float32) * .05,
        },
    }
    x = jnp.asarray(rng.standard_normal((1, 32, D)), jnp.bfloat16)
    from neural_tpu.parallel.ep import ep_moe
    mesh = make_mesh(dp=1, ep=4)
    got = jax.jit(jax.shard_map(
        lambda lp_, x_: ep_moe(x_, lp_, cfg, "ep", capacity_factor=1.0),
        mesh=mesh,
        in_specs=({"router": P(), "experts": {k: P("ep") for k in
                                              lp["experts"]}}, P()),
        out_specs=P(), check_vma=False))(lp, x)
    assert np.isfinite(np.asarray(got, np.float32)).all()


def test_ep_full_model_forward():
    """Whole-model forward with ep_axis routing inside the layer scan."""
    cfg = tiny_cfg(arch="mixtral", n_experts=4, n_experts_active=2,
                   intermediate_size=128)
    params = init_random(cfg, quant=None, dtype=jnp.float32)
    tokens = jnp.asarray(np.array([[5, 9, 2, 7, 33, 1, 8, 20]], np.int32))
    start = jnp.zeros((1,), jnp.int32)
    cache = init_cache(cfg, 1, 16)
    ref, _ = model_step(params, tokens, start, cache, cfg)

    from neural_tpu.parallel.ep import ep_param_specs
    from neural_tpu.runtime.kvcache import KVCache
    mesh = make_mesh(dp=1, ep=4)
    specs = ep_param_specs(params, cfg, tp=False)
    cs = P()  # replicated cache (no tp/dp on this mesh)
    fn = jax.shard_map(
        lambda p, t, s, c: forward(p, t, s, c, cfg, ep_axis="ep"),
        mesh=mesh, in_specs=(specs, P(), P(), KVCache(cs, cs, None, None)),
        out_specs=(P(), KVCache(cs, cs, None, None)), check_vma=False)
    got, _ = jax.jit(fn)(params, tokens, start, init_cache(cfg, 1, 16))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)


# ---------------------------------------------------------------------------
# PP: pipeline training step
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("pp,tp,dp", [(2, 2, 2), (4, 1, 2), (2, 1, 1)])
def test_pp_train_matches_single_device(pp, tp, dp):
    cfg = tiny_cfg(n_layers=4)
    params = init_random(cfg, quant=None, dtype=jnp.float32)
    B, T = max(2, dp * 2), 8
    toks = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (B, T + 1), np.int32))

    def ref_loss(p):
        logits, _ = forward(p, toks[:, :-1],
                            jnp.zeros((B,), jnp.int32), None, cfg)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.take_along_axis(lp, toks[:, 1:, None], axis=-1).mean()

    ref, ref_grads = jax.value_and_grad(ref_loss)(params)

    from neural_tpu.parallel.pp import make_pp_train_step, pp_param_specs
    mesh = make_mesh(dp=dp, pp=pp, tp=tp)
    specs = pp_param_specs(params, cfg, tp=tp > 1)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(
            x, jax.sharding.NamedSharding(mesh, s)) if isinstance(s, P)
        else x, params, specs, is_leaf=lambda x: isinstance(x, P))
    step = make_pp_train_step(params, cfg, mesh, n_microbatches=2, lr=1e-2)
    loss, new_params = step(sharded, toks)

    assert abs(float(loss) - float(ref)) < 3e-2 * max(1.0, float(ref))
    # SGD update must match the single-device update (checks grads incl.
    # the replicated-leaf psum fixups)
    ref_new_embed = params["embed"] - 1e-2 * ref_grads["embed"]
    np.testing.assert_allclose(np.asarray(new_params["embed"]),
                               np.asarray(ref_new_embed),
                               atol=5e-3, rtol=5e-2)
    ref_new_wq = params["layers"]["wq"] - 1e-2 * ref_grads["layers"]["wq"]
    np.testing.assert_allclose(np.asarray(new_params["layers"]["wq"]),
                               np.asarray(ref_new_wq),
                               atol=5e-3, rtol=5e-2)
    lm = "lm_head"
    ref_new_lm = params[lm] - 1e-2 * ref_grads[lm]
    np.testing.assert_allclose(np.asarray(new_params[lm]),
                               np.asarray(ref_new_lm),
                               atol=5e-3, rtol=5e-2)


def test_ep_moe_quantized_experts():
    """QTensor (int4) experts under EP: per-local-expert fused dequant
    GEMMs must match the single-device dense-mixture oracle (the dense
    path already consumes QTensor experts via lax.map)."""
    from neural_tpu.core.qtensor import quantize
    from neural_tpu.core.dtypes import PRESETS
    cfg = tiny_cfg(arch="mixtral", n_experts=4, n_experts_active=2,
                   intermediate_size=128)
    rng = np.random.default_rng(0)
    D, I_, E = cfg.hidden_size, cfg.intermediate_size, cfg.n_experts
    dense = {
        "w_gate": rng.standard_normal((E, D, I_)).astype(np.float32) * .05,
        "w_up": rng.standard_normal((E, D, I_)).astype(np.float32) * .05,
        "w_down": rng.standard_normal((E, I_, D)).astype(np.float32) * .05,
    }
    qcfg = PRESETS["q4_0"]
    qex = {k: jax.tree.map(lambda *xs: jnp.stack(xs),
                           *[quantize(jnp.asarray(w[e]), qcfg)
                             for e in range(E)])
           for k, w in dense.items()}
    lp = {"router": jnp.asarray(
        rng.standard_normal((D, E)).astype(np.float32)) * .1,
        "experts": qex}
    x = jnp.asarray(rng.standard_normal((2, 8, D)), jnp.float32)
    ref = _moe_mlp(x.astype(jnp.bfloat16), lp, cfg)

    from neural_tpu.parallel.ep import ep_moe
    mesh = make_mesh(dp=1, ep=4)
    specs = {"router": P(), "experts": {k: P("ep") for k in qex}}
    got = jax.jit(jax.shard_map(
        lambda lp_, x_: ep_moe(x_, lp_, cfg, "ep",
                               capacity_factor=float(E)),
        mesh=mesh, in_specs=(specs, P()), out_specs=P(),
        check_vma=False))(lp, x.astype(jnp.bfloat16))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_ep_full_model_forward_quantized():
    """Whole quantized-MoE model (int4 experts + int4 dense projections)
    with ep_axis routing — the sharded serving shape for a quantized
    Mixtral."""
    cfg = tiny_cfg(arch="mixtral", n_experts=4, n_experts_active=2,
                   intermediate_size=128)
    params = init_random(cfg, quant="q4_0", dtype=jnp.float32)
    tokens = jnp.asarray(np.array([[5, 9, 2, 7, 33, 1, 8, 20]], np.int32))
    start = jnp.zeros((1,), jnp.int32)
    cache = init_cache(cfg, 1, 16)
    ref, _ = model_step(params, tokens, start, cache, cfg)

    from neural_tpu.parallel.ep import ep_param_specs
    from neural_tpu.runtime.kvcache import KVCache
    mesh = make_mesh(dp=1, ep=4)
    specs = ep_param_specs(params, cfg, tp=False)
    cs = P()
    fn = jax.shard_map(
        lambda p, t, s, c: forward(p, t, s, c, cfg, ep_axis="ep"),
        mesh=mesh, in_specs=(specs, P(), P(), KVCache(cs, cs, None, None)),
        out_specs=(P(), KVCache(cs, cs, None, None)), check_vma=False)
    got, _ = jax.jit(fn)(params, tokens, start, init_cache(cfg, 1, 16))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)
