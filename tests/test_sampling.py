"""Sampler tests vs straightforward numpy references."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_tpu.runtime.sampling import (
    SamplingParams, SamplerState, sample, top_k_filter, top_p_filter,
    tail_free_filter, typical_filter, apply_penalties, token_counts, NEG)


def logits_fixture(B=2, V=64, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((B, V)).astype(np.float32) * 3)


def alive(x):
    return np.asarray(x > NEG / 2)


def test_top_k():
    l = logits_fixture()
    out = top_k_filter(l, 5)
    assert alive(out).sum(-1).tolist() == [5, 5]
    # survivors are the top-5
    ref = np.argsort(np.asarray(l), axis=-1)[:, -5:]
    for b in range(2):
        assert set(np.nonzero(alive(out)[b])[0]) == set(ref[b])


def test_top_p():
    l = logits_fixture()
    out = top_p_filter(l, 0.5)
    p = jax.nn.softmax(l, -1)
    for b in range(2):
        kept = alive(out)[b]
        ps = np.sort(np.asarray(p[b])[kept])[::-1]
        assert ps.sum() >= 0.5 - 1e-6          # covers the nucleus
        # dropping the smallest kept token must fall below p
        assert ps[:-1].sum() < 0.5 + 1e-6
        assert kept[np.argmax(np.asarray(l[b]))]


def test_top_p_disabled():
    l = logits_fixture()
    assert np.allclose(np.asarray(top_p_filter(l, 1.0)), np.asarray(l))


def test_tfs_keeps_head():
    l = logits_fixture()
    out = tail_free_filter(l, 0.3)
    for b in range(2):
        kept = alive(out)[b]
        assert 1 <= kept.sum() < 64
        assert kept[np.argmax(np.asarray(l[b]))]


def test_typical():
    l = logits_fixture()
    out = typical_filter(l, 0.6)
    for b in range(2):
        kept = alive(out)[b]
        assert 1 <= kept.sum() < 64


def test_penalties():
    V = 16
    logits = jnp.asarray(np.linspace(-2, 2, V, dtype=np.float32))[None]
    toks = jnp.asarray([[3, 3, 5]], jnp.int32)
    counts = token_counts(toks, jnp.ones((1, 3), bool), V)
    assert counts[0, 3] == 2 and counts[0, 5] == 1
    p = SamplingParams(repeat_penalty=2.0, frequency_penalty=0.1,
                       presence_penalty=0.2)
    out = np.asarray(apply_penalties(logits, counts, p))[0]
    ref = np.asarray(logits)[0].copy()
    for t, c in [(3, 2), (5, 1)]:
        ref[t] = ref[t] / 2 if ref[t] > 0 else ref[t] * 2
        ref[t] -= 0.1 * c + 0.2
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_greedy_and_temperature_zero():
    l = logits_fixture()
    p = SamplingParams(greedy=True)
    tok, _ = sample(l, jax.random.PRNGKey(0), p)
    np.testing.assert_array_equal(np.asarray(tok),
                                  np.argmax(np.asarray(l), -1))


def test_sample_respects_topk1():
    l = logits_fixture()
    p = SamplingParams(top_k=1, temperature=1.0)
    tok, _ = sample(l, jax.random.PRNGKey(1), p)
    np.testing.assert_array_equal(np.asarray(tok),
                                  np.argmax(np.asarray(l), -1))


def test_sample_distribution_shifts_with_temperature():
    V = 8
    l = jnp.asarray(np.array([[0, 0, 0, 0, 0, 0, 0, 4.0]], np.float32))
    keys = jax.random.split(jax.random.PRNGKey(0), 200)
    p_hot = SamplingParams(temperature=0.1, top_k=0, top_p=1.0,
                           repeat_penalty=1.0)
    toks = np.array([int(sample(l, k, p_hot)[0][0]) for k in keys[:50]])
    assert (toks == 7).mean() > 0.95
    p_cold = SamplingParams(temperature=5.0, top_k=0, top_p=1.0,
                            repeat_penalty=1.0)
    toks = np.array([int(sample(l, k, p_cold)[0][0]) for k in keys[:50]])
    assert (toks == 7).mean() < 0.9


@pytest.mark.parametrize("version", [1, 2])
def test_mirostat_runs_and_adapts(version):
    B, V = 2, 64
    p = SamplingParams(mirostat=version, temperature=1.0)
    state = SamplerState.init(B, p)
    l = logits_fixture(B, V)
    mus = [np.asarray(state.mu).copy()]
    for i in range(5):
        tok, state = sample(l, jax.random.PRNGKey(i), p, state)
        assert tok.shape == (B,)
        assert np.all((np.asarray(tok) >= 0) & (np.asarray(tok) < V))
        mus.append(np.asarray(state.mu).copy())
    assert not np.allclose(mus[0], mus[-1])  # mu adapts
    assert np.isfinite(mus[-1]).all()


def test_full_pipeline_jits():
    p = SamplingParams()
    l = logits_fixture()
    toks = jnp.asarray([[1, 2, 3]] * 2, jnp.int32)

    @jax.jit
    def f(l, key):
        return sample(l, key, p, prev_tokens=toks)[0]

    tok = f(l, jax.random.PRNGKey(0))
    assert tok.shape == (2,)


def test_generate_with_sampling():
    from neural_tpu.convert import init_random
    from neural_tpu.models.config import ModelConfig
    from neural_tpu.runtime import generate, SamplingParams
    cfg = ModelConfig(arch="llama", vocab_size=128, hidden_size=64,
                      n_layers=2, n_heads=4, n_kv_heads=4, head_dim=16,
                      intermediate_size=128, max_seq_len=64)
    params = init_random(cfg)
    out = generate(params, cfg, [1, 5, 9], max_new_tokens=8,
                   sampling=SamplingParams(temperature=0.7, top_k=10),
                   stop_at_eos=False)
    assert len(out) == 11 and all(0 <= t < 128 for t in out)
    # determinism per seed
    out2 = generate(params, cfg, [1, 5, 9], max_new_tokens=8,
                    sampling=SamplingParams(temperature=0.7, top_k=10),
                    stop_at_eos=False)
    assert out == out2


def test_on_device_sample_loop():
    import jax
    from neural_tpu.convert import init_random
    from neural_tpu.models.config import ModelConfig
    from neural_tpu.runtime import (init_cache, model_step, sample_loop,
                                    SamplingParams)
    cfg = ModelConfig(arch="llama", vocab_size=128, hidden_size=64,
                      n_layers=2, n_heads=4, n_kv_heads=4, head_dim=16,
                      intermediate_size=128, max_seq_len=64)
    params = init_random(cfg)
    cache = init_cache(cfg, 2, 32)
    prompt = jnp.asarray(np.tile([1, 5, 9], (2, 1)), jnp.int32)
    logits, cache = model_step(params, prompt, jnp.zeros((2,), jnp.int32),
                               cache, cfg)
    tok0 = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
    hist = jnp.zeros((2, 16), jnp.int32)
    toks, cache = sample_loop(params, tok0, jnp.full((2,), 3, jnp.int32),
                              cache, cfg, 6,
                              SamplingParams(temperature=0.8, top_p=0.9,
                                             repeat_last_n=16),
                              jax.random.PRNGKey(0), hist)
    assert toks.shape == (6, 2)


# ---------------------------------------------------------------------------
# heterogeneous batched sampling (sample_batched — the fused serving path)
# ---------------------------------------------------------------------------


def test_rowwise_filters_match_scalar_chain():
    """Uniform per-row params must reproduce the scalar filter chain
    exactly (same masks, same cutoffs)."""
    import jax
    from neural_tpu.runtime.sampling import (
        BatchedSamplingParams, batch_params, _rowwise_filters,
        top_k_filter, tail_free_filter, typical_filter, top_p_filter,
        SamplingParams)
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((4, 200)).astype(np.float32))
    sp = SamplingParams(top_k=17, top_p=0.8, tfs_z=0.95, typical_p=0.9)
    bp = batch_params([sp] * 4)
    got = _rowwise_filters(logits, bp)
    ref = top_p_filter(typical_filter(tail_free_filter(
        top_k_filter(logits, 17), 0.95), 0.9), 0.8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_sample_batched_mixed_rows_deterministic():
    """Per-row params apply per row: a top_k=1 row is deterministic, a
    greedy row takes the penalized argmax, an idle greedy row ignores
    filters entirely."""
    import jax
    from neural_tpu.runtime.sampling import (batch_params, sample_batched,
                                             SamplingParams)
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((3, 100)).astype(np.float32))
    rows = [SamplingParams(greedy=True, repeat_penalty=1.0),
            SamplingParams(temperature=0.7, top_k=1, repeat_penalty=1.0),
            SamplingParams(temperature=1.3, top_k=1, top_p=0.5,
                           repeat_penalty=1.0)]
    bp = batch_params(rows)
    mu = jnp.zeros((3,), jnp.float32)
    tok, mu2 = sample_batched(logits, jax.random.PRNGKey(0), bp, mu)
    want = np.argmax(np.asarray(logits), axis=-1)
    np.testing.assert_array_equal(np.asarray(tok), want)  # all det. here
    np.testing.assert_array_equal(np.asarray(mu2), np.asarray(mu))


def test_sample_batched_penalties_and_min_tokens():
    """Per-row penalties use each row's history; mask_eos suppresses the
    whole stop set only on flagged rows."""
    import jax
    from neural_tpu.runtime.sampling import (batch_params, sample_batched,
                                             SamplingParams)
    V = 50
    logits = np.zeros((2, V), np.float32)
    logits[:, 7] = 5.0          # dominant token
    logits[:, 3] = 4.0          # runner-up
    rows = [SamplingParams(greedy=True, repeat_penalty=10.0,
                           repeat_last_n=4),
            SamplingParams(greedy=True, repeat_penalty=10.0,
                           repeat_last_n=4)]
    bp = batch_params(rows, mask_eos=[False, True])
    hist = jnp.asarray([[7, 7, 7, 7], [0, 0, 0, 0]], jnp.int32)
    valid = jnp.asarray([[True] * 4, [False] * 4])
    # row0: 7 penalized away -> 3; row1: eos set {3} masked -> 7 stays
    tok, _ = sample_batched(jnp.asarray(logits), jax.random.PRNGKey(0), bp,
                            jnp.zeros((2,), jnp.float32), eos_ids=(3, 999),
                            prev_tokens=hist, prev_valid=valid)
    np.testing.assert_array_equal(np.asarray(tok), [3, 7])


def test_sample_batched_mirostat_rows_only():
    """Mirostat rows sample under their mu and update it; plain rows keep
    mu untouched."""
    import jax
    from neural_tpu.runtime.sampling import (batch_params, sample_batched,
                                             SamplingParams)
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.standard_normal((2, 300)).astype(np.float32) * 3)
    rows = [SamplingParams(mirostat=2, mirostat_tau=4.0, temperature=1.0,
                           repeat_penalty=1.0),
            SamplingParams(greedy=True, repeat_penalty=1.0)]
    bp = batch_params(rows)
    mu = jnp.asarray([8.0, 8.0], jnp.float32)
    tok, mu2 = sample_batched(logits, jax.random.PRNGKey(3), bp, mu)
    mu2 = np.asarray(mu2)
    assert mu2[0] != 8.0            # adapted
    assert mu2[1] == 8.0            # untouched
    assert int(np.asarray(tok)[1]) == int(np.argmax(np.asarray(logits)[1]))


def test_scheduler_fused_path_mixed_params():
    """Mixed per-request SamplingParams run through the ONE-dispatch fused
    path (no [B, V] logits fetch): greedy request matches sequential
    greedy generation exactly; _sample_many must not be called."""
    import jax
    from neural_tpu.convert import init_random
    from neural_tpu.models.config import ModelConfig
    from neural_tpu.runtime import greedy_generate
    from neural_tpu.serving import Scheduler

    cfg = ModelConfig(arch="llama", vocab_size=128, hidden_size=64,
                      n_layers=2, n_heads=4, n_kv_heads=4, head_dim=16,
                      intermediate_size=128, max_seq_len=128,
                      eos_token_id=-1)
    params = init_random(cfg, dtype=jnp.float32)
    ref = greedy_generate(params, cfg, [3, 5, 7], max_new_tokens=6,
                          stop_at_eos=False)[3:]

    sched = Scheduler(params, cfg, max_batch=4, max_len=64,
                      sampling=SamplingParams(greedy=True,
                                              repeat_penalty=1.0))
    def boom(*a, **k):
        raise AssertionError("fused path must bypass _sample_many")
    sched._sample_many = boom
    sched.add_request("g", [3, 5, 7], max_new_tokens=6)
    sched.add_request("s", [9, 2], max_new_tokens=6,
                      sampling=SamplingParams(temperature=0.9, top_k=20,
                                              repeat_penalty=1.2,
                                              repeat_last_n=32))
    sched.add_request("m", [4, 4], max_new_tokens=6,
                      sampling=SamplingParams(mirostat=2, temperature=1.0,
                                              repeat_penalty=1.0))
    done = {s.request_id: s for s in sched.run_to_completion()}
    assert done["g"].output_ids == ref
    assert len(done["s"].output_ids) == 6 and len(done["m"].output_ids) == 6
