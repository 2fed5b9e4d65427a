"""Perplexity + diff harness tests."""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import neural_tpu as nt
from neural_tpu.eval import perplexity, compare_vs_hf


def tiny():
    torch.manual_seed(0)
    return transformers.LlamaForCausalLM(transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=352,
        num_hidden_layers=2, num_attention_heads=8,
        num_key_value_heads=4)).eval()


def test_perplexity_matches_torch():
    hf = tiny()
    m = nt.Model().init_from_hf_model(hf, weight_dtype=None, dtype="float32")
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 256, 96).tolist()
    res = perplexity(m.params, m.cfg, ids, ctx_size=32, stride=16)
    assert res["n_tokens"] > 0 and res["ppl"] > 1

    # torch reference on the first window
    import torch as t
    with t.no_grad():
        lg = hf(t.tensor([ids[:32]])).logits[0]
        lp = t.log_softmax(lg.float(), -1)
        nll = -lp[range(31), ids[1:32]].mean()
    first_window_ppl = float(np.exp(nll))
    assert abs(res["per_window"][0] - first_window_ppl) / first_window_ppl < 0.02


def test_int4_ppl_delta_reasonable():
    hf = tiny()
    m16 = nt.Model().init_from_hf_model(hf, weight_dtype=None, dtype="float32")
    m4 = nt.Model().init_from_hf_model(hf, weight_dtype="q4_0", dtype="float32")
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 256, 80).tolist()
    p16 = perplexity(m16.params, m16.cfg, ids, ctx_size=32, stride=16)["ppl"]
    p4 = perplexity(m4.params, m4.cfg, ids, ctx_size=32, stride=16)["ppl"]
    # int4 on a tiny random model: ppl within a factor of ~1.5 of fp
    assert p4 / p16 < 1.5, (p4, p16)


def test_compare_vs_hf():
    hf = tiny()
    m = nt.Model().init_from_hf_model(hf, weight_dtype="q4_0",
                                      dtype="float32")
    res = compare_vs_hf(m, hf, [[3, 5, 9], [8, 2, 4]])
    assert res["cos_min"] > 0.95
    assert 0 <= res["argmax_agree"] <= 1


def test_loglikelihood_matches_torch():
    hf = tiny()
    m = nt.Model().init_from_hf_model(hf, weight_dtype=None, dtype="float32")
    from neural_tpu.eval import loglikelihood, score_choices
    ctx, cont = [3, 17, 91], [4, 120]
    ll, greedy = loglikelihood(m.params, m.cfg, ctx, cont)
    import torch as t
    with t.no_grad():
        lg = hf(t.tensor([ctx + cont])).logits[0].float()
        lp = t.log_softmax(lg, -1)
        ref = float(lp[2, 4] + lp[3, 120])
    assert abs(ll - ref) < 5e-3, (ll, ref)

    # score_choices picks the higher-likelihood continuation
    good = [int(np.argmax(np.asarray(m([[3, 17, 91]]))[0, -1]))]
    bad = [(good[0] + 7) % 256]
    assert score_choices(m.params, m.cfg, [3, 17, 91], [bad, good]) == 1


def test_lm_eval_adapter_gated():
    m = nt.Model()
    from neural_tpu.eval import make_lm_eval_model
    with pytest.raises(ImportError):
        make_lm_eval_model(m)
