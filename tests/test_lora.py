"""LoRA merge tests (reference model_apply_lora path)."""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from neural_tpu.convert.lora import merge_lora, from_hf_model_with_lora
from neural_tpu.runtime import batch_logits


def tiny():
    torch.manual_seed(0)
    return transformers.LlamaForCausalLM(transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4)).eval()


def test_merge_matches_manual():
    m = tiny()
    rng = np.random.default_rng(0)
    r = 4
    A = rng.standard_normal((r, 64)).astype(np.float32) * 0.1
    B = rng.standard_normal((64, r)).astype(np.float32) * 0.1
    lora = {
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight": A,
        "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight": B,
    }
    sd = {k: v.detach().float().numpy() for k, v in m.state_dict().items()}
    merged = merge_lora(sd, lora, alpha=8.0)
    target = "model.layers.0.self_attn.q_proj.weight"
    np.testing.assert_allclose(
        merged[target], sd[target] + 2.0 * (B @ A), rtol=1e-5)

    # merged model behaves like torch with the same weight surgery
    params, cfg = from_hf_model_with_lora(m, lora, alpha=8.0, quant=None,
                                          dtype=jnp.float32)
    with torch.no_grad():
        m.model.layers[0].self_attn.q_proj.weight += torch.tensor(2.0 * (B @ A))
        ref = m(torch.tensor([[3, 5, 9, 2]])).logits[0].numpy()
    ours = np.asarray(batch_logits(params, cfg,
                                   np.asarray([[3, 5, 9, 2]], np.int32)))[0]
    np.testing.assert_allclose(ours, ref, atol=3e-2, rtol=3e-2)


def test_no_match_raises():
    with pytest.raises(ValueError):
        merge_lora({"w": np.zeros((2, 2), np.float32)}, {"junk": np.zeros(2)})
