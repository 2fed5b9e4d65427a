"""Logits diff vs a PyTorch reference (reference scripts/cal_diff.py).

Cosine similarity + MSE between our logits and an HF torch model's, over a
prompt set — the quantization-accuracy smoke gate
(tests/test_python_api.py:66-80 analog).
"""
from __future__ import annotations

from typing import Sequence

import numpy as np


def logits_diff(our_logits: np.ndarray, ref_logits: np.ndarray) -> dict:
    a = np.asarray(our_logits, np.float32)
    b = np.asarray(ref_logits, np.float32)
    assert a.shape == b.shape, (a.shape, b.shape)
    flat_a = a.reshape(-1, a.shape[-1])
    flat_b = b.reshape(-1, b.shape[-1])
    cos = np.sum(flat_a * flat_b, -1) / (
        np.linalg.norm(flat_a, axis=-1) * np.linalg.norm(flat_b, axis=-1)
        + 1e-9)
    mse = float(np.mean((flat_a - flat_b) ** 2))
    return {"cos_mean": float(cos.mean()), "cos_min": float(cos.min()),
            "mse": mse,
            "argmax_agree": float((flat_a.argmax(-1) ==
                                   flat_b.argmax(-1)).mean())}


def compare_vs_hf(model_api, hf_model, prompts: Sequence[Sequence[int]]):
    import torch
    results = []
    for p in prompts:
        ours = model_api([list(p)])
        with torch.no_grad():
            ref = hf_model(torch.tensor([list(p)])).logits.numpy()
        results.append(logits_diff(ours, ref))
    agg = {k: float(np.mean([r[k] for r in results])) for k in results[0]}
    agg["per_prompt"] = results
    return agg
