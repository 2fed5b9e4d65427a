"""Sliding-window perplexity (reference scripts/perplexity.py:58).

PPL over a long token stream with a fixed context window and stride:
windows of ``ctx_size`` tokens, scored on the last ``stride`` positions
(teacher-forced), exp of the mean NLL.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..runtime.generate import batch_logits


def perplexity(params, cfg: ModelConfig, token_ids: Sequence[int],
               ctx_size: int = 512, stride: Optional[int] = None,
               batch: int = 1) -> dict:
    """Returns {"ppl", "nll", "n_tokens", "per_window"}."""
    ids = np.asarray(token_ids, np.int32)
    stride = stride or ctx_size // 2
    n = len(ids)
    assert n > ctx_size, "need more tokens than the context window"

    total_nll, total_cnt = 0.0, 0
    per_window: List[float] = []
    start = 0
    while start + ctx_size <= n:
        window = ids[start:start + ctx_size][None, :]
        logits = np.asarray(batch_logits(params, cfg, window),
                            np.float32)[0]                      # [T, V]
        logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
        targets = window[0, 1:]
        nll_all = -np.asarray(
            jnp.take_along_axis(logp[:-1], jnp.asarray(targets)[:, None],
                                axis=-1))[:, 0]
        # score only the last `stride` targets (except the first window,
        # which scores everything — reference behavior)
        scored = nll_all if start == 0 else nll_all[-stride:]
        total_nll += float(scored.sum())
        total_cnt += len(scored)
        per_window.append(float(np.exp(scored.mean())))
        start += stride
    return {"ppl": float(np.exp(total_nll / total_cnt)),
            "nll": total_nll / total_cnt, "n_tokens": total_cnt,
            "per_window": per_window}
