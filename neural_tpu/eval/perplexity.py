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
    """Returns {"ppl", "nll", "n_tokens", "per_window"}.

    ``batch`` windows are scored per device dispatch (one [batch, ctx]
    teacher-forced eval — cuts gate/PPL wall time ~batch× vs one-window
    dispatches). The last dispatch pads by repeating its final window;
    padded rows are discarded. Results are batch-size independent.
    """
    ids = np.asarray(token_ids, np.int32)
    stride = stride or ctx_size // 2
    batch = max(1, int(batch))
    n = len(ids)
    assert n > ctx_size, "need more tokens than the context window"

    starts = list(range(0, n - ctx_size + 1, stride))
    windows = np.stack([ids[s:s + ctx_size] for s in starts])  # [W, ctx]

    total_nll, total_cnt = 0.0, 0
    per_window: List[float] = []
    for i in range(0, len(starts), batch):
        chunk = windows[i:i + batch]
        nb = len(chunk)
        if nb < batch:       # pad with the last window (static jit shape)
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], batch - nb, axis=0)])
        logits = batch_logits(params, cfg, chunk)              # [B, T, V]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        targets = jnp.asarray(chunk[:, 1:], jnp.int32)
        nll_all = -np.asarray(jnp.take_along_axis(
            logp[:, :-1], targets[:, :, None], axis=-1))[:, :, 0]  # [B, T-1]
        for j in range(nb):
            # score only the last `stride` targets (except the first
            # window, which scores everything — reference behavior)
            scored = nll_all[j] if i + j == 0 else nll_all[j][-stride:]
            total_nll += float(scored.sum())
            total_cnt += len(scored)
            per_window.append(float(np.exp(scored.mean())))
    return {"ppl": float(np.exp(total_nll / total_cnt)),
            "nll": total_nll / total_cnt, "n_tokens": total_cnt,
            "per_window": per_window}
