from .kvcache import init_cache, reorder_batch, copy_seq
from .generate import model_step, greedy_generate, batch_logits

__all__ = ["init_cache", "reorder_batch", "copy_seq", "model_step",
           "greedy_generate", "batch_logits"]
