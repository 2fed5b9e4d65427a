from .kvcache import init_cache, reorder_batch, copy_seq
from .generate import (model_step, greedy_generate, generate, batch_logits,
                       decode_loop, sample_loop)
from .sampling import SamplingParams, SamplerState, sample

__all__ = ["init_cache", "reorder_batch", "copy_seq", "model_step",
           "greedy_generate", "generate", "batch_logits", "decode_loop",
           "sample_loop", "SamplingParams", "SamplerState", "sample"]
