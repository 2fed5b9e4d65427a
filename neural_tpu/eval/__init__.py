from .perplexity import perplexity
from .diff import logits_diff, compare_vs_hf

__all__ = ["perplexity", "logits_diff", "compare_vs_hf"]
