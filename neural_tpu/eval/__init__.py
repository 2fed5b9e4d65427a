from .perplexity import perplexity
from .diff import logits_diff, compare_vs_hf
from .harness import loglikelihood, score_choices, make_lm_eval_model

__all__ = ["perplexity", "logits_diff", "compare_vs_hf", "loglikelihood",
           "score_choices", "make_lm_eval_model"]
