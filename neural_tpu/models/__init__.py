from .config import ModelConfig
from . import (llama, gptj, gptneox, opt, bloom, mpt, falcon, starcoder,
               qwen, phi, gemma, stablelm, baichuan, chatglm, grok)

__all__ = ["ModelConfig", "llama", "gptj", "gptneox", "opt", "bloom", "mpt",
           "falcon", "starcoder", "qwen", "phi", "gemma", "stablelm",
           "baichuan", "chatglm", "grok"]
