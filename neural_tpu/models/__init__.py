from .config import ModelConfig
from . import llama

__all__ = ["ModelConfig", "llama"]
