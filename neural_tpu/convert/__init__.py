from .hf import from_hf_model, init_random, build_params, register_arch

__all__ = ["from_hf_model", "init_random", "build_params", "register_arch"]
