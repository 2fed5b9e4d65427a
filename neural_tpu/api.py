"""Top-level Model API.

Mirrors the reference Python surface (neural_speed/__init__.py:130-530
``Model.init / init_from_bin / generate / __call__ / quant_model`` and
``ModelServer``): one object that loads an HF checkpoint (or GGUF / GPTQ /
native file), quantizes, tokenizes, and generates — all on the TPU-native
stack underneath.
"""
from __future__ import annotations

import os
from typing import Any, List, Optional, Sequence, Union

import numpy as np

from .core.dtypes import PRESETS, QuantConfig
from .models.config import ModelConfig
from .runtime.sampling import SamplingParams


def _to_id_list(x) -> List[List[int]]:
    """Accept list[int], list[list[int]], numpy, or torch tensors."""
    if hasattr(x, "detach"):      # torch tensor
        x = x.detach().cpu().numpy()
    a = np.asarray(x)
    if a.ndim == 1:
        a = a[None]
    return [list(map(int, row)) for row in a]


class Model:
    """reference: neural_speed.Model (__init__.py:130)."""

    def __init__(self):
        self.params = None
        self.cfg: Optional[ModelConfig] = None
        self.tokenizer = None

    # -- loading ------------------------------------------------------------
    def init(self, model_name_or_path: str,
             weight_dtype: Union[str, QuantConfig, None] = "q4_0",
             use_gptq: bool = False, use_awq: bool = False,
             dtype="bfloat16", trust_remote_code: bool = False):
        """Load + convert + quantize an HF checkpoint (local path; this
        environment has no network). ``weight_dtype`` is a preset name
        ("q4_0", "int8", "nf4", ...), a QuantConfig, or None for bf16."""
        import jax.numpy as jnp
        import transformers

        jdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        if use_gptq or use_awq:
            from .convert.gptq import params_from_gptq_state_dict
            from .convert.hf import ARCH_MODULES
            import torch
            cfg_hf = transformers.AutoConfig.from_pretrained(
                model_name_or_path, trust_remote_code=trust_remote_code)
            mod = ARCH_MODULES[cfg_hf.model_type]
            self.cfg = mod.config_from_hf(cfg_hf)
            sd = {}
            import glob as _glob
            import safetensors.numpy as stn
            for f in sorted(_glob.glob(
                    os.path.join(model_name_or_path, "*.safetensors"))):
                sd.update(stn.load_file(f))
            self.params = params_from_gptq_state_dict(
                sd, self.cfg, fmt="awq" if use_awq else "gptq", dtype=jdt)
        else:
            from .convert.hf import from_hf_model
            import transformers
            model = transformers.AutoModelForCausalLM.from_pretrained(
                model_name_or_path, trust_remote_code=trust_remote_code)
            self.params, self.cfg = from_hf_model(model, weight_dtype, jdt)
        try:
            import transformers
            self.tokenizer = transformers.AutoTokenizer.from_pretrained(
                model_name_or_path, trust_remote_code=trust_remote_code)
        except Exception:
            self.tokenizer = None
        return self

    def init_from_hf_model(self, model,
                           weight_dtype: Union[str, QuantConfig, None] = "q4_0",
                           dtype="bfloat16"):
        """In-memory HF torch model → ready Model (no files)."""
        import jax.numpy as jnp
        from .convert.hf import from_hf_model
        jdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        self.params, self.cfg = from_hf_model(model, weight_dtype, jdt)
        return self

    def init_from_bin(self, path: str):
        """Load a GGUF or native .ntpu checkpoint (reference init_from_bin,
        __init__.py:227)."""
        with open(path, "rb") as f:
            magic = f.read(4)
        if magic == b"GGUF":
            from .convert.gguf_models import load_gguf
            from .convert.gguf import GGUFReader
            from .tokenizer import SPMTokenizer
            self.params, self.cfg = load_gguf(path)
            r = GGUFReader(path)
            if "tokenizer.ggml.tokens" in r.kv:
                self.tokenizer = SPMTokenizer.from_gguf(r)
            r.close()
        elif magic == b"NTPU":
            from .convert.checkpoint import load_checkpoint
            self.params, self.cfg, _ = load_checkpoint(path)
        else:
            raise ValueError(f"unknown checkpoint magic {magic!r}")
        return self

    def save(self, path: str):
        from .convert.checkpoint import save_checkpoint
        save_checkpoint(path, self.params, self.cfg)

    # -- generation ----------------------------------------------------------
    def generate(self, input_ids, max_new_tokens: int = 128,
                 do_sample: bool = False, temperature: float = 0.8,
                 top_k: int = 40, top_p: float = 0.95,
                 repetition_penalty: float = 1.1, num_beams: int = 1,
                 seed: int = 0, stop_at_eos: bool = True,
                 streaming: bool = False, max_len: Optional[int] = None,
                 **kw) -> List[List[int]]:
        """reference Model.generate (__init__.py:337). Returns full id
        lists (prompt + new tokens), one per input row."""
        assert self.params is not None, "call init first"
        from .utils.profiling import Timings, maybe_trace
        timings = Timings()
        rows = _to_id_list(input_ids)
        outs = []
        for ids in rows:
            if num_beams > 1:
                from .runtime.beam import beam_search
                hyp = beam_search(self.params, self.cfg, ids,
                                  beam_size=num_beams,
                                  max_new_tokens=max_new_tokens)[0]
                outs.append(hyp.ids)
                continue
            sp = SamplingParams(
                greedy=not do_sample, temperature=temperature, top_k=top_k,
                top_p=top_p, repeat_penalty=repetition_penalty)
            if streaming:
                from .runtime.streaming import stream_generate
                outs.append(stream_generate(
                    self.params, self.cfg, ids, max_new_tokens,
                    max_len or self.cfg.max_seq_len, sampling=sp,
                    seed=seed, stop_at_eos=stop_at_eos))
            else:
                from .runtime.generate import generate
                with maybe_trace("generate"), \
                        timings.phase("decode",
                                      tokens=max_new_tokens):
                    outs.append(generate(self.params, self.cfg, ids, sp,
                                         max_new_tokens, max_len, seed,
                                         stop_at_eos))
        timings.print_if_verbose()
        return outs

    def generate_text(self, prompt: str, **kw) -> str:
        assert self.tokenizer is not None, "no tokenizer loaded"
        ids = self.tokenizer.encode(prompt)
        out = self.generate(ids, **kw)[0]
        return self.tokenizer.decode(out[len(ids):])

    # -- whisper ------------------------------------------------------------
    def init_whisper(self, model_name_or_path_or_model):
        """Load a Whisper checkpoint (HF dir or in-memory torch model)."""
        from .models import whisper as wh
        if isinstance(model_name_or_path_or_model, str):
            import transformers
            model = transformers.WhisperForConditionalGeneration \
                .from_pretrained(model_name_or_path_or_model)
            try:
                self.tokenizer = transformers.WhisperTokenizer \
                    .from_pretrained(model_name_or_path_or_model)
            except Exception:
                self.tokenizer = None
        else:
            model = model_name_or_path_or_model
        self.params, self.cfg = wh.params_from_hf(model)
        self._whisper = True
        return self

    def transcribe_file(self, wav_path: str, prompt_ids=None,
                        max_new_tokens: int = 224):
        """WAV file → token ids (reference: whisper CLI audio_run.cpp)."""
        from .models import whisper as wh
        from .utils.audio import load_audio_16k
        audio = load_audio_16k(wav_path)
        mel = wh.log_mel_spectrogram(audio, self.cfg.n_mels)
        prompt = list(prompt_ids) if prompt_ids is not None \
            else [self.cfg.sot_token_id]
        return wh.transcribe_ids(self.params, self.cfg, mel, prompt,
                                 max_new_tokens)

    def __call__(self, input_ids, **kw):
        """Teacher-forced logits (reference Model.__call__ __init__.py:439)."""
        from .runtime.generate import batch_logits
        rows = _to_id_list(input_ids)
        T = max(len(r) for r in rows)
        assert all(len(r) == T for r in rows), \
            "ragged batches: pad or call row-wise"
        return np.asarray(batch_logits(
            self.params, self.cfg, np.asarray(rows, np.int32)))
