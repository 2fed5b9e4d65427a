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
    """Accept list[int], list[list[int]] (possibly ragged), numpy, or torch
    tensors."""
    if hasattr(x, "detach"):      # torch tensor
        x = x.detach().cpu().numpy()
    if isinstance(x, (list, tuple)) and x and \
            isinstance(x[0], (list, tuple, np.ndarray)):
        return [list(map(int, row)) for row in x]
    a = np.asarray(x)
    if a.ndim == 1:
        a = a[None]
    return [list(map(int, row)) for row in a]


def quant_config_from_args(weight_dtype="int4", alg="sym", group_size=32,
                           scale_dtype="fp32", compute_dtype="int8",
                           use_ggml=False) -> Optional[QuantConfig]:
    """Reference-style quant knobs → QuantConfig (neural_speed Model.init
    kwargs, __init__.py:142-154; quant_desc encoding :171-180).

    ``weight_dtype``: int1..int8 / nf4 / fp4 / fp8 / fp8_e5m2 (or a preset
    name / QuantConfig, passed through). ``compute_dtype="int8"`` enables
    the dynamic int8-activation compute path (BesTLA comp_int8 analog) for
    prefill; "bf16"/"fp16"/"fp32" keep bf16 activations. ``use_ggml`` maps
    to the ggml-compatible q4_0/q4_1 layouts (sym/asym, group 32).
    """
    from .convert.quant_registry import MIXED_PRESETS, QuantRegistry
    if weight_dtype is None or isinstance(weight_dtype,
                                          (QuantConfig, QuantRegistry)):
        return weight_dtype
    if weight_dtype in MIXED_PRESETS:   # e.g. "mix_int2_int4" (reference
        return MIXED_PRESETS[weight_dtype]  # "llama int2&int4 mixed")
    if weight_dtype in PRESETS:
        return PRESETS[weight_dtype]
    sym = alg == "sym"
    if use_ggml:
        return PRESETS["q4_0" if sym else "q4_1"]
    act_bits = 8 if compute_dtype == "int8" else 16
    sd = "f32" if scale_dtype in ("fp32", "f32") else "bf16"
    if weight_dtype.startswith("int"):
        return QuantConfig(bits=int(weight_dtype[3:]), group_size=group_size,
                           sym=sym, act_bits=act_bits, scale_dtype=sd)
    if weight_dtype in ("nf4", "fp4"):
        return QuantConfig(kind=weight_dtype, group_size=group_size,
                           scale_dtype=sd)
    if weight_dtype in ("fp8", "fp8_e4m3"):
        return QuantConfig(kind="fp8_e4m3", group_size=group_size,
                           scale_dtype=sd)
    if weight_dtype == "fp8_e5m2":
        return QuantConfig(kind="fp8_e5m2", group_size=group_size,
                           scale_dtype=sd)
    raise ValueError(f"unknown weight_dtype {weight_dtype!r}")


class Model:
    """reference: neural_speed.Model (__init__.py:130)."""

    def __init__(self):
        self.params = None
        self.cfg: Optional[ModelConfig] = None
        self.tokenizer = None
        self._session = None       # interactive multi-round state
        self._token_end = True

    # -- loading ------------------------------------------------------------
    def init(self, model_name_or_path: str,
             weight_dtype: Union[str, QuantConfig, None] = "q4_0",
             use_quant: bool = True, use_gptq: bool = False,
             use_awq: bool = False, use_autoround: bool = False,
             alg: str = "sym", group_size: int = 32,
             scale_dtype: str = "fp32", compute_dtype: str = "int8",
             use_ggml: bool = False, model_hub: str = "huggingface",
             dtype="bfloat16", trust_remote_code: bool = False):
        """Load + convert + quantize an HF checkpoint (local path; this
        environment has no network). ``weight_dtype`` is a preset name
        ("q4_0", "int8", "nf4", ...), a QuantConfig, a reference-style name
        ("int4" + alg/group_size/scale_dtype/compute_dtype/use_ggml — see
        :func:`quant_config_from_args`), or None for bf16."""
        import jax.numpy as jnp
        import transformers

        if model_hub != "huggingface":
            raise ValueError(
                f"model_hub {model_hub!r} is not available offline; use a "
                "local huggingface-format directory (reference also "
                "supports 'modelscope', a network hub)")
        if not use_quant:
            weight_dtype = None
        else:
            weight_dtype = quant_config_from_args(
                weight_dtype, alg, group_size, scale_dtype, compute_dtype,
                use_ggml)
        use_gptq = use_gptq or use_autoround  # autoround exports gptq format
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
            # bits from the checkpoint's quantize_config.json (GPTQ covers
            # 2/3/4/8-bit layouts — reference quant_config.h:21-143)
            bits, gsize = 4, None
            qc = getattr(cfg_hf, "quantization_config", None)
            if isinstance(qc, dict) and "bits" in qc:
                bits = int(qc["bits"])
                gsize = qc.get("group_size")
            else:
                qcp = os.path.join(model_name_or_path,
                                   "quantize_config.json")
                if os.path.exists(qcp):
                    import json as _json
                    with open(qcp) as fh:
                        qj = _json.load(fh)
                    bits = int(qj.get("bits", 4))
                    gsize = qj.get("group_size")
            self.params = params_from_gptq_state_dict(
                sd, self.cfg, fmt="awq" if use_awq else "gptq", bits=bits,
                dtype=jdt, group_size=gsize)
        else:
            import glob as _glob
            from .convert.hf import ARCH_MODULES
            streamable = False
            if os.path.isdir(model_name_or_path) and _glob.glob(
                    os.path.join(model_name_or_path, "*.safetensors")):
                try:
                    cfg_hf = transformers.AutoConfig.from_pretrained(
                        model_name_or_path,
                        trust_remote_code=trust_remote_code)
                    streamable = cfg_hf.model_type in ARCH_MODULES
                except Exception:
                    streamable = False
            if streamable:
                # streamed shard-at-a-time conversion: never instantiates
                # the torch model, host RSS ≈ one layer + one shard (the
                # reference's LazyTensor path, convert_llama.py:146-520);
                # this is what makes 70B-class checkpoints convertible.
                # cfg/arch_mod come from the probe's AutoConfig (loaded
                # WITH trust_remote_code — remote-code families would
                # otherwise fail inside the streamer's own config load)
                from .convert.stream import params_from_hf_dir
                arch_mod = ARCH_MODULES[cfg_hf.model_type]
                self.params, self.cfg = params_from_hf_dir(
                    model_name_or_path, weight_dtype, jdt,
                    cfg=arch_mod.config_from_hf(cfg_hf), arch_mod=arch_mod)
            else:
                from .convert.hf import from_hf_model
                model = transformers.AutoModelForCausalLM.from_pretrained(
                    model_name_or_path, trust_remote_code=trust_remote_code)
                self.params, self.cfg = from_hf_model(model, weight_dtype,
                                                      jdt)
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
            from .tokenizer import tokenizer_from_gguf
            self.params, self.cfg = load_gguf(path)
            r = GGUFReader(path)
            if "tokenizer.ggml.tokens" in r.kv:
                self.tokenizer = tokenizer_from_gguf(r)
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

    @staticmethod
    def quant_model(model_path: str, out_path: str,
                    weight_dtype="int4", alg="sym", group_size=32,
                    scale_dtype="fp32", compute_dtype="int8",
                    use_ggml=False):
        """File → file quantization (reference Model.quant_model,
        __init__.py:332 → quant_utils.cpp:269 bestla_quantize). Input: GGUF,
        NTPU checkpoint, or HF directory; output: NTPU checkpoint (or GGUF
        when ``out_path`` ends in .gguf and the dtype has a ggml layout)."""
        from .convert.checkpoint import save_checkpoint
        if out_path.endswith(".gguf"):
            raise ValueError("GGUF output: use convert.gguf_models."
                             "export_gguf on the HF model instead")
        qcfg = quant_config_from_args(weight_dtype, alg, group_size,
                                      scale_dtype, compute_dtype, use_ggml)
        m = Model()
        if os.path.isdir(model_path):
            m.init(model_path, weight_dtype=qcfg)
        else:
            m.init_from_bin(model_path)
            from .convert.hf import requantize
            m.params = requantize(m.params, qcfg)
        save_checkpoint(out_path, m.params, m.cfg)
        return out_path

    # -- generation ----------------------------------------------------------
    def generate(self, input_ids, max_new_tokens: int = 128,
                 do_sample: bool = False, temperature: float = 0.8,
                 top_k: int = 40, top_p: float = 0.95,
                 repetition_penalty: float = 1.1, num_beams: int = 1,
                 seed: int = 0, stop_at_eos: bool = True,
                 streaming: bool = False, max_len: Optional[int] = None,
                 streamer=None, interactive: bool = False,
                 ignore_prompt: bool = False, stopping_criteria=None,
                 session_file: Optional[str] = None,
                 kv_dtype="bf16", n_keep: int = 4,
                 n_discard: Optional[int] = None,
                 mesh=None,
                 **kw) -> List[List[int]]:
        """reference Model.generate (__init__.py:337). Returns full id
        lists (prompt + new tokens), one per input row — or new tokens only
        with ``ignore_prompt=True`` (or on interactive continuation rounds,
        matching the reference's generate_round semantics).

        ``streamer``: HF TextStreamer-style object (.put(ids)/.end()),
        batch 1 only. ``interactive``: keep the KV cache across generate
        calls (multi-round chat; reference reinit/generate_round).
        ``stopping_criteria``: callable(ids_2d, scores) -> bool, checked
        per token. ``kv_dtype``: "bf16" or "int8" KV cache (reference
        memory_dtype); ``n_keep``/``n_discard``: StreamingLLM sink/window
        knobs for ``streaming=True`` (reference CLI --n-keep/--n-discard).
        ``session_file``: prompt-keyed KV snapshot on disk
        (reference CLI --session, main_run.cpp:614 + session files
        model_utils.cpp:1775-1869): if the file exists and its saved
        prompt is a prefix of this one, the matched prefix skips
        re-evaluation; after prefill the state is saved back."""
        assert self.params is not None, "call init first"
        import jax.numpy as jnp
        from .utils.profiling import Timings, maybe_trace
        timings = Timings()
        kvdt = jnp.int8 if kv_dtype in ("int8", jnp.int8) else jnp.bfloat16
        rows = _to_id_list(input_ids)
        if self.cfg.arch in ("llama", "mistral", "mixtral") \
                and self.cfg.vocab_size == 128256:
            # Llama-3 quirk (reference neural_speed/__init__.py:345-348):
            # ensure the prompt starts with <|begin_of_text|> — chat
            # templates sometimes omit it and quality collapses without it.
            bos = self.cfg.bos_token_id
            rows = [r if (r and r[0] == bos) else [bos] + list(r)
                    for r in rows]
        if mesh is None:
            # pick the weight residency that fits this decode shape (packed
            # when there's headroom, native-at-rest when the in-jit
            # conversion copy + KV would exceed HBM — e.g. batch 8 on one
            # 16 GB chip); mesh path shards the weights instead.
            Tmax = max((len(r) for r in rows), default=0)
            S_est = max_len or (self.cfg.max_seq_len if (
                interactive or session_file is not None) else
                min(self.cfg.max_seq_len, Tmax + max_new_tokens))
            self._ensure_native(len(rows), S_est, kvdt)
        if mesh is not None:
            # tensor/data-parallel generation over a jax Mesh: one sharded
            # ragged prefill + one on-device sharded decode loop with the
            # full sampling stack (reference TP CLI path,
            # main_run.cpp:571-600 under mpirun). Params are sharded once
            # and cached on the Model (repeat calls reuse the shards).
            from .parallel.sharding import shard_params
            from .parallel.tp import tp_generate
            assert num_beams == 1, "beam search not supported under mesh"
            unsupported = {
                "streamer": streamer, "stopping_criteria": stopping_criteria,
                "interactive": interactive or None,
                "session_file": session_file,
                "streaming": streaming or None,
            }
            bad = [k for k, v in unsupported.items() if v]
            if bad:
                raise ValueError(
                    f"generate(mesh=...) does not support {bad}; run these "
                    "on the single-device path (drop mesh=)")
            sp = SamplingParams(
                greedy=not do_sample, temperature=temperature, top_k=top_k,
                top_p=top_p, repeat_penalty=repetition_penalty)
            mkey = (id(mesh), id(self.params))
            if getattr(self, "_mesh_key", None) != mkey:
                self._mesh_params = shard_params(self.params, self.cfg, mesh)
                self._mesh_key = mkey
            outs = tp_generate(self._mesh_params, self.cfg, mesh, rows, sp,
                               max_new_tokens, max_len, seed, stop_at_eos,
                               kv_dtype=kvdt, sharded=True)
            if ignore_prompt:
                outs = [o[len(r):] for o, r in zip(outs, rows)]
            return outs
        hooked = (streamer is not None or stopping_criteria is not None
                  or interactive or session_file is not None)
        if session_file is not None:
            assert len(rows) == 1 and num_beams == 1, \
                "session_file supports single-prompt, non-beam generation"
        if not interactive:
            self._session = None
        if streamer is not None:
            assert len(rows) == 1, "Streamer only supports batch size 1."
            assert num_beams == 1, "can not use streamer with beam search"
        if stopping_criteria is not None and num_beams > 1 and not do_sample:
            raise ValueError(
                "stopping_criteria is not applied inside beam search; "
                "use num_beams=1 or post-filter the returned hypotheses")
        if (len(rows) > 1 and num_beams == 1 and not hooked
                and not streaming):
            # batched path: one padded prefill + one on-device decode loop
            # for all rows (reference batch __call__ padding + continuous-
            # batching de-pad, __init__.py:439-483); ~B× aggregate decode
            # throughput vs the row-wise loop.
            from .runtime.generate import batched_generate
            sp = SamplingParams(
                greedy=not do_sample, temperature=temperature, top_k=top_k,
                top_p=top_p, repeat_penalty=repetition_penalty)
            with maybe_trace("generate"), \
                    timings.phase("decode", tokens=max_new_tokens * len(rows)):
                outs = batched_generate(
                    self.params, self.cfg, rows, sp, max_new_tokens,
                    max_len, seed, stop_at_eos, kv_dtype=kvdt)
            if ignore_prompt:
                outs = [o[len(r):] for o, r in zip(outs, rows)]
            timings.print_if_verbose()
            return outs
        outs = []
        for ids in rows:
            if num_beams > 1 and not do_sample:
                from .runtime.beam import beam_search
                hyp = beam_search(self.params, self.cfg, ids,
                                  beam_size=num_beams,
                                  max_new_tokens=max_new_tokens)[0]
                outs.append(hyp.ids[len(ids):] if ignore_prompt else hyp.ids)
                continue
            sp = SamplingParams(
                greedy=not do_sample, temperature=temperature, top_k=top_k,
                top_p=top_p, repeat_penalty=repetition_penalty)
            if hooked:
                outs.append(self._generate_hooked(
                    ids, sp, max_new_tokens, max_len, seed, stop_at_eos,
                    streamer, stopping_criteria, interactive, ignore_prompt,
                    session_file))
            elif streaming:
                from .runtime.streaming import stream_generate
                out = stream_generate(
                    self.params, self.cfg, ids, max_new_tokens,
                    max_len or self.cfg.max_seq_len, n_keep=n_keep,
                    n_discard=n_discard, sampling=sp,
                    seed=seed, stop_at_eos=stop_at_eos, kv_dtype=kvdt)
                outs.append(out[len(ids):] if ignore_prompt else out)
            else:
                from .runtime.generate import generate
                with maybe_trace("generate"), \
                        timings.phase("decode",
                                      tokens=max_new_tokens):
                    out = generate(self.params, self.cfg, ids, sp,
                                   max_new_tokens, max_len, seed,
                                   stop_at_eos, kv_dtype=kvdt)
                outs.append(out[len(ids):] if ignore_prompt else out)
        timings.print_if_verbose()
        return outs

    def _generate_hooked(self, ids, sp, max_new_tokens, max_len, seed,
                         stop_at_eos, streamer, stopping_criteria,
                         interactive, ignore_prompt, session_file=None):
        """Host-stepped generation with per-token hooks and (optionally) a
        KV session kept across calls (reference interactive mode) or on
        disk (reference --session files)."""
        import os as _os

        import jax
        import jax.numpy as jnp
        from .runtime.generate import model_step
        from .runtime.kvcache import init_cache
        from .runtime.sampling import SamplerState, sample

        first_round = self._session is None or not interactive
        if first_round:
            S = max_len or self.cfg.max_seq_len
            cache = init_cache(self.cfg, 1, S)
            pos = 0
        else:
            cache, pos, S = self._session
        eval_ids = list(ids)
        saved_logits = saved_key = saved_mu = None
        if session_file is not None and first_round \
                and _os.path.exists(session_file):
            from .convert.checkpoint import load_session
            scache, slens, extra = load_session(session_file)
            saved = list((extra or {}).get("prompt_ids", []))
            n = int(slens[0])
            # reuse iff the saved prompt is a prefix of ours and the cache
            # geometry matches (reference: session token-prefix match,
            # main_run.cpp "session file matches %d / %d tokens")
            if (saved and saved == list(ids[:len(saved)]) and n == len(saved)
                    and scache.k.shape == cache.k.shape
                    and scache.k.dtype == cache.k.dtype):
                cache, pos = scache, n
                eval_ids = list(ids[n:])
                if not eval_ids:
                    # full match: restore the snapshot's logits + sampler
                    # RNG/state (reference full-state restore,
                    # model_utils.cpp:1659 model_set_state_data) — the
                    # resumed sampled generation is then bit-identical to
                    # the uninterrupted run, with no re-eval at all
                    saved_logits = extra.get("logits")
                    saved_key = extra.get("rng_key")
                    saved_mu = extra.get("sampler_mu")
                    if saved_logits is None:  # pre-full-state session file
                        pos -= 1
                        eval_ids = [ids[-1]]
        if pos + len(eval_ids) + max_new_tokens > S:
            raise ValueError(
                f"context overflow: {pos}+{len(eval_ids)}+{max_new_tokens}"
                f" > {S}; raise max_len or use streaming=True (StreamingLLM)")

        out = list(ids) if (first_round and not ignore_prompt) else []
        if streamer is not None and first_round and not ignore_prompt:
            streamer.put(np.asarray([ids]))
        self._token_end = False

        state = SamplerState.init(1, sp)
        key = jax.random.PRNGKey(seed)
        from .runtime.generate import _plen
        if saved_logits is not None:
            # full-state resume: no eval needed
            plen = _plen(self.cfg, [pos])
            logits = jnp.asarray(saved_logits)[:, None, :]   # [1, 1, V]
            if saved_key is not None:
                key = jnp.asarray(saved_key).astype(jnp.uint32)
            if saved_mu is not None:
                state = SamplerState(mu=jnp.asarray(saved_mu))
        else:
            prompt = jnp.asarray(np.asarray(eval_ids, np.int32)[None, :])
            plen = _plen(self.cfg, [pos + len(eval_ids)])
            logits, cache = model_step(self.params, prompt,
                                       jnp.asarray([pos], jnp.int32), cache,
                                       self.cfg, prompt_len=plen)
            pos += len(eval_ids)
        if session_file is not None and first_round and saved_logits is None:
            from .convert.checkpoint import save_session
            save_session(session_file, cache, [pos],
                         {"prompt_ids": list(ids)},
                         logits=logits[:, -1], rng_key=key,
                         sampler_mu=state.mu)
        full = list(ids) + []
        for i in range(max_new_tokens):
            key, sub = jax.random.split(key)
            hist = np.asarray(full[-sp.repeat_last_n:], np.int32)[None, :]
            tok, state = sample(logits[:, -1], sub, sp, state,
                                prev_tokens=jnp.asarray(hist))
            next_id = int(tok[0])
            out.append(next_id)
            full.append(next_id)
            if streamer is not None:
                streamer.put(np.asarray([[next_id]]))
            if stopping_criteria is not None and stopping_criteria(
                    np.asarray([full]), np.asarray(logits[0, -1])):
                self._token_end = True
                break
            if stop_at_eos and next_id in self.cfg.eos_token_ids:
                self._token_end = True
                break
            if i == max_new_tokens - 1 or pos + 1 >= S:
                self._token_end = True
                break
            logits, cache = model_step(
                self.params, jnp.asarray([[next_id]], jnp.int32),
                jnp.asarray([pos], jnp.int32), cache, self.cfg,
                prompt_len=plen)
            pos += 1
        if streamer is not None:
            streamer.end()
        if interactive:
            self._session = (cache, pos, S)
        return out

    def _ensure_native(self, batch: int = 1, S: Optional[int] = None,
                       kv_dtype=None):
        """Automatic per-shape weight residency (runtime.residency): keep
        the packed form + in-jit conversion when it fits (fastest decode
        slope, 5.3-5.5 ms/tok on a 7B), convert ONCE to the at-rest native
        format (uint8 native-pack / int8 code planes) when the packed
        path's double residency plus this call's KV would exceed HBM —
        measured on a 7B: native-at-rest costs ~15% slope (6.1-6.7 ms/tok
        batch-1) but batch-8 KV@2048 then fits one 16 GB chip (889 tok/s
        aggregate) where the packed path OOMs. ``NTPU_NATIVE_AT_REST=1/0``
        still forces either way."""
        if self.params is None:
            return
        key = (id(self.params), batch, S)
        if getattr(self, "_residency_key", None) == key:
            return
        import jax.numpy as jnp
        from .runtime.residency import ensure_decode_residency
        self.params = ensure_decode_residency(
            self.params, self.cfg, batch, S,
            jnp.bfloat16 if kv_dtype is None else kv_dtype)
        self._residency_key = (id(self.params), batch, S)

    def is_token_end(self) -> bool:
        """reference Model.is_token_end (__init__.py:414)."""
        return self._token_end

    def reset_kv_cache(self):
        """Drop the interactive session (reference reset_kv_cache →
        model.reinit, __init__.py:417)."""
        self._session = None
        self._token_end = True

    def generate_text(self, prompt: str, **kw) -> str:
        assert self.tokenizer is not None, "no tokenizer loaded"
        ids = self.tokenizer.encode(prompt)
        out = self.generate(ids, **kw)[0]
        return self.tokenizer.decode(out[len(ids):])

    # -- whisper ------------------------------------------------------------
    def init_whisper(self, model_name_or_path_or_model, weight_dtype=None):
        """Load a Whisper checkpoint (HF dir or in-memory torch model).

        ``weight_dtype``: quantize the encoder/decoder linears ("int8",
        "q4_0", a QuantConfig, ... — reference quant_whisper.cpp /
        quant_utils.h:79 whisper_model_quantize); None keeps fp."""
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
        self.params, self.cfg = wh.params_from_hf(model, quant=weight_dtype)
        self._whisper = True
        return self

    def transcribe_file(self, wav_path: str, prompt_ids=None,
                        max_new_tokens: int = 224, timestamps: bool = False,
                        language=None, task: str = "transcribe",
                        num_beams: int = 1, length_penalty: float = 1.0,
                        token_timestamps: bool = False):
        """WAV file → token ids (reference: whisper CLI audio_run.cpp).

        ``timestamps=True``: long-form mode — the audio is processed in
        30 s windows advanced by the last decoded timestamp; returns a
        list of (start_s, end_s, token_ids) segments (reference
        whisper_full timestamps path). Otherwise returns one flat id list
        for the first window.

        ``language``: a language code ("en"), a language token id, or
        "auto" (one-step detection over the language block — reference
        whisper_lang_auto_detect). ``task``: "transcribe" or "translate"
        (reference whisper translate plumbing). ``num_beams > 1``: beam
        decode (reference beam-search strategy)."""
        from .models import whisper as wh
        from .utils.audio import load_audio_16k
        audio = load_audio_16k(wav_path)
        mel = wh.log_mel_spectrogram(audio, self.cfg.n_mels)
        if prompt_ids is not None:
            prompt = list(prompt_ids)
        else:
            lang_tok = None
            if language == "auto":
                lang_tok, _ = wh.detect_language(self.params, self.cfg, mel)
            elif isinstance(language, int):
                lang_tok = language
            elif isinstance(language, str):
                assert self.tokenizer is not None, \
                    "language codes need a tokenizer; pass a token id"
                lang_tok = self.tokenizer.convert_tokens_to_ids(
                    f"<|{language}|>")
            prompt = wh.build_forced_prompt(self.cfg, lang_tok, task,
                                            timestamps)
        if timestamps or token_timestamps:
            text_fn = None
            if self.tokenizer is not None:
                text_fn = lambda i: self.tokenizer.decode([i])
            return wh.transcribe_segments(
                self.params, self.cfg, mel, prompt, max_new_tokens,
                token_timestamps=token_timestamps,
                audio=audio if token_timestamps else None,
                token_text_fn=text_fn)
        if num_beams > 1:
            return wh.transcribe_ids_beam(self.params, self.cfg, mel,
                                          prompt, num_beams,
                                          max_new_tokens, length_penalty)
        return wh.transcribe_ids(self.params, self.cfg, mel, prompt,
                                 max_new_tokens)

    def __call__(self, input_ids, pad_token: int = 0):
        """Teacher-forced logits (reference Model.__call__ __init__.py:439).

        Ragged batches are right-padded with ``pad_token`` like the
        reference's batch padding (__init__.py:439-481); logits at pad
        positions (beyond each row's real length) are computed on pad
        inputs and should be ignored by the caller."""
        from .runtime.generate import batch_logits
        rows = _to_id_list(input_ids)
        T = max(len(r) for r in rows)
        padded = np.full((len(rows), T), pad_token, np.int32)
        for b, r in enumerate(rows):
            padded[b, :len(r)] = r
        return np.asarray(batch_logits(self.params, self.cfg, padded))
