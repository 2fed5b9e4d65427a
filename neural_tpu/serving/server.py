"""ModelServer: background continuous-batching worker with callbacks.

Mirrors the reference pybind ModelServer (application/main_pybind.cpp:150-323:
ctor spawns a worker thread, ``issueQuery`` appends to the waiting queue,
finished responses surface through a callback) — here a plain Python thread
around the Scheduler (the GIL is released during device execution, so the
worker overlaps with client threads just like the reference's C++ worker).
"""
from __future__ import annotations

import threading
import time
from typing import Callable, List, Optional, Sequence, Tuple

from ..models.config import ModelConfig
from ..runtime.sampling import SamplingParams
from .scheduler import Scheduler, Sequence as Seq


class Query:
    """reference: Query (main_pybind.cpp:59)."""

    def __init__(self, query_id, token_ids, max_new_tokens: int = 128,
                 sampling=None, num_beams: Optional[int] = None,
                 length_penalty: Optional[float] = None,
                 min_new_tokens: Optional[int] = None):
        """Beam fields default to None = inherit the server's defaults."""
        self.id = query_id
        self.token_ids = list(token_ids)
        self.max_new_tokens = max_new_tokens
        self.sampling = sampling
        self.num_beams = num_beams
        self.length_penalty = length_penalty
        self.min_new_tokens = min_new_tokens


class ModelServer:
    def __init__(self, params=None, cfg: Optional[ModelConfig] = None,
                 response_callback: Callable[[List[Seq]], None] = None,
                 max_batch: int = 8, max_len: int = 2048,
                 sampling: Optional[SamplingParams] = None,
                 kv_dtype="bfloat16", poll_interval: float = 0.001,
                 model_path: Optional[str] = None, **server_kwargs):
        """Either pass (params, cfg) directly, or ``model_path`` to a
        converted checkpoint (the reference ctor form,
        __init__.py:534-548). Reference server kwargs are accepted:
        ctx_size → max_len, max_request_num/batch_size → max_batch,
        memory_dtype ("auto"/"f16" → bf16, "int8"), max_new_tokens /
        do_sample / top_k / top_p / temperature / repetition_penalty /
        seed → default per-query sampling, return_prompt;
        num_beams / length_penalty / min_new_tokens → default beam config
        for queries that don't set their own (beam requests run inside the
        batched scheduler step, reference scheduler.cpp:99-148).
        ``threads``, ``scratch_size_ratio``, ``continuous_batching``
        (always on) and ``print_log`` are accepted and ignored (XLA
        schedules compute)."""
        import jax.numpy as jnp
        if model_path is not None and params is None:
            from ..api import Model
            m = Model().init_from_bin(model_path)
            params, cfg = m.params, m.cfg
        assert params is not None and cfg is not None
        kw = dict(server_kwargs)
        max_len = kw.pop("ctx_size", max_len) or max_len
        max_batch = max(kw.pop("max_request_num", max_batch),
                        kw.pop("batch_size", 1))
        md = kw.pop("memory_dtype", None)
        if md is not None:
            kv_dtype = "int8" if md == "int8" else "bfloat16"
        self.default_max_new_tokens = kw.pop("max_new_tokens", 128)
        self.return_prompt = kw.pop("return_prompt", False)
        if sampling is None and (kw.get("do_sample") or "temperature" in kw
                                 or "top_k" in kw or "top_p" in kw
                                 or "repetition_penalty" in kw):
            sampling = SamplingParams(
                greedy=not kw.pop("do_sample", False),
                temperature=kw.pop("temperature", 0.8),
                top_k=kw.pop("top_k", 40), top_p=kw.pop("top_p", 0.95),
                repeat_penalty=kw.pop("repetition_penalty", 1.1))
        # beam defaults for queries that don't set their own (reference
        # gpt_params beam_search/beam_size → in-scheduler beam steps)
        self.default_num_beams = kw.pop("num_beams", 1)
        self.default_length_penalty = kw.pop("length_penalty", 1.0)
        self.default_min_new_tokens = kw.pop("min_new_tokens", 0)
        kw.pop("early_stopping", None)  # HF can't-be-beaten stop is always on
        # StreamingLLM serving (reference shift_roped_k + n_keep/n_discard
        # CLI knobs): per-slot sink+shift when a sequence fills its KV
        streaming = bool(kw.pop("shift_roped_k", False))
        n_keep = kw.pop("n_keep", 4)
        n_discard = kw.pop("n_discard", None)
        if n_keep < 0:       # reference: -1 = keep the whole prompt... which
            n_keep = 4       # is request-dependent; fall back to 4 sinks
        if n_discard is not None and n_discard < 0:
            n_discard = None
        prefill_chunk = kw.pop("prefill_chunk", 512)
        kv_mode = kw.pop("kv_mode", "slots")
        decode_block = kw.pop("decode_block", 1)
        for ignored in ("threads", "scratch_size_ratio",
                        "continuous_batching", "print_log", "seed",
                        "do_sample", "temperature", "top_k", "top_p",
                        "repetition_penalty", "pad_token", "init_cb"):
            kw.pop(ignored, None)
        if kw:
            raise TypeError(f"unknown server kwargs: {sorted(kw)}")
        kv = jnp.bfloat16 if kv_dtype == "bfloat16" else kv_dtype
        self.scheduler = Scheduler(params, cfg, max_batch=max_batch,
                                   max_len=max_len, sampling=sampling,
                                   kv_dtype=kv, kv_mode=kv_mode,
                                   prefill_chunk=prefill_chunk,
                                   streaming=streaming, n_keep=n_keep,
                                   n_discard=n_discard,
                                   decode_block=decode_block)
        self.callback = response_callback
        self._cb_arity = 1
        if response_callback is not None:
            import inspect
            try:  # 2-arg reference form iff (finished, working) can bind
                inspect.signature(response_callback).bind([], 0)
                self._cb_arity = 2
            except TypeError:
                self._cb_arity = 1
            except ValueError:
                self._cb_arity = 1
        self.poll_interval = poll_interval
        self._lock = threading.Lock()
        self._pending: List[Query] = []
        self._draining = False   # queries popped from _pending but not yet
        #                          in the scheduler (Empty() must see them)
        self._outstanding = 0    # issued but not yet delivered (finished
        #                          list / callback) — the Empty() invariant
        self.finished: List[Seq] = []  # drained here when no callback
        self._running = True
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def issueQuery(self, queries, token_ids=None):
        """Thread-safe enqueue (main_pybind.cpp:230). Accepts a list of
        Query objects, a single Query, or the reference's
        ``issueQuery(index, token_ids)`` form (__init__.py:549)."""
        if token_ids is not None:
            queries = [Query(queries, token_ids,
                             self.default_max_new_tokens)]
        elif isinstance(queries, Query):
            queries = [queries]
        with self._lock:
            self._pending.extend(queries)
            self._outstanding += len(queries)

    def Empty(self) -> bool:
        """True iff every issued query has been DELIVERED (callback fired
        or drained into .finished) — not merely finished inside the
        scheduler, so a client that polls Empty() then reads results never
        races the worker."""
        with self._lock:
            return (not self._pending and not self._draining
                    and self._outstanding == 0
                    and not self.scheduler.has_work)

    def stop(self):
        self._running = False
        self._worker.join(timeout=30)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()

    def _loop(self):
        while self._running:
            with self._lock:
                pending, self._pending = self._pending, []
                self._draining = bool(pending)
            for q in pending:
                self.scheduler.add_request(
                    q.id, q.token_ids, q.max_new_tokens,
                    sampling=q.sampling,
                    num_beams=getattr(q, "num_beams", None)
                    or self.default_num_beams,
                    length_penalty=getattr(q, "length_penalty", None)
                    or self.default_length_penalty,
                    min_new_tokens=getattr(q, "min_new_tokens", None)
                    or self.default_min_new_tokens)
            if pending:
                with self._lock:
                    self._draining = False
            if self.scheduler.has_work:
                self.scheduler.step()
                done = self.scheduler.pop_finished()
                if done:
                    if self.callback is not None:
                        # reference callback signature is
                        # response(finished, working_size)
                        # (main_pybind.cpp:209-220); 1-arg callbacks get
                        # just the finished list.
                        if self._cb_arity >= 2:
                            working = (len(self.scheduler.running)
                                       + len(self.scheduler.waiting))
                            self.callback(done, working)
                        else:
                            self.callback(done)
                        with self._lock:
                            self._outstanding -= len(done)
                    else:
                        with self._lock:
                            self.finished.extend(done)
                            self._outstanding -= len(done)
            else:
                time.sleep(self.poll_interval)
