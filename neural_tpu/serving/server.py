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
                 sampling=None):
        self.id = query_id
        self.token_ids = list(token_ids)
        self.max_new_tokens = max_new_tokens
        self.sampling = sampling


class ModelServer:
    def __init__(self, params, cfg: ModelConfig,
                 response_callback: Callable[[List[Seq]], None],
                 max_batch: int = 8, max_len: int = 2048,
                 sampling: Optional[SamplingParams] = None,
                 kv_dtype="bfloat16", poll_interval: float = 0.001):
        import jax.numpy as jnp
        kv = jnp.bfloat16 if kv_dtype == "bfloat16" else kv_dtype
        self.scheduler = Scheduler(params, cfg, max_batch=max_batch,
                                   max_len=max_len, sampling=sampling,
                                   kv_dtype=kv)
        self.callback = response_callback
        self.poll_interval = poll_interval
        self._lock = threading.Lock()
        self._pending: List[Query] = []
        self._running = True
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def issueQuery(self, queries: Sequence[Query]):
        """Thread-safe enqueue (main_pybind.cpp:230)."""
        with self._lock:
            self._pending.extend(queries)

    def Empty(self) -> bool:
        with self._lock:
            return not self._pending and not self.scheduler.has_work

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
            for q in pending:
                self.scheduler.add_request(q.id, q.token_ids,
                                           q.max_new_tokens,
                                           sampling=q.sampling)
            if self.scheduler.has_work:
                self.scheduler.step()
                done = self.scheduler.pop_finished()
                if done:
                    self.callback(done)
            else:
                time.sleep(self.poll_interval)
