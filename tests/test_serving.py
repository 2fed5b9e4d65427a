"""Continuous-batching scheduler/server tests.

Mirrors the reference test_model_server.py (12-prompt server run compared
against loop generation).
"""
import time

import numpy as np
import pytest
import jax.numpy as jnp

from neural_tpu.convert import init_random
from neural_tpu.models.config import ModelConfig
from neural_tpu.runtime import greedy_generate, SamplingParams
from neural_tpu.serving import Scheduler, ModelServer, Query


def tiny_cfg():
    return ModelConfig(arch="llama", vocab_size=128, hidden_size=64,
                       n_layers=2, n_heads=4, n_kv_heads=4, head_dim=16,
                       intermediate_size=128, max_seq_len=128,
                       eos_token_id=999)  # never hit


@pytest.fixture(scope="module")
def model():
    cfg = tiny_cfg()
    return init_random(cfg, dtype=jnp.float32), cfg


def ref_outputs(params, cfg, prompts, n_new):
    return [greedy_generate(params, cfg, p, max_new_tokens=n_new,
                            stop_at_eos=False)[len(p):] for p in prompts]


def test_scheduler_matches_sequential(model):
    params, cfg = model
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(1, 128, rng.integers(3, 20)))
               for _ in range(12)]
    n_new = 8
    ref = ref_outputs(params, cfg, prompts, n_new)

    sched = Scheduler(params, cfg, max_batch=4, max_len=64,
                      sampling=SamplingParams(greedy=True, repeat_penalty=1.0),
                      prefill_buckets=(32,))
    for i, p in enumerate(prompts):
        sched.add_request(f"q{i}", p, max_new_tokens=n_new)
    done = sched.run_to_completion()
    assert len(done) == 12
    got = {s.request_id: s.output_ids for s in done}
    # The scheduler prefills through a padded-bucket graph, a different XLA
    # compilation than the reference loop; on tiny random models a borderline
    # argmax (sub-1e-3 logit margins) can flip. Require near-total agreement.
    exact = sum(got[f"q{i}"] == ref[i] for i in range(12))
    assert exact >= 10, [(i, got[f"q{i}"], ref[i]) for i in range(12)
                         if got[f"q{i}"] != ref[i]]


def test_scheduler_interleaves(model):
    """More requests than slots → some must wait; all finish."""
    params, cfg = model
    sched = Scheduler(params, cfg, max_batch=2, max_len=64,
                      prefill_buckets=(32,),
                      sampling=SamplingParams(greedy=True, repeat_penalty=1.0))
    for i in range(5):
        sched.add_request(f"q{i}", [1 + i, 2, 3], max_new_tokens=6)
    done = sched.run_to_completion()
    assert len(done) == 5
    assert all(len(s.output_ids) == 6 for s in done)


def test_model_server_threaded(model):
    params, cfg = model
    results = {}

    def cb(done):
        for s in done:
            results[s.request_id] = s.output_ids

    with ModelServer(params, cfg, cb, max_batch=2, max_len=64,
                     sampling=SamplingParams(greedy=True, repeat_penalty=1.0)) as srv:
        srv.issueQuery([Query(f"q{i}", [5, 6, 7 + i], 5) for i in range(4)])
        t0 = time.time()
        while len(results) < 4 and time.time() - t0 < 120:
            time.sleep(0.05)
    assert len(results) == 4
    ref = ref_outputs(params, cfg, [[5, 6, 7 + i] for i in range(4)], 5)
    exact = sum(results[f"q{i}"] == ref[i] for i in range(4))
    assert exact >= 3, (results, ref)


def test_per_request_sampling(model):
    params, cfg = model
    sched = Scheduler(params, cfg, max_batch=2, max_len=64,
                      prefill_buckets=(32,),
                      sampling=SamplingParams(greedy=True,
                                              repeat_penalty=1.0))
    sched.add_request("greedy", [5, 9, 2], max_new_tokens=6)
    sched.add_request("hot", [5, 9, 2], max_new_tokens=6,
                      sampling=SamplingParams(temperature=1.5, top_k=0,
                                              top_p=1.0,
                                              repeat_penalty=1.0))
    done = {s.request_id: s.output_ids for s in sched.run_to_completion()}
    ref = ref_outputs(params, cfg, [[5, 9, 2]], 6)[0]
    assert done["greedy"] == ref
    assert len(done["hot"]) == 6  # sampled path ran


def test_model_server_reference_kwargs(model, tmp_path):
    """Reference ctor form: model_path + server kwargs + issueQuery(i, ids)
    (neural_speed __init__.py:534-553)."""
    import neural_tpu as nt

    params, cfg = model
    m = nt.Model()
    m.params, m.cfg = params, cfg
    p = str(tmp_path / "srv.ntpu")
    m.save(p)

    got = {}
    srv = ModelServer(model_path=p,
                      response_callback=lambda seqs: got.update(
                          {s.request_id: list(s.output_ids) for s in seqs}),
                      ctx_size=64, max_request_num=2, batch_size=1,
                      memory_dtype="auto", max_new_tokens=4,
                      continuous_batching=True, threads=8,
                      scratch_size_ratio=2, do_sample=False,
                      temperature=1.0, top_k=1, top_p=1.0,
                      repetition_penalty=1.0, seed=3)
    try:
        srv.issueQuery(0, [3, 17, 91])
        srv.issueQuery(Query(1, [9, 33], max_new_tokens=3))
        t0 = time.time()
        while (not srv.Empty() or len(got) < 2) and time.time() - t0 < 120:
            time.sleep(0.05)
    finally:
        srv.stop()
    assert set(got) == {0, 1}
    assert len(got[0]) == 4 and len(got[1]) == 3

    with pytest.raises(TypeError):
        ModelServer(params=params, cfg=cfg, response_callback=lambda s: None,
                    not_a_real_kwarg=1).stop()


def test_scheduler_beam_matches_standalone(model):
    """In-scheduler beam search (reference scheduler.cpp:99-148 runs beam
    steps inside the worker) must reproduce the standalone beam_search
    result, even with greedy traffic sharing the batch."""
    from neural_tpu.runtime.beam import beam_search

    params, cfg = model
    prompt = [3, 11, 7, 29]
    n_new, W = 6, 3
    ref = beam_search(params, cfg, prompt, beam_size=W,
                      max_new_tokens=n_new, max_len=64)

    sched = Scheduler(params, cfg, max_batch=4, max_len=64,
                      prefill_buckets=(32,),
                      sampling=SamplingParams(greedy=True,
                                              repeat_penalty=1.0))
    sched.add_request("beam", prompt, max_new_tokens=n_new, num_beams=W)
    sched.add_request("greedy", [5, 6, 7], max_new_tokens=n_new)
    done = {s.request_id: s for s in sched.run_to_completion()}
    assert set(done) == {"beam", "greedy"}

    got = done["beam"]
    want_ids = ref[0].ids[len(prompt):]
    assert got.output_ids == want_ids, (got.output_ids, want_ids)
    # all W hypotheses surface, scores sorted and matching
    assert len(got.hypotheses) == W
    for (ids, score), hyp in zip(got.hypotheses, ref):
        assert ids == hyp.ids[len(prompt):]
        np.testing.assert_allclose(score, hyp.score, rtol=1e-4, atol=1e-5)
    # greedy request unaffected by sharing the batch with a beam group
    ref_g = ref_outputs(params, cfg, [[5, 6, 7]], n_new)[0]
    assert done["greedy"].output_ids == ref_g


def test_scheduler_beam_blocks_until_slots(model):
    """A beam request needing W contiguous slots defers until they free."""
    params, cfg = model
    sched = Scheduler(params, cfg, max_batch=4, max_len=64,
                      prefill_buckets=(32,),
                      sampling=SamplingParams(greedy=True,
                                              repeat_penalty=1.0))
    for i in range(3):
        sched.add_request(f"g{i}", [2 + i, 3, 4], max_new_tokens=4)
    sched.add_request("beam", [9, 8], max_new_tokens=4, num_beams=3)
    done = {s.request_id: s for s in sched.run_to_completion()}
    assert set(done) == {"g0", "g1", "g2", "beam"}
    assert len(done["beam"].output_ids) <= 4
    assert len(done["beam"].hypotheses) == 3


def test_server_beam_query(model):
    """Beam queries through ModelServer (reference num_beams kwarg)."""
    from neural_tpu.runtime.beam import beam_search

    params, cfg = model
    prompt = [4, 19, 2]
    ref = beam_search(params, cfg, prompt, beam_size=2, max_new_tokens=4,
                      max_len=64)
    got = {}
    with ModelServer(params, cfg,
                     lambda seqs: got.update({s.request_id: s for s in seqs}),
                     max_batch=4, max_len=64,
                     sampling=SamplingParams(greedy=True,
                                             repeat_penalty=1.0)) as srv:
        srv.issueQuery(Query("b", prompt, 4, num_beams=2))
        t0 = time.time()
        while "b" not in got and time.time() - t0 < 120:
            time.sleep(0.05)
    assert got["b"].output_ids == ref[0].ids[len(prompt):]


def test_chunked_prefill_matches_and_interleaves(model):
    """Chunked prefill (mixed prefill+decode steps): outputs match the
    sequential reference, and running decodes advance on EVERY scheduler
    iteration while a long prompt prefills — the decode-latency bound the
    reference gets from mixed prefill+decode inputs (scheduler.cpp:55-98)."""
    params, cfg = model
    rng = np.random.default_rng(3)
    long_prompt = list(rng.integers(1, 128, 25))   # 4 chunks of 8
    short = [5, 6, 7]
    n_new = 12
    ref_long = ref_outputs(params, cfg, [long_prompt], n_new)[0]

    sched = Scheduler(params, cfg, max_batch=2, max_len=64,
                      prefill_buckets=(8, 16, 32), prefill_chunk=8,
                      sampling=SamplingParams(greedy=True,
                                              repeat_penalty=1.0))
    sched.add_request("short", short, max_new_tokens=n_new)
    sched.step()                      # prefill short (1 chunk) + decode
    assert sched.running
    sched.add_request("long", long_prompt, max_new_tokens=n_new)
    short_seq = next(iter(sched.running.values()))
    # 4 iterations: each advances one chunk of the long prompt AND one
    # decode step of the short sequence
    grew = []
    for _ in range(4):
        before = len(short_seq.output_ids)
        sched.step()
        grew.append(len(short_seq.output_ids) == before + 1)
    assert all(grew), grew            # no decode stall during long prefill
    done = {s.request_id: s.output_ids for s in sched.run_to_completion()}
    assert done["long"] == ref_long
    assert len(done["short"]) == n_new


def test_chunked_prefill_paged(model):
    """Chunked prefill composes with the paged KV pool (pad-tail offsets
    must stay inside the slot's reserved pages)."""
    params, cfg = model
    rng = np.random.default_rng(5)
    prompts = [list(rng.integers(1, 128, n)) for n in (25, 11, 3, 30)]
    n_new = 6
    ref = ref_outputs(params, cfg, prompts, n_new)
    sched = Scheduler(params, cfg, max_batch=2, max_len=64,
                      prefill_buckets=(8, 16, 32), prefill_chunk=8,
                      kv_mode="paged", page_size=16,
                      sampling=SamplingParams(greedy=True,
                                              repeat_penalty=1.0))
    for i, p in enumerate(prompts):
        sched.add_request(f"q{i}", p, max_new_tokens=n_new)
    done = {s.request_id: s.output_ids for s in sched.run_to_completion()}
    exact = sum(done[f"q{i}"] == ref[i] for i in range(len(prompts)))
    assert exact >= len(prompts) - 1, (done, ref)


def test_scheduler_streaming_matches_stream_generate(model):
    """Serving StreamingLLM (per-slot sink+shift) == the single-sequence
    stream_generate oracle, through multiple shift events."""
    from neural_tpu.runtime.streaming import stream_generate
    params, cfg = model
    max_len, n_keep, n_discard = 32, 2, 8
    prompts = [[3, 14, 15, 9], [7, 8], [21, 22, 23], [40, 41, 42, 43, 44]]
    n_new = 48                        # overflows a 32-slot cache twice
    ref = [stream_generate(params, cfg, p, n_new, max_len, n_keep=n_keep,
                           n_discard=n_discard, stop_at_eos=False)[len(p):]
           for p in prompts]
    sched = Scheduler(params, cfg, max_batch=2, max_len=max_len,
                      prefill_buckets=(8, 16, 32),
                      streaming=True, n_keep=n_keep, n_discard=n_discard,
                      sampling=SamplingParams(greedy=True,
                                              repeat_penalty=1.0))
    for i, p in enumerate(prompts):
        sched.add_request(f"q{i}", p, max_new_tokens=n_new)
    done = {s.request_id: s.output_ids for s in sched.run_to_completion()}
    assert all(len(done[f"q{i}"]) == n_new for i in range(len(prompts)))
    exact = sum(done[f"q{i}"] == ref[i] for i in range(len(prompts)))
    assert exact >= len(prompts) - 1, (done, ref)


def test_server_streaming_kwargs(model):
    """shift_roped_k/n_keep/n_discard reach the scheduler (reference CLI
    knobs for infinite inference)."""
    params, cfg = model
    srv = ModelServer(params, cfg, max_batch=2, ctx_size=32,
                      shift_roped_k=True, n_keep=2, n_discard=8,
                      prefill_chunk=None)
    try:
        assert srv.scheduler.streaming
        assert srv.scheduler.n_keep == 2 and srv.scheduler.n_discard == 8
        srv.issueQuery(Query("a", [3, 4, 5], max_new_tokens=40))
        t0 = time.time()
        while not srv.Empty() and time.time() - t0 < 120:
            time.sleep(0.05)
        with srv._lock:
            done = list(srv.finished)
        assert len(done) == 1 and len(done[0].output_ids) == 40
    finally:
        srv.stop()


def test_decode_block_matches_single_step(model):
    """decode_block=4 (multi-token on-device sample_loop steps) must
    produce exactly the single-step greedy outputs, including EOS-
    mid-block truncation and ragged finish times."""
    params, cfg = model
    import dataclasses
    cfg_eos = dataclasses.replace(cfg, eos_token_id=7)  # reachable eos
    rng = np.random.default_rng(11)
    prompts = [list(rng.integers(1, 128, int(n)))
               for n in rng.integers(3, 20, 6)]

    def run(block):
        sched = Scheduler(params, cfg_eos, max_batch=3, max_len=64,
                          prefill_buckets=(32,), decode_block=block,
                          sampling=SamplingParams(greedy=True,
                                                  repeat_penalty=1.0))
        for i, p in enumerate(prompts):
            sched.add_request(f"q{i}", p, max_new_tokens=11)
        return {s.request_id: s.output_ids
                for s in sched.run_to_completion()}

    one = run(1)
    four = run(4)
    assert one == four, (one, four)


def test_decode_block_with_penalties(model):
    """Blocked decode's on-device penalty ring == the host-side history
    path (greedy with repetition penalty is deterministic)."""
    params, cfg = model
    prompts = [[5, 6, 7], [9, 1, 2, 3]]

    def run(block):
        sched = Scheduler(params, cfg, max_batch=2, max_len=64,
                          prefill_buckets=(32,), decode_block=block,
                          sampling=SamplingParams(greedy=True,
                                                  repeat_penalty=1.3,
                                                  repeat_last_n=16))
        for i, p in enumerate(prompts):
            sched.add_request(f"q{i}", p, max_new_tokens=10)
        return {s.request_id: s.output_ids
                for s in sched.run_to_completion()}

    assert run(1) == run(4)


def test_chunked_prefill_bucket_pad_never_crosses_max_len(model):
    """A prompt whose final chunk's bucket pad would cross max_len must
    fall back to single-shot prefill (a crossing dynamic_update_slice
    would clamp its offset and corrupt earlier keys) — and still match
    the sequential reference."""
    params, cfg = model
    rng = np.random.default_rng(13)
    # max_len 48 with buckets (8, 16): a 42-token prompt's last 8-chunk
    # [40, 42) pads to 48... begin 40 + Tb 8 = 48 fits, but a 44-token
    # prompt's chunk [40, 44) pads begin 40 + 8 = 48 fits too; use
    # max_len 42: chunk [40, 42) → 40 + 8 = 48 > 42 → must single-shot
    prompt = list(rng.integers(1, 128, 40))
    n_new = 2
    ref = ref_outputs(params, cfg, [prompt], n_new)[0]
    sched = Scheduler(params, cfg, max_batch=1, max_len=42,
                      prefill_buckets=(8, 16), prefill_chunk=8,
                      sampling=SamplingParams(greedy=True,
                                              repeat_penalty=1.0))
    sched.add_request("a", prompt, max_new_tokens=n_new)
    done = sched.run_to_completion()
    assert done[0].output_ids == ref, (done[0].output_ids, ref)


def test_batched_generate_truncates_at_cache_end(model):
    """Batched generate truncates at the cache end like the row-wise
    path instead of raising (review finding)."""
    params, cfg = model
    from neural_tpu.runtime.generate import batched_generate
    from neural_tpu.runtime import SamplingParams
    rows = [[3, 4, 5, 6], [7, 8]]
    outs = batched_generate(params, cfg, rows,
                            SamplingParams(greedy=True, repeat_penalty=1.0),
                            max_new_tokens=100, max_len=16,
                            stop_at_eos=False)
    assert len(outs[0]) == 16 and len(outs[1]) == 14


def test_scheduler_beam_paged_matches_standalone(model):
    """Beam requests in PAGED KV mode: prompt sharing and KV reorder run
    as page-content copies over the shared pool (reference KV reorder
    works against its packed cache unconditionally, model_utils.h:423) —
    results must match the standalone beam search, with greedy traffic
    sharing the pool."""
    from neural_tpu.runtime.beam import beam_search

    params, cfg = model
    prompt = [3, 11, 7, 29]
    n_new, W = 6, 3
    ref = beam_search(params, cfg, prompt, beam_size=W,
                      max_new_tokens=n_new, max_len=64)

    sched = Scheduler(params, cfg, max_batch=4, max_len=64,
                      prefill_buckets=(32,), kv_mode="paged", page_size=32,
                      sampling=SamplingParams(greedy=True,
                                              repeat_penalty=1.0))
    sched.add_request("beam", prompt, max_new_tokens=n_new, num_beams=W)
    sched.add_request("greedy", [5, 6, 7], max_new_tokens=n_new)
    done = {s.request_id: s for s in sched.run_to_completion()}
    assert set(done) == {"beam", "greedy"}

    got = done["beam"]
    want_ids = ref[0].ids[len(prompt):]
    assert got.output_ids == want_ids, (got.output_ids, want_ids)
    assert len(got.hypotheses) == W
    for (ids, score), hyp in zip(got.hypotheses, ref):
        assert ids == hyp.ids[len(prompt):]
        np.testing.assert_allclose(score, hyp.score, rtol=1e-4, atol=1e-5)
    ref_g = ref_outputs(params, cfg, [[5, 6, 7]], n_new)[0]
    assert done["greedy"].output_ids == ref_g
    # all pages returned after completion
    assert sched.allocator.n_free == sched.cache.n_pages - 1


def test_decode_block_paged_matches_single_step(model):
    """decode_block over the PAGED pool: identical greedy outputs to
    per-token stepping (pages reserved at admission; past-reservation
    block writes land in the trash page)."""
    params, cfg = model
    import dataclasses
    cfg_eos = dataclasses.replace(cfg, eos_token_id=7)
    rng = np.random.default_rng(13)
    prompts = [list(rng.integers(1, 128, int(n)))
               for n in rng.integers(3, 20, 5)]

    def run(block):
        sched = Scheduler(params, cfg_eos, max_batch=3, max_len=64,
                          prefill_buckets=(32,), decode_block=block,
                          kv_mode="paged", page_size=16,
                          sampling=SamplingParams(greedy=True,
                                                  repeat_penalty=1.0))
        for i, p in enumerate(prompts):
            sched.add_request(f"q{i}", p, max_new_tokens=9)
        return {s.request_id: s.output_ids
                for s in sched.run_to_completion()}

    assert run(1) == run(4)


def test_paged_impossible_request_rejected(model):
    """A request whose page reservation can NEVER be satisfied raises at
    add_request instead of livelocking run_to_completion (round-4
    review finding)."""
    params, cfg = model
    sched = Scheduler(params, cfg, max_batch=1, max_len=128,
                      kv_mode="paged", page_size=32, n_pages=3)
    with pytest.raises(ValueError, match="pages"):
        sched.add_request("big", list(range(1, 60)), max_new_tokens=64)
    # a fitting request still works
    sched.add_request("ok", [3, 5, 7], max_new_tokens=8)
    sched.run_to_completion()


def test_min_new_tokens_non_beam(model):
    """min_new_tokens suppresses EOS for plain (non-beam) requests too
    (reference logits_processor min-new-tokens, model_utils.h:404)."""
    import dataclasses
    params, cfg = model
    # find the greedy token the model emits, then make IT the eos: without
    # the min-new-tokens mask the request would finish in 1 token
    probe = Scheduler(params, cfg, max_batch=1, max_len=64,
                      sampling=SamplingParams(greedy=True,
                                              repeat_penalty=1.0))
    probe.add_request("p", [3, 5, 7], max_new_tokens=1)
    first = probe.run_to_completion()[0].output_ids[0]
    cfg_eos = dataclasses.replace(cfg, eos_token_id=first)
    sched = Scheduler(params, cfg_eos, max_batch=1, max_len=64,
                      sampling=SamplingParams(greedy=True,
                                              repeat_penalty=1.0))
    sched.add_request("q", [3, 5, 7], max_new_tokens=8, min_new_tokens=4)
    out = sched.run_to_completion()[0]
    assert len(out.output_ids) >= 4
    assert first not in out.output_ids[:3]   # EOS masked while below min


def test_mirostat_mu_persists(model):
    """Mirostat's mu adapts ACROSS tokens in the scheduler (round-4 review:
    state was discarded every step, resetting mu to 2*tau)."""
    params, cfg = model
    sp = SamplingParams(greedy=False, mirostat=2, mirostat_tau=3.0,
                        repeat_penalty=1.0, repeat_last_n=0)
    sched = Scheduler(params, cfg, max_batch=1, max_len=64, sampling=sp)
    sched.add_request("m", [3, 5, 7], max_new_tokens=6)
    slot_mu = []
    while sched.has_work:
        sched.step()
        slot_mu.append(float(sched._mu[0]))
    assert len(slot_mu) >= 5
    # mu must move away from its 2*tau init and keep evolving
    assert any(abs(m - 6.0) > 1e-3 for m in slot_mu)
    assert len(set(np.round(slot_mu, 5))) > 1
