"""Ring-buffer draft-KV layout for the windowed shared-weights draft
(MagicDec; reference analogue: speculative_max_model_len capping the draft,
vllm/config.py).

The windowed draft reads only the last `window` KV positions, so its cache
is a per-sequence RING of ceil((window+k+1)/S)+2 pages with wrap-around
page reuse instead of a second full-size pool (which doubled KV HBM —
BENCH_NOTES.md's 8B OOM). The ring is pure table indirection: logical page
lp maps to 1 + row*R + lp % R, executables unchanged.

Correctness bar: with identical seeds the ring engine's transcripts AND
acceptance counters must be BIT-IDENTICAL to the full-pool windowed engine
(QSPEC_RING_DRAFT=0) — every in-window position is served identically by
both layouts, and out-of-window positions are masked to -inf before the
softmax, so their (different) garbage contributes exactly zero.
"""

import os

import numpy as np
import pytest

from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig, SpeculativeConfig)
from qspec_tpu.sampling_params import SamplingParams


def make_engine(monkeypatch, ring: bool, *, window=24, k=3, rounds=2,
                page_size=16, max_len=256):
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.models.llama import init_params

    monkeypatch.setenv("QSPEC_RING_DRAFT", "1" if ring else "0")
    mc = ModelConfig.tiny(quant="w4")
    params = init_params(mc, seed=0)
    sched = SchedulerConfig(max_num_seqs=4, max_model_len=max_len,
                            prefill_chunk_size=64,
                            decode_batch_buckets=(2, 4),
                            prefill_token_buckets=(64,))
    spec = SpeculativeConfig(num_speculative_tokens=k, rounds_per_step=rounds,
                             draft_scheme="w4a8", draft_kv_window=window)
    cfg = EngineConfig(model=mc, cache=CacheConfig(page_size=page_size),
                       scheduler=sched, speculative=spec)
    return LLMEngine(cfg, params), mc


def drive(eng, prompts, max_tokens, temp=0.0, seed=7):
    outs = {}
    for p in prompts:
        eng.add_request(p, SamplingParams(temperature=temp,
                                          max_tokens=max_tokens, seed=seed,
                                          ignore_eos=True))
    steps = 0
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.output_token_ids
        steps += 1
        assert steps < 500
    return outs


def prompts(n=3):
    r = np.random.default_rng(5)
    return [list(map(int, r.integers(1, 500, size=int(r.integers(8, 40)))))
            for _ in range(n)]


def test_ring_pool_is_small(monkeypatch):
    eng, mc = make_engine(monkeypatch, ring=True)
    r = eng.runner
    assert r._ring_pages > 0
    # window 24 + k 3 + 1 = 28 tokens -> ceil(28/16)+2 = 4 pages per ring
    assert r._ring_pages == 4
    # pool = rows * R + 1 null page, NOT the target's num_pages
    assert r.draft_cache.kv_pages.shape[1] == r._ring_rows * r._ring_pages + 1
    assert r.draft_cache.kv_pages.shape[1] < r.cache.kv_pages.shape[1]
    assert r.ring_cap == (r._ring_pages - 1) * 16


def test_ring_bitexact_vs_full_pool(monkeypatch):
    """Generation long enough to wrap every ring several times: transcripts
    and acceptance counters must match the full-pool windowed draft
    bit-for-bit."""
    ps = prompts()
    n_tok = 120  # >> ring_cap (48 tokens): many wrap-arounds
    eng_full, _ = make_engine(monkeypatch, ring=False)
    full = drive(eng_full, ps, n_tok)
    m_full = eng_full.spec_metrics
    eng_ring, _ = make_engine(monkeypatch, ring=True)
    ring = drive(eng_ring, ps, n_tok)
    m_ring = eng_ring.spec_metrics
    assert ring == full
    assert m_ring.num_draft_tokens == m_full.num_draft_tokens
    assert m_ring.num_draft_accepted == m_full.num_draft_accepted
    assert m_ring.num_emitted_tokens == m_full.num_emitted_tokens


def test_ring_greedy_invariant_vs_ar(monkeypatch):
    """Lossless regardless of layout: ring spec == plain AR greedy."""
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.models.llama import init_params

    ps = prompts()
    eng_ring, mc = make_engine(monkeypatch, ring=True)
    ring = drive(eng_ring, ps, 90)

    params = init_params(mc, seed=0)
    sched = SchedulerConfig(max_num_seqs=4, max_model_len=256,
                            prefill_chunk_size=64,
                            decode_batch_buckets=(2, 4),
                            prefill_token_buckets=(64,))
    cfg = EngineConfig(model=mc, cache=CacheConfig(page_size=16),
                       scheduler=sched, speculative=None)
    ar = drive(LLMEngine(cfg, params), ps, 90)
    assert ring == ar


def test_ring_rows_recycle(monkeypatch):
    """More sequences over the engine's lifetime than ring rows: finished
    sequences release their rows, later admissions reuse them."""
    eng, _ = make_engine(monkeypatch, ring=True)
    rows = eng.runner._ring_rows
    ps = prompts(3) + prompts(3) + prompts(3)
    # 9 sequences through a 4-row (+1 scratch) ring bank, batches of <= 4
    outs = drive(eng, ps, 30)
    assert len(outs) == 9
    assert len(eng.runner._ring_slot) <= rows - 1
