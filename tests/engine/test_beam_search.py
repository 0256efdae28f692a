"""Beam search (reference vllm/beam_search.py semantics)."""

import math

import numpy as np
import pytest

from qspec_tpu.beam_search import BeamSearchParams, beam_search
from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.models.llama import init_params
from qspec_tpu.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def engine():
    mc = ModelConfig.tiny(quant="w4")
    params = init_params(mc, seed=0)
    cfg = EngineConfig(
        model=mc, cache=CacheConfig(page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=8, max_model_len=128,
                                  prefill_chunk_size=64,
                                  decode_batch_buckets=(4, 8),
                                  prefill_token_buckets=(64,)))
    return LLMEngine(cfg, params)


def _prompts(n=2, length=10):
    rng = np.random.default_rng(3)
    return [list(map(int, rng.integers(1, 500, size=length)))
            for _ in range(n)]


def test_beam_width_1_equals_greedy(engine):
    ps = _prompts()
    outs = beam_search(engine, ps,
                       BeamSearchParams(beam_width=1, max_tokens=6,
                                        ignore_eos=True))
    for p, out in zip(ps, outs):
        rid = engine.add_request(p, SamplingParams(temperature=0.0,
                                                   max_tokens=6,
                                                   ignore_eos=True))
        greedy = None
        while engine.has_unfinished_requests():
            for o in engine.step():
                if o.finished and o.request_id == rid:
                    greedy = o.output_token_ids
        assert out.sequences[0].tokens == greedy


def test_beam_width_3_ranked_and_distinct(engine):
    ps = _prompts(1)
    outs = beam_search(engine, ps,
                       BeamSearchParams(beam_width=3, max_tokens=5,
                                        ignore_eos=True))
    seqs = outs[0].sequences
    assert len(seqs) == 3
    assert len({tuple(s.tokens) for s in seqs}) == 3
    scores = [s.score(1.0) for s in seqs]
    assert scores == sorted(scores, reverse=True)
    assert all(len(s.tokens) == 5 for s in seqs)
    assert all(s.cum_logprob <= 1e-6 for s in seqs)


def test_beam_cum_logprob_is_sum(engine):
    """The top beam's cumulative logprob equals the sum of its per-token
    logprobs under a plain greedy rerun when W=1."""
    ps = _prompts(1)
    out = beam_search(engine, ps, BeamSearchParams(beam_width=1, max_tokens=4,
                                                   ignore_eos=True))[0]
    rid = engine.add_request(ps[0], SamplingParams(temperature=0.0,
                                                   max_tokens=4,
                                                   ignore_eos=True,
                                                   logprobs=1))
    final = None
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished and o.request_id == rid:
                final = o
    assert math.isclose(out.sequences[0].cum_logprob, sum(final.logprobs),
                        rel_tol=1e-3, abs_tol=1e-3)
