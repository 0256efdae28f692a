"""N-gram proposer + engine integration (reference: ngram_worker tests +
e2e greedy equality)."""

import numpy as np
import pytest

from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig, SpeculativeConfig)
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.models.llama import init_params
from qspec_tpu.sampling_params import SamplingParams
from qspec_tpu.spec_decode.ngram import NgramProposer


def test_proposer_finds_repeat():
    p = NgramProposer(1, 3)
    # history: ... [7, 8, 9] appeared before, tail is [7, 8, 9]
    hist = [1, 2, 7, 8, 9, 4, 5, 6, 7, 8, 9]
    out = p.propose(hist, k=2)
    assert out is not None
    assert list(out) == [4, 5]  # continuation after the earlier [7,8,9]


def test_proposer_no_match():
    p = NgramProposer(2, 3)
    assert p.propose([1, 2, 3, 4, 5], k=2) is None


def test_proposer_short_continuation_padded():
    p = NgramProposer(1, 2)
    hist = [4, 7, 4, 7]  # match [4,7] at start -> continuation [4,7], pad to k
    out = p.propose(hist, k=3)
    assert list(out) == [4, 7, 7]


def test_ngram_engine_greedy_invariant():
    mc = ModelConfig.tiny(quant="w4")
    params = init_params(mc, seed=0)
    sched = SchedulerConfig(max_num_seqs=2, max_model_len=256,
                            prefill_chunk_size=64,
                            decode_batch_buckets=(2,),
                            prefill_token_buckets=(64,))
    # repetitive prompts: ngram proposals should land
    prompts = [[7, 8, 9, 4, 5, 7, 8, 9, 4, 5, 7, 8, 9],
               [3, 3, 3, 3, 3, 3, 3, 3]]

    def run(spec):
        cfg = EngineConfig(model=mc, cache=CacheConfig(page_size=16),
                           scheduler=sched, speculative=spec)
        eng = LLMEngine(cfg, params)
        for p in prompts:
            eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=16))
        outs = {}
        while eng.has_unfinished_requests():
            for o in eng.step():
                if o.finished:
                    outs[o.request_id] = o.output_token_ids
        return outs, eng

    ar, _ = run(None)
    ng, eng = run(SpeculativeConfig(num_speculative_tokens=3, method="ngram"))
    assert ar == ng
    assert eng.spec_metrics.num_spec_rounds > 0
