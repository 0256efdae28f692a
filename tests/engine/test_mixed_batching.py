"""Mixed prefill+decode scheduling (reference chunked prefill co-schedules
decodes with prompt chunks every iteration, vllm/core/scheduler.py:1151):
a running decode must keep emitting tokens while another sequence's prompt
is being prefilled, and greedy transcripts must be unchanged.
"""

import numpy as np
import pytest

from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig, SpeculativeConfig)
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.models.llama import init_params
from qspec_tpu.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def setup():
    mc = ModelConfig.tiny(quant="w4")
    return mc, init_params(mc, seed=0)


def make_engine(mc, params, mix=True, spec=None):
    cfg = EngineConfig(
        model=mc, cache=CacheConfig(page_size=16, num_pages=256),
        scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=512,
                                  prefill_chunk_size=32,
                                  decode_batch_buckets=(2, 4),
                                  prefill_token_buckets=(32, 64),
                                  mix_decode_with_prefill=mix),
        speculative=spec)
    return LLMEngine(cfg, params, num_pages=256)


def long_prompt(n=160, seed=1):
    r = np.random.default_rng(seed)
    return list(map(int, r.integers(1, 500, size=n)))


@pytest.mark.parametrize("spec", [
    None, SpeculativeConfig(num_speculative_tokens=3, method="ngram")])
def test_decode_advances_during_prefill(setup, spec):
    mc, params = setup
    eng = make_engine(mc, params, spec=spec)
    a = eng.add_request(long_prompt(64, 1),
                        SamplingParams(temperature=0.0, max_tokens=64,
                                       ignore_eos=True))
    # finish A's prefill and get it decoding
    while not eng.scheduler.running or \
            eng.scheduler.running[0].num_computed_tokens < 64:
        eng.step()
    seq_a = next(s for s in eng.scheduler.running if s.seq_id == a)
    # admit a long prompt B: its chunked prefill takes several steps
    b = eng.add_request(long_prompt(160, 2),
                        SamplingParams(temperature=0.0, max_tokens=4))
    seq_b = next(s for s in eng.scheduler.waiting if s.seq_id == b)
    before = len(seq_a.output_token_ids)
    prefill_steps = 0
    while seq_b.num_computed_tokens < seq_b.prefill_len:
        eng.step()
        prefill_steps += 1
        assert prefill_steps < 50
    assert prefill_steps >= 2, "B's prefill should be chunked"
    # A gained tokens DURING B's prefill steps
    assert len(seq_a.output_token_ids) > before


def test_mixed_greedy_transcript_unchanged(setup):
    mc, params = setup

    def run(mix):
        eng = make_engine(mc, params, mix=mix)
        eng.add_request(long_prompt(48, 3),
                        SamplingParams(temperature=0.0, max_tokens=24,
                                       ignore_eos=True))
        # a staggered admission mid-decode
        outs, added = {}, False
        steps = 0
        while eng.has_unfinished_requests():
            for o in eng.step():
                if o.finished:
                    outs[o.request_id] = o.output_token_ids
            steps += 1
            if steps == 6 and not added:
                eng.add_request(long_prompt(96, 4),
                                SamplingParams(temperature=0.0,
                                               max_tokens=24,
                                               ignore_eos=True))
                added = True
            assert steps < 400
        return outs

    assert run(True) == run(False)
