"""Top-N logprob dicts (reference Logprob output, vllm/sequence.py):
per-position {token_id: logprob} alternatives when logprobs > 1."""

import numpy as np
import pytest

from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.models.llama import init_params
from qspec_tpu.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def setup():
    mc = ModelConfig.tiny(quant="w4")
    return mc, init_params(mc, seed=0)


def run(mc, params, steps_per_call, n_logprobs, max_tokens=6):
    cfg = EngineConfig(
        model=mc, cache=CacheConfig(page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=128,
                                  prefill_chunk_size=32,
                                  decode_batch_buckets=(2,),
                                  prefill_token_buckets=(32,),
                                  steps_per_decode_call=steps_per_call))
    eng = LLMEngine(cfg, params)
    rng = np.random.default_rng(5)
    for _ in range(2):
        eng.add_request(list(map(int, rng.integers(1, 500, size=12))),
                        SamplingParams(temperature=0.0, max_tokens=max_tokens,
                                       ignore_eos=True, logprobs=n_logprobs))
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o
    return outs


@pytest.mark.parametrize("steps", [1, 4])
def test_top_logprob_dicts(setup, steps):
    mc, params = setup
    outs = run(mc, params, steps, n_logprobs=5)
    for o in outs.values():
        assert o.top_logprobs is not None
        assert len(o.top_logprobs) == len(o.output_token_ids)
        for tok, lp, top in zip(o.output_token_ids, o.logprobs,
                                o.top_logprobs):
            assert top is not None and len(top) == 5
            vals = list(top.values())
            assert vals == sorted(vals, reverse=True)
            # greedy: the chosen token IS the top-1 alternative, with the
            # same (unfiltered-softmax) logprob
            best = max(top, key=top.get)
            assert best == tok
            assert abs(top[tok] - lp) < 1e-4


def test_chosen_logprob_only_when_1(setup):
    mc, params = setup
    outs = run(mc, params, 1, n_logprobs=1)
    for o in outs.values():
        assert o.logprobs is not None and o.top_logprobs is None
