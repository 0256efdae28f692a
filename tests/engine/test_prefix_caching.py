"""Engine-level prefix caching: shared-prompt requests must reuse pages and
still produce identical outputs (reference: tests/prefix_caching/)."""

import numpy as np

from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig, SpeculativeConfig)
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.models.llama import init_params
from qspec_tpu.sampling_params import SamplingParams


def run(params, mc, prompts, spec=None, serial=False):
    cfg = EngineConfig(
        model=mc, cache=CacheConfig(page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=256,
                                  prefill_chunk_size=64,
                                  decode_batch_buckets=(2, 4),
                                  prefill_token_buckets=(64,)),
        speculative=spec)
    eng = LLMEngine(cfg, params)
    outs = {}
    queue = list(enumerate(prompts))
    if serial:
        for rid, p in queue:
            eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=12,
                                              ignore_eos=True), request_id=rid)
            while eng.has_unfinished_requests():
                for o in eng.step():
                    if o.finished:
                        outs[o.request_id] = o.output_token_ids
    else:
        for rid, p in queue:
            eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=12,
                                              ignore_eos=True), request_id=rid)
        while eng.has_unfinished_requests():
            for o in eng.step():
                if o.finished:
                    outs[o.request_id] = o.output_token_ids
    return outs, eng


def test_shared_prefix_reuse_same_outputs():
    mc = ModelConfig.tiny(quant="w4")
    params = init_params(mc, seed=0)
    rng = np.random.default_rng(5)
    shared = list(map(int, rng.integers(1, 500, size=48)))  # 3 full pages
    prompts = [shared + list(map(int, rng.integers(1, 500, size=5 + i)))
               for i in range(3)]

    # serial so later requests hit pages cached by earlier ones
    outs, eng = run(params, mc, prompts, serial=True)
    # fresh engine, prefix caching disabled at block level via distinct engine:
    # compare against an engine that never shares (prompts reversed order so
    # the cache can't help the first)
    outs2, _ = run(params, mc, prompts, serial=False)
    assert outs == outs2


def test_shared_prefix_with_spec_decode():
    mc = ModelConfig.tiny(quant="w4")
    params = init_params(mc, seed=0)
    rng = np.random.default_rng(6)
    shared = list(map(int, rng.integers(1, 500, size=32)))
    prompts = [shared + [7], shared + [9], shared + [11]]
    spec = SpeculativeConfig(num_speculative_tokens=2)
    outs_s, eng = run(params, mc, prompts, spec=spec, serial=True)
    outs_p, _ = run(params, mc, prompts, spec=spec, serial=False)
    assert outs_s == outs_p
