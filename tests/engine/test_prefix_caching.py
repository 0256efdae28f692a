"""Engine-level prefix caching: shared-prompt requests must reuse pages and
still produce identical outputs (reference: tests/prefix_caching/)."""

import numpy as np

from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig, SpeculativeConfig)
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.models.llama import init_params
from qspec_tpu.sampling_params import SamplingParams


def run(params, mc, prompts, spec=None, serial=False, prefix_caching=True):
    cfg = EngineConfig(
        model=mc, cache=CacheConfig(page_size=16,
                                    enable_prefix_caching=prefix_caching),
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

    # serial so later requests hit pages cached by earlier ones; compare
    # with caching disabled under the identical serial schedule
    outs, eng = run(params, mc, prompts, serial=True, prefix_caching=True)
    outs2, _ = run(params, mc, prompts, serial=True, prefix_caching=False)
    assert outs == outs2


def test_shared_prefix_with_spec_decode():
    """Cache reuse must not change results: same schedule/batch shapes with
    prefix caching on vs off give identical outputs (serial-vs-batched would
    compare different batch rectangles, whose bf16 noise the int4 draft
    amplifies into occasional acceptance flips)."""
    mc = ModelConfig.tiny(quant="w4")
    params = init_params(mc, seed=0)
    rng = np.random.default_rng(6)
    shared = list(map(int, rng.integers(1, 500, size=32)))
    prompts = [shared + [7], shared + [9], shared + [11]]
    spec = SpeculativeConfig(num_speculative_tokens=2)
    on, eng = run(params, mc, prompts, spec=spec, serial=True, prefix_caching=True)
    off, _ = run(params, mc, prompts, spec=spec, serial=True, prefix_caching=False)
    assert on == off
