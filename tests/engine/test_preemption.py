"""Preemption under page pressure (reference:
tests/basic_correctness/test_preemption.py): outputs must match an
unconstrained run even when sequences get preempted and recomputed."""

import numpy as np

from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.models.llama import init_params
from qspec_tpu.sampling_params import SamplingParams


def run(params, mc, num_pages, prompts, max_tokens=24):
    cfg = EngineConfig(
        model=mc, cache=CacheConfig(page_size=16, num_pages=num_pages),
        scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=256,
                                  prefill_chunk_size=64,
                                  decode_batch_buckets=(2, 4),
                                  prefill_token_buckets=(64,)))
    eng = LLMEngine(cfg, params, num_pages=num_pages)
    for p in prompts:
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=max_tokens,
                                          ignore_eos=True))
    outs = {}
    steps = 0
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.output_token_ids
        steps += 1
        assert steps < 2000, "no forward progress"
    return outs


def test_preemption_preserves_outputs():
    mc = ModelConfig.tiny(quant="w4")
    params = init_params(mc, seed=0)
    rng = np.random.default_rng(11)
    prompts = [list(map(int, rng.integers(1, 500, size=40))) for _ in range(4)]

    rich = run(params, mc, num_pages=128, prompts=prompts)
    # tight pool: 4 seqs x (40 prompt + 24 out) tokens ~= 16 pages needed;
    # give enough for ~2 seqs so the others must preempt + recompute
    tight = run(params, mc, num_pages=12, prompts=prompts)
    assert rich == tight


def test_preemption_with_prefix_caching():
    """Preemption x prefix caching (the round-1 garbage-KV race regime):
    shared-prefix sequences under page pressure must still match the
    unconstrained run — recompute preemption frees pages whose content
    hashes are registered, and resumed sequences may prefix-hit on them."""
    from qspec_tpu.config import CacheConfig, EngineConfig, SchedulerConfig

    mc = ModelConfig.tiny(quant="w4")
    params = init_params(mc, seed=0)
    rng = np.random.default_rng(23)
    shared = list(map(int, rng.integers(1, 500, size=32)))
    prompts = [shared + list(map(int, rng.integers(1, 500, size=8)))
               for _ in range(4)]

    def run_pc(num_pages):
        cfg = EngineConfig(
            model=mc,
            cache=CacheConfig(page_size=16, num_pages=num_pages,
                              enable_prefix_caching=True),
            scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=256,
                                      prefill_chunk_size=64,
                                      decode_batch_buckets=(2, 4),
                                      prefill_token_buckets=(64,)))
        eng = LLMEngine(cfg, params, num_pages=num_pages)
        for p in prompts:
            eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=24,
                                              ignore_eos=True))
        outs = {}
        steps = 0
        while eng.has_unfinished_requests():
            for o in eng.step():
                if o.finished:
                    outs[o.request_id] = o.output_token_ids
            steps += 1
            assert steps < 2000, "no forward progress"
        return outs

    rich = run_pc(num_pages=128)
    tight = run_pc(num_pages=14)
    assert rich == tight
