"""Swap-mode preemption (reference PreemptionMode.SWAP + CacheEngine
swap_in/swap_out, vllm/worker/cache_engine.py): under page pressure,
sequences park their KV in host RAM and resume bit-exactly — outputs must
match an unconstrained run, and swaps must actually happen (not silently
fall back to recompute)."""

import numpy as np

from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig, SpeculativeConfig)
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.models.llama import init_params
from qspec_tpu.sampling_params import SamplingParams


def run(params, mc, num_pages, prompts, *, mode="swap", swap_gb=4.0,
        kv_dtype="bfloat16", spec=None, max_tokens=24):
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(page_size=16, num_pages=num_pages,
                          kv_cache_dtype=kv_dtype, swap_space_gb=swap_gb),
        scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=256,
                                  prefill_chunk_size=64,
                                  decode_batch_buckets=(2, 4),
                                  prefill_token_buckets=(64,),
                                  preemption_mode=mode),
        speculative=spec)
    eng = LLMEngine(cfg, params, num_pages=num_pages)
    for p in prompts:
        eng.add_request(p, SamplingParams(temperature=0.0,
                                          max_tokens=max_tokens,
                                          ignore_eos=True))
    outs = {}
    steps = 0
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.output_token_ids
        steps += 1
        assert steps < 2000, "no forward progress"
    return outs, eng


def _prompts(seed=11, n=4, size=40):
    rng = np.random.default_rng(seed)
    return [list(map(int, rng.integers(1, 500, size=size))) for _ in range(n)]


def test_swap_preemption_preserves_outputs():
    mc = ModelConfig.tiny(quant="w4")
    params = init_params(mc, seed=0)
    prompts = _prompts()

    rich, _ = run(params, mc, num_pages=128, prompts=prompts)
    tight, eng = run(params, mc, num_pages=12, prompts=prompts)
    assert rich == tight
    assert eng._swap_pool.num_swap_outs > 0, "pressure never triggered a swap"
    assert eng._swap_pool.num_swap_ins > 0
    assert eng._swap_pool.used_pages == 0, "pool leaked parked pages"


def test_swap_matches_recompute():
    mc = ModelConfig.tiny(quant="w4")
    params = init_params(mc, seed=0)
    prompts = _prompts(seed=7)
    swap, _ = run(params, mc, num_pages=12, prompts=prompts, mode="swap")
    rec, _ = run(params, mc, num_pages=12, prompts=prompts, mode="recompute")
    assert swap == rec


def test_swap_pool_full_falls_back_to_recompute():
    """A zero-byte pool must degrade to recompute preemption, not deadlock."""
    mc = ModelConfig.tiny(quant="w4")
    params = init_params(mc, seed=0)
    prompts = _prompts(seed=3)
    rich, _ = run(params, mc, num_pages=128, prompts=prompts)
    tight, eng = run(params, mc, num_pages=12, prompts=prompts, swap_gb=0.0)
    assert rich == tight
    assert eng._swap_pool.num_swap_outs == 0


def test_swap_int8_kv_cache():
    """Swap payloads carry the int8 pages AND their scales."""
    mc = ModelConfig.tiny(quant="w4")
    params = init_params(mc, seed=0)
    prompts = _prompts(seed=5)
    rich, _ = run(params, mc, num_pages=128, prompts=prompts,
                  kv_dtype="int8")
    tight, eng = run(params, mc, num_pages=12, prompts=prompts,
                     kv_dtype="int8")
    assert rich == tight
    assert eng._swap_pool.num_swap_outs > 0


def test_swap_with_spec_decode_draft_cache():
    """Swap must park BOTH caches when model-draft speculation is on: the
    draft's KV of the context is as stateful as the target's."""
    mc = ModelConfig.tiny(quant="w4")
    params = init_params(mc, seed=0)
    prompts = _prompts(seed=9)
    spec = SpeculativeConfig(num_speculative_tokens=2, draft_scheme="w4a8")
    rich, _ = run(params, mc, num_pages=128, prompts=prompts, spec=spec)
    tight, eng = run(params, mc, num_pages=16, prompts=prompts, spec=spec)
    assert rich == tight
    assert eng._swap_pool.num_swap_outs > 0
