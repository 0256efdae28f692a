"""Disaggregated prefill via KV handoff (reference vllm/distributed/
kv_transfer): a prefill engine computes the prompt KV + first token, a
separate decode engine adopts it and continues — transcripts must equal a
single-engine run bit-for-bit (the pages carry identical KV)."""

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


def make_engine(mc, params, kv_dtype="bfloat16"):
    cfg = EngineConfig(
        model=mc, cache=CacheConfig(page_size=16, kv_cache_dtype=kv_dtype),
        scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128,
                                  prefill_chunk_size=32,
                                  decode_batch_buckets=(4,),
                                  prefill_token_buckets=(32,)))
    return LLMEngine(cfg, params)


def drain(eng):
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o
    return outs


@pytest.mark.parametrize("kv_dtype", ["bfloat16", "int8", "fp8_e5m2"])
def test_disaggregated_prefill_matches_single_engine(setup, kv_dtype):
    mc, params = setup
    rng = np.random.default_rng(9)
    prompts = [list(map(int, rng.integers(1, 500, size=n)))
               for n in (37, 20)]
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)

    # oracle: one engine does everything
    single = make_engine(mc, params, kv_dtype)
    rids = [single.add_request(p, sp) for p in prompts]
    ref = {r: o.output_token_ids for r, o in drain(single).items()}

    # disaggregated: prefill engine -> handoff -> decode engine
    pre = make_engine(mc, params, kv_dtype)
    dec = make_engine(mc, params, kv_dtype)
    handoffs = []
    for p in prompts:
        rid = pre.prefill_for_transfer(p)
        drain(pre)
        handoffs.append(pre.extract_kv(rid))
    assert not pre._kv_held and pre.block_manager.num_free_pages > 0

    outs = {}
    for i, h in enumerate(handoffs):
        rid = dec.inject_kv(h, sp)
        outs[rid] = i
    got = drain(dec)
    for rid, i in outs.items():
        assert got[rid].output_token_ids == ref[rids[i]], (
            f"prompt {i}: disaggregated transcript diverged")
        # the first token came from the prefill engine
        assert got[rid].output_token_ids[0] == handoffs[i].first_token


def test_inject_respects_page_budget(setup):
    mc, params = setup
    pre = make_engine(mc, params)
    rid = pre.prefill_for_transfer(list(range(1, 33)))
    drain(pre)
    h = pre.extract_kv(rid)

    dec = make_engine(mc, params)
    # exhaust the decode engine's pages
    from qspec_tpu.sampling_params import SamplingParams as SP
    big = [dec.add_request(list(range(1, 100)), SP(max_tokens=4))
           for _ in range(3)]
    with pytest.raises(RuntimeError, match="free pages"):
        for _ in range(200):
            dec.inject_kv(h, SP(max_tokens=4))
