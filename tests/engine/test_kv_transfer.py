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


# -- cross-process transport (KVPipe) ---------------------------------------

def _prefill_process(addr: str, prompts, ready):
    """Child: build the prefill engine, push every handoff over the pipe."""
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    # this image's sitecustomize pre-imports jax on the TPU platform before
    # this function runs (spawn re-runs site init), so the env var alone is
    # too late — without the post-import override the child contends for
    # the one real chip and hangs whenever another process holds it
    import jax
    jax.config.update("jax_platforms", "cpu")

    from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                  SchedulerConfig)
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.kv_transfer import KVPipe
    from qspec_tpu.models.llama import init_params

    mc = ModelConfig.tiny(quant="w4")
    eng = LLMEngine(
        EngineConfig(model=mc, cache=CacheConfig(page_size=16),
                     scheduler=SchedulerConfig(max_num_seqs=4,
                                               max_model_len=128,
                                               prefill_chunk_size=32,
                                               decode_batch_buckets=(4,),
                                               prefill_token_buckets=(32,))),
        init_params(mc, seed=0))
    pipe = KVPipe.producer(addr)
    ready.wait(120)
    for p in prompts:
        rid = eng.prefill_for_transfer(list(p))
        while eng.has_unfinished_requests():
            eng.step()
        pipe.send_handoff(eng.extract_kv(rid))
    pipe.close()


def test_disaggregated_prefill_cross_process(setup, tmp_path):
    """The reference moves KV between SEPARATE engine processes over a pipe
    (kv_pipe/pynccl_pipe.py:40, simple_connector.py:28): prefill in process
    A, decode in process B, transcripts bit-equal to a co-located run."""
    import multiprocessing as mp

    from qspec_tpu.kv_transfer import KVPipe

    mc, params = setup
    rng = np.random.default_rng(3)
    prompts = [list(map(int, rng.integers(1, 500, size=n)))
               for n in (33, 17)]
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)

    single = make_engine(mc, params)
    rids = [single.add_request(p, sp) for p in prompts]
    ref = {r: o.output_token_ids for r, o in drain(single).items()}

    addr = f"ipc://{tmp_path}/kv_pipe"
    ctx = mp.get_context("spawn")
    ready = ctx.Event()
    child = ctx.Process(target=_prefill_process, args=(addr, prompts, ready))
    child.start()
    try:
        # consumer binds; then release the producer to connect+send
        pipe = KVPipe.consumer(addr)
        ready.set()
        dec = make_engine(mc, params)
        order = {}
        for i in range(len(prompts)):
            h = pipe.recv_handoff(timeout_ms=120_000)
            assert h.prompt_token_ids == prompts[i]
            order[dec.inject_kv(h, sp)] = i
        got = drain(dec)
        for rid, i in order.items():
            assert got[rid].output_token_ids == ref[rids[i]], (
                f"prompt {i}: cross-process transcript diverged")
        pipe.close()
    finally:
        child.join(timeout=180)
        if child.is_alive():
            child.terminate()
    assert child.exitcode == 0
