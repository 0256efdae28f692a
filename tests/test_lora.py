"""Multi-LoRA serving tests.

Correctness targets mirror the reference's LoRA suite intent (vllm/tests/
lora): (1) slot-0 requests match the base model exactly; (2) an adapter
changes outputs; (3) a PEFT adapter's delta equals the dense reference
computation; (4) mixed-adapter batches route per sequence.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.lora import LoRAConfig, init_lora_params, load_peft_adapter, lora_delta
from qspec_tpu.models.llama import init_params
from qspec_tpu.sampling_params import SamplingParams


def make_engine(params):
    mc = ModelConfig.tiny(quant="w4")
    cfg = EngineConfig(
        model=mc, cache=CacheConfig(page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128,
                                  prefill_chunk_size=32,
                                  decode_batch_buckets=(4,),
                                  prefill_token_buckets=(32,)))
    return LLMEngine(cfg, params), mc


def run(eng, prompts, lora_ids):
    outs = {}
    for p, lid in zip(prompts, lora_ids):
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=8,
                                          ignore_eos=True), lora_id=lid)
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.output_token_ids
    return [outs[i] for i in sorted(outs)]


def random_adapter(rng, mc, lcfg, scale=0.5):
    """PEFT-style state dict for one adapter with visible effect."""
    sd = {}
    r = 4
    for li in range(mc.num_layers):
        for proj, in_f, out_f in [("q_proj", mc.hidden_size, mc.q_size),
                                  ("o_proj", mc.q_size, mc.hidden_size),
                                  ("gate_proj", mc.hidden_size, mc.intermediate_size),
                                  ("down_proj", mc.intermediate_size, mc.hidden_size)]:
            pre = f"base_model.model.model.layers.{li}.self_attn.{proj}" \
                if "proj" in proj and proj in ("q_proj", "o_proj") else \
                f"base_model.model.model.layers.{li}.mlp.{proj}"
            sd[pre + ".lora_A.weight"] = rng.standard_normal((r, in_f)).astype(np.float32) * scale
            sd[pre + ".lora_B.weight"] = rng.standard_normal((out_f, r)).astype(np.float32) * scale
    return sd


def test_lora_delta_matches_dense(rng):
    n, in_f, out_f, r, T = 3, 64, 96, 8, 5
    A = jnp.asarray(rng.standard_normal((n, in_f, r)).astype(np.float32))
    B = jnp.asarray(rng.standard_normal((n, r, out_f)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((T, in_f)).astype(np.float32))
    ids = jnp.asarray([0, 2, 1, 2, 0], jnp.int32)
    out = np.asarray(lora_delta(x, A, B, ids))
    for t in range(T):
        ref = np.asarray(x[t]) @ np.asarray(A[ids[t]]) @ np.asarray(B[ids[t]])
        np.testing.assert_allclose(out[t], ref, rtol=1e-4, atol=1e-4)


def test_slot0_matches_base(rng):
    mc = ModelConfig.tiny(quant="w4")
    base = init_params(mc, seed=0)
    lcfg = LoRAConfig(max_loras=3, max_rank=16)
    with_lora = dict(base)
    with_lora["lora"] = init_lora_params(mc, lcfg)
    with_lora["lora"] = load_peft_adapter(
        with_lora["lora"], mc, slot=1, state_dict=random_adapter(rng, mc, lcfg))

    prompts = [list(map(int, rng.integers(1, 500, size=10))) for _ in range(2)]
    eng_base, _ = make_engine(base)
    out_base = run(eng_base, prompts, [0, 0])
    eng_l, _ = make_engine(with_lora)
    out_slot0 = run(eng_l, prompts, [0, 0])
    assert out_base == out_slot0


def test_adapter_changes_output_and_routes_per_seq(rng):
    mc = ModelConfig.tiny(quant="w4")
    base = init_params(mc, seed=0)
    lcfg = LoRAConfig(max_loras=3, max_rank=16)
    params = dict(base)
    params["lora"] = init_lora_params(mc, lcfg)
    params["lora"] = load_peft_adapter(
        params["lora"], mc, slot=1, state_dict=random_adapter(rng, mc, lcfg))

    prompt = list(map(int, rng.integers(1, 500, size=12)))
    eng, _ = make_engine(params)
    outs = run(eng, [prompt, prompt], [0, 1])
    assert outs[0] != outs[1], "adapter had no effect"

    # mixed batch routes independently: same-prompt same-adapter rows agree
    eng2, _ = make_engine(params)
    outs2 = run(eng2, [prompt, prompt, prompt], [0, 1, 1])
    assert outs2[0] == outs[0]
    assert outs2[1] == outs2[2] == outs[1]


# ---- dynamic lifecycle (lora/manager.py; reference vllm/lora/models.py
# LRUCacheLoRAModelManager + /v1/load_lora_adapter endpoints) -----------

def test_dynamic_load_unload_roundtrip(rng):
    from qspec_tpu.lora.manager import LoRASlotError

    mc = ModelConfig.tiny(quant="w4")
    params = dict(init_params(mc, seed=0))
    params["lora"] = init_lora_params(mc, LoRAConfig(max_loras=3,
                                                     max_rank=16))
    eng, _ = make_engine(params)
    prompt = list(map(int, rng.integers(1, 500, size=12)))

    base_out = run(eng, [prompt], [0])[0]

    slot = eng.lora.load("ad1", random_adapter(rng, mc, None))
    assert slot == 1
    assert [a["name"] for a in eng.lora.list_adapters()] == ["ad1"]

    # route by NAME through add_request(lora_name=...)
    eng.add_request(prompt, SamplingParams(temperature=0.0, max_tokens=8,
                                           ignore_eos=True),
                    lora_name="ad1")
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.output_token_ids
    ad_out = list(outs.values())[0]
    assert ad_out != base_out, "adapter had no effect"

    # unload zeroes the slot: base behaviour is restored even for
    # requests that (wrongly) still target the old slot id
    eng.lora.unload("ad1")
    assert eng.lora.list_adapters() == []
    with pytest.raises(LoRASlotError):
        eng.lora.slot_of("ad1")
    assert run(eng, [prompt], [slot])[0] == base_out


def test_dynamic_lru_eviction_and_reload(rng):
    mc = ModelConfig.tiny(quant="w4")
    params = dict(init_params(mc, seed=0))
    params["lora"] = init_lora_params(mc, LoRAConfig(max_loras=3,
                                                     max_rank=16))
    eng, _ = make_engine(params)

    s1 = eng.lora.load("a", random_adapter(rng, mc, None))
    s2 = eng.lora.load("b", random_adapter(rng, mc, None))
    assert {s1, s2} == {1, 2}
    # bump "a" so "b" is the LRU victim
    eng.lora.slot_of("a")
    s3 = eng.lora.load("c", random_adapter(rng, mc, None))
    assert s3 == s2, "should have evicted the LRU adapter's slot"
    names = {a["name"] for a in eng.lora.list_adapters()}
    assert names == {"a", "c"}

    # re-loading an existing name overwrites in place (same slot)
    assert eng.lora.load("a", random_adapter(rng, mc, None)) == s1


def test_dynamic_requires_bank(rng):
    from qspec_tpu.lora.manager import LoRASlotError

    mc = ModelConfig.tiny(quant="w4")
    eng, _ = make_engine(init_params(mc, seed=0))
    with pytest.raises(LoRASlotError):
        eng.lora.list_adapters()
