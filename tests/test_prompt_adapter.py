"""Soft-prompt (prompt-tuning) adapter tests (reference
vllm/prompt_adapter/: PEFT prompt-tuning matrices prepended per request)."""

import numpy as np
import pytest

import jax

from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.models.llama import init_params
from qspec_tpu.prompt_adapter import PromptAdapterError
from qspec_tpu.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def eng():
    mc = ModelConfig.tiny(quant="w4")
    params = init_params(mc, seed=0)
    sched = SchedulerConfig(max_num_seqs=4, max_model_len=256,
                            prefill_chunk_size=64,
                            decode_batch_buckets=(4,),
                            prefill_token_buckets=(64,))
    return LLMEngine(EngineConfig(model=mc, cache=CacheConfig(page_size=16),
                                  scheduler=sched), params)


def _run(eng, reqs):
    outs = {}
    rids = [eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=8,
                                              ignore_eos=True), **kw)
            for p, kw in reqs]
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.output_token_ids
    return [outs[r] for r in rids]


def test_adapter_changes_output_and_equals_manual_embeds(eng):
    rng = np.random.default_rng(0)
    H = eng.config.model.hidden_size
    soft = rng.standard_normal((6, H)).astype(np.float32) * 0.1
    n = eng.prompt_adapters.load("style", soft)
    assert n == 6
    assert eng.prompt_adapters.list_adapters() == [
        {"name": "style", "virtual_tokens": 6}]

    prompt = list(map(int, rng.integers(1, 500, size=12)))
    base, adapted = _run(eng, [(prompt, {}),
                               (prompt, {"prompt_adapter": "style"})])
    assert base != adapted, "soft prompt had no effect"

    # equivalence: manually prepending the same rows via prompt_embeds
    table = np.asarray(jax.device_get(eng.runner.params["embed"]),
                       np.float32)
    embeds = np.concatenate([soft, table[np.asarray(prompt)]], axis=0)
    ids = [0] * 6 + prompt
    manual = _run(eng, [(ids, {"prompt_embeds": embeds})])[0]
    assert manual == adapted


def test_adapter_lifecycle_and_errors(eng):
    rng = np.random.default_rng(1)
    H = eng.config.model.hidden_size
    with pytest.raises(PromptAdapterError):
        eng.prompt_adapters.get("missing")
    with pytest.raises(PromptAdapterError):
        eng.prompt_adapters.load("bad", rng.standard_normal((4, H + 1)))
    eng.prompt_adapters.load("tmp", rng.standard_normal((2, H)))
    eng.prompt_adapters.unload("tmp")
    with pytest.raises(PromptAdapterError):
        eng.prompt_adapters.unload("tmp")


def test_peft_checkpoint_ingestion(eng, tmp_path):
    rng = np.random.default_rng(2)
    H = eng.config.model.hidden_size
    path = str(tmp_path / "adapter_model.npz")
    np.savez(path, prompt_embeddings=rng.standard_normal((5, H))
             .astype(np.float32))
    assert eng.prompt_adapters.load_path("peft", path) == 5
    eng.prompt_adapters.unload("peft")
