"""Prompt-embeds inputs + multimodal plumbing (reference: inputs_embeds /
EmbedsPrompt in vllm/inputs/data.py, multimodal registry + placeholder
expansion in vllm/multimodal/)."""

import numpy as np
import pytest

import jax

from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig, SpeculativeConfig)
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.models.llama import init_params
from qspec_tpu.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def setup():
    mc = ModelConfig.tiny(quant="w4")
    params = init_params(mc, seed=0)
    sched = SchedulerConfig(max_num_seqs=4, max_model_len=256,
                            prefill_chunk_size=64,
                            decode_batch_buckets=(2, 4),
                            prefill_token_buckets=(64,))
    return mc, params, sched


def _engine(mc, params, sched, spec=None, prefix_caching=True):
    cfg = EngineConfig(model=mc,
                       cache=CacheConfig(page_size=16,
                                         enable_prefix_caching=prefix_caching),
                       scheduler=sched, speculative=spec)
    return LLMEngine(cfg, params)


def _drive(eng):
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.output_token_ids
    return outs


def _embed_rows(params, token_ids):
    table = np.asarray(jax.device_get(params["embed"]), np.float32)
    return table[np.asarray(token_ids)]


def test_embeds_of_tokens_match_token_prompt(setup):
    """Feeding the embed-table rows of a prompt as prompt_embeds must
    reproduce the token-prompt transcript exactly."""
    mc, params, sched = setup
    rng = np.random.default_rng(5)
    toks = [int(t) for t in rng.integers(1, 500, size=20)]

    eng = _engine(mc, params, sched)
    r1 = eng.add_request(toks, SamplingParams(temperature=0.0, max_tokens=12,
                                              ignore_eos=True))
    out_tok = _drive(eng)[r1]

    eng2 = _engine(mc, params, sched)
    r2 = eng2.add_request(None, SamplingParams(temperature=0.0, max_tokens=12,
                                               ignore_eos=True),
                          prompt_embeds=_embed_rows(params, toks))
    out_emb = _drive(eng2)[r2]
    assert out_tok == out_emb


def test_mixed_batch_embeds_and_tokens(setup):
    """Embeds-fed and token-fed prompts co-scheduled in one rectangle each
    keep their own transcripts."""
    mc, params, sched = setup
    rng = np.random.default_rng(6)
    toks_a = [int(t) for t in rng.integers(1, 500, size=18)]
    toks_b = [int(t) for t in rng.integers(1, 500, size=23)]

    eng = _engine(mc, params, sched)
    ra = eng.add_request(toks_a, SamplingParams(temperature=0.0, max_tokens=8,
                                                ignore_eos=True))
    rb = eng.add_request(toks_b, SamplingParams(temperature=0.0, max_tokens=8,
                                                ignore_eos=True))
    ref = _drive(eng)

    eng2 = _engine(mc, params, sched)
    ra2 = eng2.add_request(None, SamplingParams(temperature=0.0, max_tokens=8,
                                                ignore_eos=True),
                           prompt_embeds=_embed_rows(params, toks_a))
    rb2 = eng2.add_request(toks_b, SamplingParams(temperature=0.0,
                                                  max_tokens=8,
                                                  ignore_eos=True))
    got = _drive(eng2)
    assert got[ra2] == ref[ra]
    assert got[rb2] == ref[rb]


def test_embeds_skip_prefix_cache(setup):
    """Two embeds prompts with identical PLACEHOLDER ids but different
    vectors must not share cached pages (garbage-KV hazard)."""
    mc, params, sched = setup
    rng = np.random.default_rng(7)
    toks_a = [int(t) for t in rng.integers(1, 500, size=40)]
    toks_b = [int(t) for t in rng.integers(1, 500, size=40)]

    eng = _engine(mc, params, sched)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    ra = eng.add_request(None, sp, prompt_embeds=_embed_rows(params, toks_a))
    out_a = _drive(eng)[ra]
    rb = eng.add_request(None, sp, prompt_embeds=_embed_rows(params, toks_b))
    out_b = _drive(eng)[rb]

    # oracle: token-prompt transcripts
    eng2 = _engine(mc, params, sched)
    r1 = eng2.add_request(toks_a, sp)
    r2 = eng2.add_request(toks_b, sp)
    ref = _drive(eng2)
    assert out_a == ref[r1]
    assert out_b == ref[r2]


def test_embeds_with_spec_decode(setup):
    """Speculation (shared-weights qspec) over an embeds prompt preserves
    the greedy invariant."""
    mc, params, sched = setup
    rng = np.random.default_rng(8)
    toks = [int(t) for t in rng.integers(1, 500, size=20)]
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    pe = _embed_rows(params, toks)

    eng = _engine(mc, params, sched)
    r1 = eng.add_request(None, sp, prompt_embeds=pe)
    ar = _drive(eng)[r1]

    eng2 = _engine(mc, params, sched,
                   spec=SpeculativeConfig(num_speculative_tokens=3))
    r2 = eng2.add_request(None, sp, prompt_embeds=pe)
    assert _drive(eng2)[r2] == ar


def test_multimodal_splice_and_generate(setup):
    """Image placeholders expand into projected patch embeddings and the
    engine decodes over them; output depends on the image content."""
    mc, params, sched = setup
    from qspec_tpu.multimodal import init_mm_projector
    params = {**params, "mm_projector": init_mm_projector(mc.hidden_size)}
    rng = np.random.default_rng(9)
    IMG_TOK = 7
    toks = [1, 2, 3, IMG_TOK, 4, 5, 6]
    img1 = rng.random((32, 32, 3)).astype(np.float32)
    img2 = rng.random((32, 32, 3)).astype(np.float32)

    eng = _engine(mc, params, sched)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    ra = eng.add_request(list(toks), sp, mm_images=[img1], image_token_id=IMG_TOK)
    rb = eng.add_request(list(toks), sp, mm_images=[img2], image_token_id=IMG_TOK)
    outs = _drive(eng)
    # 32x32 -> 4 patches: prompt grew by 3 positions; both ran fine
    assert len(outs[ra]) == 8 and len(outs[rb]) == 8
    assert outs[ra] != outs[rb]  # different images -> different continuations

    # image count mismatches are rejected
    with pytest.raises(ValueError):
        eng.add_request(list(toks), sp, mm_images=[img1, img2],
                        image_token_id=IMG_TOK)


def test_llm_dict_prompt_forms(setup):
    """LLM.generate accepts TextPrompt/TokensPrompt/EmbedsPrompt-style
    dicts (reference vllm/inputs/data.py)."""
    mc, params, sched = setup
    from qspec_tpu.entrypoints.llm import LLM
    from qspec_tpu.multimodal import init_mm_projector
    params = {**params, "mm_projector": init_mm_projector(mc.hidden_size)}
    llm = LLM(model="tiny", params=params, block_size=16, max_num_seqs=4,
              max_model_len=256)
    rng = np.random.default_rng(10)
    toks = [int(t) for t in rng.integers(1, 500, size=16)]
    img = rng.random((32, 32, 3)).astype(np.float32)
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    outs = llm.generate(
        [{"prompt_token_ids": toks},
         {"prompt_token_ids": None,
          "prompt_embeds": _embed_rows(params, toks)},
         {"prompt_token_ids": [1, 2, 7, 3], "multi_modal_data": {"image": img},
          "image_token_id": 7}],
        sp)
    assert all(len(o.output_token_ids) == 4 for o in outs)
    assert outs[0].output_token_ids == outs[1].output_token_ids
