"""End-to-end engine run on the REAL chip with REAL (in-image-trained)
weights: the on-hardware greedy invariant the reference enforces in
tests/spec_decode/e2e/test_integration.py:34-126.

Uses the QuaRot-quantized induction LM (benchmarks/train_induction.py), whose
greedy continuations genuinely copy prompt structure — so both the w4a4-draft
QSpec path and the prompt-lookup ngram path get real, nontrivial acceptance.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

CKPT = os.path.join(os.path.dirname(__file__), "..", "..", "checkpoints")


def _load():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from bench import induction_prompts, load_induction
    for base in ("checkpoints/induction_lm_v2", "checkpoints/induction_lm_v1"):
        out = load_induction(base)
        if out[0] is not None:
            return out[0], out[1]
    pytest.skip("no induction checkpoint (run benchmarks/train_induction.py)")


@pytest.fixture(scope="module")
def engine_setup():
    cfg, params = _load()
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from bench import induction_prompts
    plen = min(192, cfg.max_position_embeddings // 2)
    prompts = induction_prompts(4, plen, cfg.vocab_size, seed=7)
    return cfg, params, prompts


def _run(cfg, params, prompts, spec_method, max_tokens=48):
    from qspec_tpu.config import (CacheConfig, EngineConfig, SchedulerConfig,
                                  SpeculativeConfig)
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.sampling_params import SamplingParams

    max_len = max(len(p) for p in prompts) + max_tokens + 64
    spec = (SpeculativeConfig(num_speculative_tokens=4, rounds_per_step=2,
                              method=spec_method)
            if spec_method else None)
    ec = EngineConfig(
        model=cfg, cache=CacheConfig(page_size=128),
        scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=max_len,
                                  prefill_chunk_size=256,
                                  prefill_token_buckets=(256,),
                                  decode_batch_buckets=(4,),
                                  steps_per_decode_call=1 if spec else 8),
        speculative=spec)
    eng = LLMEngine(ec, params)
    for p in prompts:
        eng.add_request(p, SamplingParams(temperature=0.0,
                                          max_tokens=max_tokens,
                                          ignore_eos=True))
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.output_token_ids
    metrics = eng.spec_metrics.summary() if spec else None
    return outs, metrics


def test_greedy_invariant_on_chip(engine_setup):
    """greedy spec == greedy AR, bit-for-bit, on the real TPU."""
    cfg, params, prompts = engine_setup
    ar, _ = _run(cfg, params, prompts, None)
    for method in ("qspec", "ngram"):
        sp, metrics = _run(cfg, params, prompts, method)
        assert metrics["draft_acceptance_rate"] > 0.3, metrics
        mism = [rid for rid in ar if sp.get(rid) != ar[rid]]
        assert not mism, (
            f"{method}: {len(mism)}/{len(ar)} greedy outputs diverged "
            f"from AR on hardware (metrics={metrics})")


def test_model_copies_prompt_structure(engine_setup):
    """Sanity: the quantized model still runs its induction circuit on-chip
    (the greedy continuation extends the prompt's repeating segment)."""
    cfg, params, prompts = engine_setup
    outs, _ = _run(cfg, params, prompts, None, max_tokens=32)
    hits = 0
    for rid, out in outs.items():
        prompt = prompts[rid] if rid < len(prompts) else None
        if prompt is None:
            continue
        want = []
        # the expected continuation tiles the prompt's repeating segment:
        # find its period from the prompt tail
        for period in range(16, 65):
            if prompt[-period:] == prompt[-2 * period:-period]:
                reps = (len(out) // period + 2)
                want = (prompt[-period:] * reps)[:len(out)]
                break
        if want and out == want:
            hits += 1
    assert hits >= len(outs) // 2, f"only {hits}/{len(outs)} copied"
