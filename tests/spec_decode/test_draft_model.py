"""Separate-draft-model speculation (reference draft_model_config +
multi_step_worker.py; TP split per smaller_tp_proposer_worker.py).

A smaller independent LM proposes; the target verifies. Rejection sampling
is lossless regardless of the draft's quality, so the greedy invariant must
hold even with a random tiny draft."""

import numpy as np
import pytest

from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig, SpeculativeConfig)
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.models.llama import init_params
from qspec_tpu.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def setup():
    mc = ModelConfig.tiny(quant="w4")
    params = init_params(mc, seed=0)
    # much smaller draft: 1 layer, narrower, bf16 — same vocabulary
    dc = ModelConfig.tiny(num_layers=1, hidden_size=128, intermediate_size=192,
                          num_heads=2, num_kv_heads=2, quant="none")
    draft_params = init_params(dc, seed=3)
    sched = SchedulerConfig(max_num_seqs=4, max_model_len=256,
                            prefill_chunk_size=64,
                            decode_batch_buckets=(2, 4),
                            prefill_token_buckets=(64,))
    return mc, params, dc, draft_params, sched


def run_engine(mc, params, sched, spec, prompts, draft_params=None,
               max_tokens=20, temp=0.0, seed=None, mesh=None):
    cfg = EngineConfig(model=mc, cache=CacheConfig(page_size=16),
                       scheduler=sched, speculative=spec)
    eng = LLMEngine(cfg, params, draft_params=draft_params, mesh=mesh)
    for p in prompts:
        eng.add_request(p, SamplingParams(temperature=temp,
                                          max_tokens=max_tokens, seed=seed))
    outs = {}
    steps = 0
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.output_token_ids
        steps += 1
        assert steps < 600
    return outs, eng


def prompts(n=4):
    r = np.random.default_rng(11)
    return [list(map(int, r.integers(1, 500, size=int(r.integers(5, 40)))))
            for _ in range(n)]


@pytest.mark.parametrize("rounds", [1, 2])
def test_draft_model_greedy_invariant(setup, rounds):
    mc, params, dc, draft_params, sched = setup
    ps = prompts()
    ar, _ = run_engine(mc, params, sched, None, ps)
    spec = SpeculativeConfig(num_speculative_tokens=3, rounds_per_step=rounds,
                             draft_model=dc)
    sp, eng = run_engine(mc, params, sched, spec, ps,
                         draft_params=draft_params)
    assert ar == sp
    m = eng.spec_metrics
    assert m.num_spec_rounds > 0
    assert 0.0 <= m.draft_acceptance_rate <= 1.0


def test_draft_model_requires_params(setup):
    mc, params, dc, _, sched = setup
    spec = SpeculativeConfig(num_speculative_tokens=3, draft_model=dc)
    with pytest.raises(ValueError, match="draft_params"):
        run_engine(mc, params, sched, spec, prompts(1))


def test_draft_model_vocab_must_match(setup):
    mc, params, _, _, sched = setup
    dc_bad = ModelConfig.tiny(num_layers=1, vocab_size=256, quant="none")
    spec = SpeculativeConfig(num_speculative_tokens=2, draft_model=dc_bad)
    with pytest.raises(AssertionError, match="vocab"):
        run_engine(mc, params, sched, spec, prompts(1),
                   draft_params=init_params(dc_bad, seed=1))


def test_draft_model_tp_replicated(setup):
    """Target TP-sharded over a 2-device mesh, draft replicated (draft-TP=1).

    The greedy invariant is asserted WITHIN the mesh (TP spec == TP AR):
    across different mesh sizes the psum reduction order differs by ULPs, so
    cross-mesh transcript equality is not a sound oracle (same reason the
    reference compares within one world size, tests/utils.py
    compare_two_settings)."""
    from qspec_tpu.parallel.tp import make_mesh

    mc, params, dc, draft_params, sched = setup
    ps = prompts(2)
    mesh = make_mesh(tp_size=2)
    ar, _ = run_engine(mc, params, sched, None, ps, mesh=mesh)
    spec = SpeculativeConfig(num_speculative_tokens=3, draft_model=dc)
    tp, eng = run_engine(mc, params, sched, spec, ps,
                         draft_params=draft_params, mesh=mesh)
    assert ar == tp
    assert eng.spec_metrics.num_spec_rounds > 0
