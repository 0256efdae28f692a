"""E2E speculative-decoding invariants (reference pattern:
tests/spec_decode/e2e/test_integration.py — greedy spec output must equal
greedy autoregressive output)."""

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
    sched = SchedulerConfig(max_num_seqs=4, max_model_len=256,
                            prefill_chunk_size=64,
                            decode_batch_buckets=(2, 4),
                            prefill_token_buckets=(64,))
    return mc, params, sched


def run_engine(mc, params, sched, spec, prompts, max_tokens=20, temp=0.0,
               kv_dtype="bfloat16"):
    cfg = EngineConfig(model=mc,
                       cache=CacheConfig(page_size=16,
                                         kv_cache_dtype=kv_dtype),
                       scheduler=sched, speculative=spec)
    eng = LLMEngine(cfg, params)
    for p in prompts:
        eng.add_request(p, SamplingParams(temperature=temp, max_tokens=max_tokens))
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
    r = np.random.default_rng(7)
    return [list(map(int, r.integers(1, 500, size=int(r.integers(5, 40)))))
            for _ in range(n)]


@pytest.mark.parametrize("k", [1, 3, 5])
def test_greedy_spec_equals_ar(setup, k):
    mc, params, sched = setup
    ps = prompts()
    ar, _ = run_engine(mc, params, sched, None, ps)
    sp, eng = run_engine(mc, params, sched,
                         SpeculativeConfig(num_speculative_tokens=k), ps)
    assert ar == sp
    m = eng.spec_metrics
    assert m.num_spec_rounds > 0
    assert 0.0 <= m.draft_acceptance_rate <= 1.0
    assert m.num_emitted_tokens >= m.num_draft_accepted


@pytest.mark.parametrize("rounds", [2, 4])
def test_multi_round_greedy_equals_ar(setup, rounds):
    """Fused multi-round spec step (several draft+verify rounds per host
    call) must preserve the greedy invariant and respect max_tokens."""
    mc, params, sched = setup
    ps = prompts()
    ar, _ = run_engine(mc, params, sched, None, ps)
    sp, eng = run_engine(
        mc, params, sched,
        SpeculativeConfig(num_speculative_tokens=3, rounds_per_step=rounds), ps)
    assert ar == sp
    # every output token except each sequence's first (sampled at prefill)
    # was emitted by a spec round
    assert eng.spec_metrics.num_emitted_tokens >= \
        sum(len(v) for v in sp.values()) - len(sp)


def test_multi_step_ar_equals_single(setup):
    """Fused multi-step AR decode must match single-step AR exactly."""
    from qspec_tpu.config import SchedulerConfig
    mc, params, sched = setup
    ps = prompts()
    ar, _ = run_engine(mc, params, sched, None, ps)
    sched8 = SchedulerConfig(**{**sched.__dict__, "steps_per_decode_call": 8})
    ar8, _ = run_engine(mc, params, sched8, None, ps)
    assert ar == ar8


def test_disable_by_batch_size(setup):
    mc, params, sched = setup
    ps = prompts()
    spec = SpeculativeConfig(num_speculative_tokens=3, disable_by_batch_size=1)
    sp, eng = run_engine(mc, params, sched, spec, ps)
    # batches of >=1 seq always disable speculation -> no spec rounds
    assert eng.spec_metrics.num_spec_rounds == 0
    ar, _ = run_engine(mc, params, sched, None, ps)
    assert ar == sp


def test_spec_with_sampling_seeded(setup):
    """Temperature > 0: distributional equality is tested at the sampler
    level; here just assert the engine completes and respects max_tokens."""
    mc, params, sched = setup
    ps = prompts(3)
    sp, eng = run_engine(mc, params, sched,
                         SpeculativeConfig(num_speculative_tokens=3), ps,
                         max_tokens=12, temp=0.9)
    assert all(len(v) <= 12 for v in sp.values())
    assert eng.spec_metrics.num_emitted_tokens > 0


def test_ignore_eos_and_stop_tokens(setup):
    mc, params, sched = setup
    p = prompts(1)
    cfg = EngineConfig(model=mc, cache=CacheConfig(page_size=16),
                       scheduler=sched,
                       speculative=SpeculativeConfig(num_speculative_tokens=3))
    eng = LLMEngine(cfg, params, eos_token_id=None)
    # find which token greedy generates first, then use it as a stop token
    rid = eng.add_request(p[0], SamplingParams(temperature=0.0, max_tokens=5))
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o
    first = outs[rid].output_token_ids[0]

    eng2 = LLMEngine(cfg, params, eos_token_id=None)
    rid2 = eng2.add_request(p[0], SamplingParams(
        temperature=0.0, max_tokens=50, stop_token_ids=[first]))
    outs2 = {}
    while eng2.has_unfinished_requests():
        for o in eng2.step():
            if o.finished:
                outs2[o.request_id] = o
    assert outs2[rid2].output_token_ids[-1] == first
    assert outs2[rid2].finish_reason == "stop"
    assert len(outs2[rid2].output_token_ids) == 1


def test_penalties_in_spec_mode(setup):
    """Presence/frequency penalties must be applied inside the fused spec
    rounds (reference: penalties run in the target sampler regardless of
    proposer). Granularity is per host call (commit 'per-call granularity'),
    so the oracle is effect, not bit-equality: a strong presence penalty
    must suppress already-emitted tokens in both AR and spec modes."""
    mc, params, sched = setup
    ps = prompts(2)

    def distinct_ratio(outs):
        return min(len(set(v)) / max(len(v), 1) for v in outs.values())

    from qspec_tpu.sampling_params import SamplingParams
    from qspec_tpu.config import CacheConfig, EngineConfig

    def run_pen(spec, presence):
        cfg = EngineConfig(model=mc, cache=CacheConfig(page_size=16),
                           scheduler=sched, speculative=spec)
        eng = LLMEngine(cfg, params)
        for p in ps:
            eng.add_request(p, SamplingParams(
                temperature=0.0, max_tokens=24, ignore_eos=True,
                presence_penalty=presence, frequency_penalty=0.5 * presence))
        outs = {}
        while eng.has_unfinished_requests():
            for o in eng.step():
                if o.finished:
                    outs[o.request_id] = o.output_token_ids
        return outs

    spec = SpeculativeConfig(num_speculative_tokens=3)
    plain = run_pen(spec, 0.0)
    pen = run_pen(spec, 8.0)
    # greedy tiny models loop hard without penalties; with a crushing
    # presence penalty the spec-mode outputs must diversify
    assert distinct_ratio(pen) > distinct_ratio(plain)
    # and match the AR behaviour under the same (per-call) granularity
    ar_pen = run_pen(None, 8.0)
    assert distinct_ratio(ar_pen) > distinct_ratio(run_pen(None, 0.0))


def test_qspec_null_oracle_equals_ar(setup):
    """The qspec_null oracle (spec_rounds executable with nulled proposals)
    must emit exactly the AR transcript — the model-draft analogue of the
    ngram "null" oracle (reference
    tests/spec_decode/e2e/test_integration.py:34-126)."""
    mc, params, sched = setup
    ps = prompts()
    ar, _ = run_engine(mc, params, sched, None, ps)
    null, eng = run_engine(
        mc, params, sched,
        SpeculativeConfig(num_speculative_tokens=3, rounds_per_step=2,
                          method="qspec_null"), ps)
    assert ar == null
    # every round emits exactly one token (all proposals rejected)
    assert eng.spec_metrics.num_draft_accepted == 0


@pytest.mark.parametrize("window", [16, 48])
def test_windowed_draft_greedy_equals_ar(setup, window):
    """draft_kv_window (MagicDec-style sliding-window draft) must preserve
    losslessness: verification is full-context, so the greedy transcript is
    unchanged regardless of the draft's window."""
    mc, params, sched = setup
    ps = prompts()
    ar, _ = run_engine(mc, params, sched, None, ps)
    sp, eng = run_engine(
        mc, params, sched,
        SpeculativeConfig(num_speculative_tokens=3, rounds_per_step=2,
                          draft_kv_window=window), ps)
    assert ar == sp
    assert eng.spec_metrics.num_spec_rounds > 0


@pytest.mark.parametrize("method", ["qspec", "ngram"])
def test_chained_dispatch_equivalence(setup, method):
    """Back-to-back chained device calls (no host read-back between fused
    calls) must be transcript-identical to per-call dispatch. An unreachable
    stop_token_id forces chain=1 without altering sampling."""
    mc, params, sched = setup
    ps = prompts()
    spec = SpeculativeConfig(num_speculative_tokens=3, rounds_per_step=2,
                             method=method)

    def go(stop_ids):
        cfg = EngineConfig(model=mc,
                           cache=__import__("qspec_tpu.config",
                                            fromlist=["CacheConfig"]
                                            ).CacheConfig(page_size=16),
                           scheduler=sched, speculative=spec)
        eng = LLMEngine(cfg, params)
        for p in ps:
            eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=24,
                                              ignore_eos=True,
                                              stop_token_ids=stop_ids))
        outs = {}
        while eng.has_unfinished_requests():
            for o in eng.step():
                if o.finished:
                    outs[o.request_id] = o.output_token_ids
        return outs

    chained = go(None)           # eligible for chain > 1
    unchained = go([511])        # forces chain=1 (id 511 excluded by prompts)
    # token 511 could legitimately be sampled; strip any early stop effect
    for r in unchained:
        if unchained[r] and unchained[r][-1] == 511:
            pytest.skip("stop id sampled; oracle void for this seed")
    assert chained == unchained


def test_identical_draft_acceptance_stays_high(setup):
    """Draft-KV integrity: a w4a16 full-context shared-weights draft is
    arithmetically the target, so greedy acceptance must stay ~1.0 across
    MANY rounds. Regression for the draft-cache hole: the k-th proposal's
    KV is produced by the draft scan's last step but only written by a step
    that never runs, so every fully-accepted round used to leave one
    permanently-stale draft-cache position; holes compounded until
    acceptance plateaued ~0.6 (observed on hardware with real weights at
    every draft scheme). The Q=2 backfill pass in _draft_impl repairs the
    hole each round."""
    mc, params, sched = setup
    ps = prompts()
    sp, eng = run_engine(
        mc, params, sched,
        SpeculativeConfig(num_speculative_tokens=3, rounds_per_step=2,
                          draft_scheme="w4a16"), ps, max_tokens=48)
    m = eng.spec_metrics
    assert m.num_draft_tokens > 100   # enough rounds for holes to compound
    # random tiny weights put a few argmaxes within Q=1-vs-Q=k+1 kernel-shape
    # ULPs of a tie (measured ~0.95 here, stationary in generation length;
    # the hole bug plateaued at ~0.6, and real weights measure 0.987)
    assert m.draft_acceptance_rate > 0.9, m.summary()


@pytest.mark.parametrize("kv_dtype", ["int8", "fp8_e4m3", "fp8_e5m2"])
def test_greedy_spec_equals_ar_quantized_kv(setup, kv_dtype):
    """The spec==AR greedy invariant must survive 8-bit KV (reference
    kv_cache_dtype int8/fp8): quantization changes WHAT both paths compute,
    but they must still compute the same thing."""
    mc, params, sched = setup
    ps = prompts()
    ar, _ = run_engine(mc, params, sched, None, ps, kv_dtype=kv_dtype)
    sp, eng = run_engine(mc, params, sched,
                         SpeculativeConfig(num_speculative_tokens=3), ps,
                         kv_dtype=kv_dtype)
    assert ar == sp
    assert eng.spec_metrics.num_spec_rounds > 0
