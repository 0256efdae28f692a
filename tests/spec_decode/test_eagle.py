"""EAGLE proposer tests: the one-hot rejection path makes greedy EAGLE
output equal greedy AR for ANY draft-net weights (reference pattern:
tests/spec_decode/e2e — spec output equals non-spec output)."""

import numpy as np
import pytest

from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig, SpeculativeConfig)
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.models.llama import init_params
from qspec_tpu.sampling_params import SamplingParams
from qspec_tpu.spec_decode.eagle import (eagle_cfg_for, init_eagle_params,
                                         load_eagle, save_eagle)


@pytest.fixture(scope="module")
def setup():
    mc = ModelConfig.tiny(quant="w4")
    params = init_params(mc, seed=0)
    params = {**params, "eagle": init_eagle_params(mc, seed=4)}
    sched = SchedulerConfig(max_num_seqs=4, max_model_len=256,
                            prefill_chunk_size=64,
                            decode_batch_buckets=(2, 4),
                            prefill_token_buckets=(64,))
    return mc, params, sched


def run_engine(mc, params, sched, spec, prompts, max_tokens=20, temp=0.0):
    cfg = EngineConfig(model=mc, cache=CacheConfig(page_size=16),
                       scheduler=sched, speculative=spec)
    eng = LLMEngine(cfg, params)
    for p in prompts:
        eng.add_request(p, SamplingParams(temperature=temp,
                                          max_tokens=max_tokens))
    outs = {}
    steps = 0
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.output_token_ids
        steps += 1
        assert steps < 600
    return outs, eng


def prompts(n=4, seed=13):
    r = np.random.default_rng(seed)
    return [list(map(int, r.integers(1, 500, size=int(r.integers(5, 40)))))
            for _ in range(n)]


@pytest.mark.parametrize("k,rounds", [(2, 1), (4, 3)])
def test_greedy_eagle_equals_ar(setup, k, rounds):
    mc, params, sched = setup
    ps = prompts()
    ar, _ = run_engine(mc, params, sched, None, ps)
    sp, eng = run_engine(
        mc, params, sched,
        SpeculativeConfig(num_speculative_tokens=k, method="eagle",
                          rounds_per_step=rounds), ps)
    assert ar == sp
    m = eng.spec_metrics
    assert m.num_spec_rounds > 0
    assert 0.0 <= m.draft_acceptance_rate <= 1.0


def test_eagle_multi_chunk_prompts(setup):
    """Prompts spanning several prefill chunks build the draft KV across
    chunk boundaries (shifted-token pairing at the seams)."""
    mc, params, sched = setup
    r = np.random.default_rng(3)
    ps = [list(map(int, r.integers(1, 500, size=150)))]  # > 2 chunks of 64
    ar, _ = run_engine(mc, params, sched, None, ps, max_tokens=16)
    sp, _ = run_engine(mc, params, sched,
                       SpeculativeConfig(num_speculative_tokens=3,
                                         method="eagle"), ps, max_tokens=16)
    assert ar == sp


def test_eagle_sampling_completes(setup):
    mc, params, sched = setup
    sp, eng = run_engine(mc, params, sched,
                         SpeculativeConfig(num_speculative_tokens=3,
                                           method="eagle"),
                         prompts(3), max_tokens=12, temp=0.8)
    assert all(len(v) <= 12 for v in sp.values())
    assert eng.spec_metrics.num_emitted_tokens > 0


def test_eagle_requires_net(setup):
    mc, params, sched = setup
    bare = {k: v for k, v in params.items() if k != "eagle"}
    with pytest.raises(ValueError, match="eagle"):
        run_engine(mc, bare, sched,
                   SpeculativeConfig(num_speculative_tokens=2,
                                     method="eagle"), prompts(1))


def test_eagle_save_load_roundtrip(tmp_path, setup):
    mc, params, _ = setup
    import jax
    p = str(tmp_path / "eagle.npz")
    save_eagle(p, params["eagle"])
    loaded = load_eagle(p, mc)
    orig_flat = jax.tree.leaves(params["eagle"]["layers"])
    load_flat = jax.tree.leaves(loaded["layers"])
    assert len(orig_flat) == len(load_flat)
    np.testing.assert_allclose(
        np.asarray(loaded["fc"], np.float32),
        np.asarray(params["eagle"]["fc"], np.float32), atol=2e-2)
    assert eagle_cfg_for(mc).num_layers == 1


def test_eagle_preemption_resume():
    """A preempted-and-recomputed sequence rebuilds its draft KV and span
    and still matches the uninterrupted transcript."""
    mc = ModelConfig.tiny(quant="w4")
    params = init_params(mc, seed=0)
    params = {**params, "eagle": init_eagle_params(mc, seed=4)}
    # tiny page pool: the second request forces preemption of the first
    sched = SchedulerConfig(max_num_seqs=2, max_model_len=192,
                            prefill_chunk_size=64,
                            decode_batch_buckets=(2,),
                            prefill_token_buckets=(64,))
    spec = SpeculativeConfig(num_speculative_tokens=3, method="eagle")
    ps = prompts(2, seed=9)

    # ample pages: no preemption
    cfg = EngineConfig(model=mc, cache=CacheConfig(page_size=16),
                       scheduler=sched, speculative=spec)
    eng = LLMEngine(cfg, params)
    ids = [eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=16,
                                             ignore_eos=True)) for p in ps]
    ref = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                ref[o.request_id] = o.output_token_ids

    # scarce pages: preemption must occur and transcripts must still match
    eng2 = LLMEngine(cfg, params, num_pages=30)
    ids2 = [eng2.add_request(p, SamplingParams(temperature=0.0, max_tokens=16,
                                               ignore_eos=True)) for p in ps]
    got = {}
    steps = 0
    while eng2.has_unfinished_requests():
        for o in eng2.step():
            if o.finished:
                got[o.request_id] = o.output_token_ids
        steps += 1
        assert steps < 600
    for a, b in zip(ids, ids2):
        assert ref[a] == got[b]
