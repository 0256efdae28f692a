"""MLPSpeculator proposer tests (reference pattern:
tests/spec_decode/e2e/test_mlp_correctness.py — greedy MLPSpeculator spec
output must equal greedy autoregressive output for ANY net weights, because
proposals verify through the lossless one-hot rejection path)."""

import numpy as np
import pytest

from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig, SpeculativeConfig)
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.models.llama import init_params
from qspec_tpu.sampling_params import SamplingParams
from qspec_tpu.spec_decode.mlp_speculator import (init_mlp_speculator_params,
                                                  mlp_speculator_propose)


@pytest.fixture(scope="module")
def setup():
    mc = ModelConfig.tiny(quant="w4")
    params = init_params(mc, seed=0)
    # random net: proposals are garbage w.r.t. the model, which is exactly
    # the adversarial case for losslessness
    params = {**params, "mlp_spec": init_mlp_speculator_params(
        mc.hidden_size, mc.vocab_size, k=4, seed=3, scale_input=True)}
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


def prompts(n=4):
    r = np.random.default_rng(17)
    return [list(map(int, r.integers(1, 500, size=int(r.integers(5, 40)))))
            for _ in range(n)]


def test_propose_matches_numpy_reference():
    """Bit-level check of the recurrence against a plain numpy transcription
    of the reference forward (mlp_speculator.py:162-186)."""
    rng = np.random.default_rng(0)
    H, D, V, K, B = 48, 64, 96, 3, 5
    net = {
        "emb": rng.standard_normal((K, V, D)).astype(np.float32) * 0.2,
        "proj_first": rng.standard_normal((H, D)).astype(np.float32) * 0.2,
        "proj_rest": rng.standard_normal((K - 1, D, D)).astype(np.float32) * 0.2,
        "ln_w": rng.standard_normal((K, D)).astype(np.float32) * 0.3 + 1.0,
        "ln_b": rng.standard_normal((K, D)).astype(np.float32) * 0.1,
        "head": rng.standard_normal((K, D, V)).astype(np.float32) * 0.2,
    }
    h = rng.standard_normal((B, H)).astype(np.float32)
    last0 = rng.integers(0, V, size=B).astype(np.int32)

    sw = 0.5 ** (0.5 / K)
    ew = np.sqrt((1 - sw ** 2) * (D / 2))

    def l2norm(x):
        return x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-6)

    def gelu(x):
        # exact gelu via math.erf — no scipy dependency (the image may lack
        # it; this is the only place the suite would have imported it)
        from math import erf, sqrt
        cdf = np.vectorize(lambda v: 0.5 * (1.0 + erf(v / sqrt(2.0))))
        return x * cdf(x)

    state, last = h, last0
    want = np.zeros((B, K), np.int64)
    for j in range(K):
        z = net["emb"][j][last]
        w = net["proj_first"] if j == 0 else net["proj_rest"][j - 1]
        s = state @ w + z * (ew / sw)
        s = l2norm(s) * net["ln_w"][j] + net["ln_b"][j]
        state = gelu(s)
        last = np.argmax(state @ net["head"][j], axis=-1)
        want[:, j] = last

    import jax.numpy as jnp
    got = np.asarray(mlp_speculator_propose(
        {k: jnp.asarray(v) for k, v in net.items()}, jnp.asarray(h),
        jnp.asarray(last0)))
    # bf16 head math can flip near-ties; demand >90% agreement
    assert (got == want).mean() > 0.9


def test_scale_input_prenorm_changes_proposals():
    rng = np.random.default_rng(2)
    import jax.numpy as jnp
    H, V, K, B = 32, 64, 2, 4
    net = init_mlp_speculator_params(H, V, k=K, seed=5)
    net_si = dict(net, ln0=jnp.ones(()))
    h = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32) * 7)
    last = jnp.asarray(rng.integers(0, V, size=B).astype(np.int32))
    a = np.asarray(mlp_speculator_propose(net, h, last))
    b = np.asarray(mlp_speculator_propose(net_si, h, last))
    assert a.shape == b.shape == (B, K)


@pytest.mark.parametrize("k,rounds", [(2, 1), (4, 3)])
def test_greedy_mlp_speculator_equals_ar(setup, k, rounds):
    mc, params, sched = setup
    ps = prompts()
    ar, _ = run_engine(mc, params, sched, None, ps)
    sp, eng = run_engine(
        mc, params, sched,
        SpeculativeConfig(num_speculative_tokens=k, method="mlp_speculator",
                          rounds_per_step=rounds), ps)
    assert ar == sp
    m = eng.spec_metrics
    assert m.num_spec_rounds > 0
    assert 0.0 <= m.draft_acceptance_rate <= 1.0


def test_k_exceeding_heads_rejected(setup):
    mc, params, sched = setup
    with pytest.raises(ValueError, match="proposer heads"):
        run_engine(mc, params, sched,
                   SpeculativeConfig(num_speculative_tokens=9,
                                     method="mlp_speculator"), prompts(1))


def test_requires_net(setup):
    mc, params, sched = setup
    bare = {k: v for k, v in params.items() if k != "mlp_spec"}
    with pytest.raises(ValueError, match="mlp_spec"):
        run_engine(mc, bare, sched,
                   SpeculativeConfig(num_speculative_tokens=2,
                                     method="mlp_speculator"), prompts(1))


def test_sampling_completes(setup):
    mc, params, sched = setup
    sp, eng = run_engine(mc, params, sched,
                         SpeculativeConfig(num_speculative_tokens=3,
                                           method="mlp_speculator"),
                         prompts(3), max_tokens=12, temp=0.8)
    assert all(len(v) <= 12 for v in sp.values())
    assert eng.spec_metrics.num_emitted_tokens > 0


def test_save_load_roundtrip(tmp_path):
    import jax.numpy as jnp
    from qspec_tpu.spec_decode.mlp_speculator import load_mlp_speculator
    net = init_mlp_speculator_params(32, 64, k=3, seed=1, scale_input=True)
    p = tmp_path / "net.npz"
    np.savez(p, **{k: np.asarray(v, np.float32) for k, v in net.items()})
    back = load_mlp_speculator(str(p))
    assert set(back) == set(net)
    assert back["head"].shape == net["head"].shape
    h = jnp.zeros((2, 32), jnp.float32)
    last = jnp.zeros((2,), jnp.int32)
    a = np.asarray(mlp_speculator_propose(net, h, last))
    b = np.asarray(mlp_speculator_propose(back, h, last))
    assert (a == b).all()
