"""Sampler + rejection sampler tests.

Statistical check mirrors the reference's rejection-sampler distribution test
(tests/samplers/test_rejection_sampler.py): the emitted-token distribution
must match the target distribution regardless of the draft distribution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qspec_tpu.ops.sampling import (RejectionResult, SamplingTensors,
                                    rejection_sample, sample, sampling_probs)


def test_greedy_is_argmax(rng):
    logits = jnp.asarray(rng.standard_normal((5, 64)).astype(np.float32))
    st = SamplingTensors.greedy(5)
    toks = sample(logits, st, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(jnp.argmax(logits, -1)))
    probs = sampling_probs(logits, st)
    assert (np.asarray(probs).max(-1) == 1.0).all()  # one-hot


def test_top_k_filters(rng):
    logits = jnp.asarray(rng.standard_normal((3, 100)).astype(np.float32))
    st = SamplingTensors(temperature=jnp.ones(3), top_k=jnp.full(3, 5, jnp.int32),
                         top_p=jnp.ones(3), min_p=jnp.zeros(3))
    probs = np.asarray(sampling_probs(logits, st))
    assert ((probs > 0).sum(-1) == 5).all()


def test_top_p_filters(rng):
    logits = jnp.asarray(rng.standard_normal((3, 100)).astype(np.float32) * 3)
    st = SamplingTensors(temperature=jnp.ones(3), top_k=jnp.zeros(3, jnp.int32),
                         top_p=jnp.full(3, 0.5), min_p=jnp.zeros(3))
    probs = np.asarray(sampling_probs(logits, st))
    kept = probs > 0
    # kept mass >= 0.5, and it is the smallest such prefix
    orig = np.asarray(jax.nn.softmax(logits, -1))
    masses = (orig * kept).sum(-1)
    assert (masses >= 0.5 - 1e-6).all()
    assert (kept.sum(-1) < 100).all()


def test_rejection_greedy_accept_matching():
    """Greedy: accepts exactly the prefix where draft argmax == target argmax."""
    V, B, k = 16, 4, 3
    rng = np.random.default_rng(0)
    t_logits = rng.standard_normal((B, k + 1, V)).astype(np.float32)
    target_argmax = t_logits.argmax(-1)
    draft_tokens = target_argmax[:, :k].copy()
    draft_tokens[1, 1] = (draft_tokens[1, 1] + 1) % V  # force rejection at pos 1
    draft_tokens[3, 0] = (draft_tokens[3, 0] + 1) % V  # reject immediately

    onehot = lambda idx: np.eye(V, dtype=np.float32)[idx]
    d_probs = onehot(draft_tokens)
    t_probs = onehot(target_argmax)
    res = rejection_sample(jnp.asarray(draft_tokens), jnp.asarray(d_probs),
                           jnp.asarray(t_probs), jax.random.PRNGKey(0))
    acc = np.asarray(res.accepted_len)
    np.testing.assert_array_equal(acc, [k + 1, 2, k + 1, 1])
    toks = np.asarray(res.tokens)
    # all emitted tokens equal target argmax at their positions
    for b in range(B):
        for j in range(acc[b]):
            assert toks[b, j] == target_argmax[b, j]
        assert (toks[b, acc[b]:] == -1).all()


@pytest.mark.parametrize("draft_quality", ["same", "noisy", "adversarial"])
def test_rejection_output_distribution_matches_target(draft_quality):
    """Emitted first-token distribution == target distribution (lossless)."""
    V, N = 8, 4000
    rng = np.random.default_rng(1)
    t = rng.random(V) + 0.1
    t /= t.sum()
    if draft_quality == "same":
        q = t
    elif draft_quality == "noisy":
        q = t + rng.random(V) * 0.3
        q /= q.sum()
    else:
        q = np.roll(t, 3)

    key = jax.random.PRNGKey(42)
    d_key, r_key = jax.random.split(key)
    draft_tokens = jax.random.categorical(
        d_key, jnp.log(jnp.asarray(q))[None, None, :].repeat(N, 0), axis=-1)
    d_probs = jnp.broadcast_to(jnp.asarray(q, jnp.float32), (N, 1, V))
    t_probs = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (N, 2, V))
    res = rejection_sample(draft_tokens.astype(jnp.int32), d_probs, t_probs, r_key)
    first = np.asarray(res.tokens[:, 0])
    emp = np.bincount(first, minlength=V) / N
    # chi-square-ish tolerance
    np.testing.assert_allclose(emp, t, atol=4 * np.sqrt(t.max() / N) + 0.01)


def test_rejection_accept_rate_full_when_identical():
    V, N, k = 8, 512, 3
    rng = np.random.default_rng(2)
    p = rng.random(V) + 0.1
    p /= p.sum()
    key = jax.random.PRNGKey(7)
    draft_tokens = jax.random.categorical(
        key, jnp.log(jnp.asarray(p))[None, None, :].repeat(N, 0).repeat(k, 1), axis=-1)
    probs = jnp.broadcast_to(jnp.asarray(p, jnp.float32), (N, k, V))
    t_probs = jnp.broadcast_to(jnp.asarray(p, jnp.float32), (N, k + 1, V))
    res = rejection_sample(draft_tokens.astype(jnp.int32), probs, t_probs,
                           jax.random.PRNGKey(9))
    # identical distributions: acceptance prob = min(1, p/q) = 1 everywhere
    assert (np.asarray(res.accepted_len) == k + 1).all()


def test_typical_acceptance_prefers_confident_tokens():
    from qspec_tpu.ops.sampling import typical_acceptance_sample
    V, B, k = 16, 2, 3
    # row 0: sharply peaked target agreeing with draft -> accept all
    t = np.full((B, k + 1, V), 1e-4, np.float32)
    draft = np.zeros((B, k), np.int32)
    t[0, :, 0] = 0.99
    # row 1: uniform target -> entropy high, threshold tiny vs p=1/16 > thresh?
    t[1] = 1.0 / V
    t /= t.sum(-1, keepdims=True)
    res = typical_acceptance_sample(jnp.asarray(draft), jnp.asarray(t),
                                    jax.random.PRNGKey(0))
    acc = np.asarray(res.accepted_len)
    assert acc[0] == k + 1
    # uniform: alpha*exp(-H) = 0.3/16 ~= 0.019 < 1/16 -> accepted too
    assert acc[1] >= 1
    toks = np.asarray(res.tokens)
    assert (toks[0, :k] == 0).all()


def test_rejection_onehot_equals_generic_with_explicit_onehot():
    """rejection_sample_onehot(d, p, key) must be bit-identical to
    rejection_sample(d, one_hot(d), p, key): the specialization only
    removes the [B, k, V] materialization, not any semantics (including -1
    "no proposal" slots, which are always rejected)."""
    import jax
    import jax.numpy as jnp

    from qspec_tpu.ops.sampling import rejection_sample_onehot

    rng = np.random.default_rng(0)
    B, k, V = 7, 5, 97
    for trial in range(8):
        draft = rng.integers(0, V, size=(B, k)).astype(np.int32)
        draft[rng.random((B, k)) < 0.15] = -1            # ngram misses
        p = rng.random((B, k + 1, V)).astype(np.float32) ** 3
        p /= p.sum(-1, keepdims=True)
        key = jax.random.PRNGKey(trial)
        d_onehot = jax.nn.one_hot(jnp.asarray(draft), V, dtype=jnp.float32)
        a = rejection_sample(jnp.asarray(draft), d_onehot, jnp.asarray(p),
                             key)
        b = rejection_sample_onehot(jnp.asarray(draft), jnp.asarray(p), key)
        np.testing.assert_array_equal(np.asarray(a.tokens),
                                      np.asarray(b.tokens))
        np.testing.assert_array_equal(np.asarray(a.accepted_len),
                                      np.asarray(b.accepted_len))
        np.testing.assert_allclose(np.asarray(a.token_logprobs),
                                   np.asarray(b.token_logprobs), rtol=1e-6)
