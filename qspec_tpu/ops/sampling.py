"""On-device sampling: top-k/p/min-p, seeded PRNG, and the speculative
rejection sampler.

TPU-native analogue of the reference's Sampler
(vllm/model_executor/layers/sampler.py:160) and RejectionSampler
(vllm/model_executor/layers/rejection_sampler.py:28,60). Everything is
jittable with static shapes: per-sequence temperatures/top-k/top-p arrive as
batched vectors so one compiled sampler serves mixed-parameter batches, and
the rejection sampler returns a fixed [B, k+1] token rectangle plus an
accepted-length vector instead of ragged outputs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class SamplingTensors(NamedTuple):
    """Per-sequence sampling knobs, padded to the batch bucket.

    ``vocab_mask`` [B, V] bool (True = token allowed) carries guided-decoding
    constraints (allowed/banned token sets, min-tokens EOS suppression — the
    reference's logits-processor slot, vllm/model_executor/guided_decoding).
    None when no row has constraints, so the unconstrained executables don't
    pay for it.
    """

    temperature: jnp.ndarray  # [B] f32; 0 => greedy
    top_k: jnp.ndarray        # [B] int32; <= 0 => disabled
    top_p: jnp.ndarray        # [B] f32; 1.0 => disabled
    min_p: jnp.ndarray        # [B] f32; 0 => disabled
    vocab_mask: Optional[jnp.ndarray] = None  # [B, V] bool or None
    # additive per-token logit bias: carries presence/frequency penalties
    # (reference sampler.py presence_penalty/frequency_penalty), computed
    # host-side from output-token counts; None when no row uses them
    logit_bias: Optional[jnp.ndarray] = None  # [B, V] f32 or None
    # grammar-guided decoding (qspec_tpu/guided/): stacked token-FSM
    # transition tables for the distinct grammars in the batch, the per-seq
    # grammar index (-1 = unguided) and each row's automaton state at call
    # entry. The fused loops advance local state copies on device; the host
    # re-derives persistent per-seq states by walking emitted tokens.
    grammar_next: Optional[jnp.ndarray] = None   # [G, S, V] int32, -1 = banned
    grammar_idx: Optional[jnp.ndarray] = None    # [B] int32
    grammar_state: Optional[jnp.ndarray] = None  # [B] int32

    @staticmethod
    def greedy(batch: int) -> "SamplingTensors":
        return SamplingTensors(jnp.zeros(batch), jnp.zeros(batch, jnp.int32),
                               jnp.ones(batch), jnp.zeros(batch))


def _grammar_rows(st: "SamplingTensors", gstate: jnp.ndarray):
    """(guided [rows] bool, next [rows, V] int32) for per-row states; the
    verify path evaluates k+1 positions per sequence, so gstate may have
    B*(k+1) rows against [B] grammar_idx."""
    gidx = st.grammar_idx
    if gidx.shape[0] != gstate.shape[0]:
        gidx = jnp.repeat(gidx, gstate.shape[0] // gidx.shape[0])
    guided = (gidx >= 0) & (gstate >= 0)
    nxt = st.grammar_next[jnp.maximum(gidx, 0), jnp.maximum(gstate, 0)]
    return guided, nxt


def grammar_mask(st: "SamplingTensors", gstate: Optional[jnp.ndarray]):
    """[rows, V] bool allowed-mask, or None when unguided. A dead state
    (gstate < 0, reachable only if the vocab can't realize the grammar)
    degrades to unconstrained rather than masking everything."""
    if st.grammar_next is None or gstate is None:
        return None
    guided, nxt = _grammar_rows(st, gstate)
    return jnp.where(guided[:, None], nxt >= 0, True)


def grammar_advance(st: "SamplingTensors", gstate: Optional[jnp.ndarray],
                    tokens: jnp.ndarray):
    """Advance each row's automaton by one emitted token."""
    if st.grammar_next is None or gstate is None:
        return gstate
    guided, nxt = _grammar_rows(st, gstate)
    stepped = jnp.take_along_axis(nxt, tokens[:, None], axis=1)[:, 0]
    return jnp.where(guided, stepped, gstate)


def _apply_top_k(logits: jnp.ndarray, top_k: jnp.ndarray) -> jnp.ndarray:
    vocab = logits.shape[-1]
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]  # descending
    k = jnp.clip(top_k, 1, vocab)
    kth = jnp.take_along_axis(sorted_logits, (k - 1)[:, None], axis=-1)
    keep = logits >= kth
    keep = jnp.where((top_k > 0)[:, None], keep, True)
    return jnp.where(keep, logits, NEG_INF)


def _apply_top_p(logits: jnp.ndarray, top_p: jnp.ndarray) -> jnp.ndarray:
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep the smallest prefix with cumulative mass >= top_p; threshold is
    # the lowest logit inside that prefix
    cutoff_mask = cum - probs < top_p[:, None]
    kth = jnp.min(jnp.where(cutoff_mask, sorted_logits, -NEG_INF), axis=-1, keepdims=True)
    keep = logits >= kth
    keep = jnp.where((top_p < 1.0)[:, None], keep, True)
    return jnp.where(keep, logits, NEG_INF)


def _apply_min_p(logits: jnp.ndarray, min_p: jnp.ndarray) -> jnp.ndarray:
    probs = jax.nn.softmax(logits, axis=-1)
    pmax = jnp.max(probs, axis=-1, keepdims=True)
    keep = probs >= pmax * min_p[:, None]
    keep = jnp.where((min_p > 0)[:, None], keep, True)
    return jnp.where(keep, logits, NEG_INF)


def sampling_probs(logits: jnp.ndarray, st: SamplingTensors,
                   gstate: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """logits [B, V] -> post-filter sampling distribution [B, V] (f32).

    Greedy rows (temperature 0) produce a one-hot argmax distribution, which
    makes rejection sampling reduce exactly to 'accept iff argmax matches' —
    the invariant behind the greedy spec == greedy AR test.

    ``gstate`` [rows]: per-row grammar automaton states (defaults to the
    call-entry states in st.grammar_state; fused loops pass their carried
    copy, the verify path passes per-position states).
    """
    lf = logits.astype(jnp.float32)

    def _per_seq(arr):
        if arr.shape[0] != lf.shape[0]:
            # verify path evaluates k+1 positions per sequence
            return jnp.repeat(arr, lf.shape[0] // arr.shape[0], axis=0)
        return arr

    if st.logit_bias is not None:
        lf = lf + _per_seq(st.logit_bias)
    if st.vocab_mask is not None:
        lf = jnp.where(_per_seq(st.vocab_mask), lf, NEG_INF)
    if gstate is None and st.grammar_state is not None:
        gstate = _per_seq(st.grammar_state)
    gm = grammar_mask(st, gstate)
    if gm is not None:
        lf = jnp.where(gm, lf, NEG_INF)
    temp = jnp.where(st.temperature > 0, st.temperature, 1.0)
    lf = lf / temp[:, None]

    def filtered(x):
        x = _apply_top_k(x, st.top_k)
        x = _apply_top_p(x, st.top_p)
        return _apply_min_p(x, st.min_p)

    # the top-k/p/min-p filters need full-vocab sorts; skip them at runtime
    # when no row asks for them (the common greedy/plain-temperature case)
    needs_filter = (jnp.any(st.top_k > 0) | jnp.any(st.top_p < 1.0)
                    | jnp.any(st.min_p > 0.0))
    lf = jax.lax.cond(needs_filter, filtered, lambda x: x, lf)
    probs = jax.nn.softmax(lf, axis=-1)
    greedy_src = lf if (st.vocab_mask is not None or st.logit_bias is not None
                        or gm is not None) else logits
    onehot = jax.nn.one_hot(jnp.argmax(greedy_src, axis=-1), logits.shape[-1],
                            dtype=jnp.float32)
    return jnp.where((st.temperature == 0)[:, None], onehot, probs)


def sample(logits: jnp.ndarray, st: SamplingTensors, key: jax.Array,
           gstate: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Sample one token per row. [B, V] -> [B] int32."""
    return sample_with_logprob(logits, st, key, gstate)[0]


def sample_with_logprob(logits: jnp.ndarray, st: SamplingTensors, key: jax.Array,
                        gstate: Optional[jnp.ndarray] = None):
    """[B, V] -> ([B] int32 tokens, [B] f32 logprob of the chosen token
    under the *unfiltered* softmax — the convention the reference's
    logprobs output uses)."""
    probs = sampling_probs(logits, st, gstate)
    sampled = jax.random.categorical(key, jnp.log(jnp.maximum(probs, 1e-30)), axis=-1)
    greedy_src = logits.astype(jnp.float32)
    if st.logit_bias is not None:
        greedy_src = greedy_src + st.logit_bias
    if st.vocab_mask is not None:
        greedy_src = jnp.where(st.vocab_mask, greedy_src, NEG_INF)
    if gstate is None and st.grammar_state is not None:
        gstate = st.grammar_state
    gm = grammar_mask(st, gstate)
    if gm is not None:
        greedy_src = jnp.where(gm, greedy_src, NEG_INF)
    greedy = jnp.argmax(greedy_src, axis=-1)
    toks = jnp.where(st.temperature == 0, greedy, sampled).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    chosen = jnp.take_along_axis(logp, toks[:, None], axis=-1)[:, 0]
    return toks, chosen


def top_logprobs(logits: jnp.ndarray, n: int):
    """Top-n alternatives under the unfiltered softmax (the convention the
    reference's Logprob dicts use, vllm/sequence.py Logprob): [B, V] ->
    (values [B, n] f32, ids [B, n] int32)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    vals, ids = jax.lax.top_k(logp, n)
    return vals, ids.astype(jnp.int32)


class RejectionResult(NamedTuple):
    tokens: jnp.ndarray        # [B, k+1] int32, -1 past accepted_len
    accepted_len: jnp.ndarray  # [B] int32 in [1, k+1]: accepted draft + 1
    num_draft_accepted: jnp.ndarray  # [B] int32 in [0, k]
    token_logprobs: jnp.ndarray  # [B, k+1] f32 log p_target(token), 0 past len


def typical_acceptance_sample(draft_tokens: jnp.ndarray, target_probs: jnp.ndarray,
                              key: jax.Array, posterior_threshold: float = 0.09,
                              posterior_alpha: float = 0.3) -> RejectionResult:
    """Typical acceptance (reference layers/typical_acceptance_sampler.py):
    accept d_i when p_target(d_i) exceeds min(threshold, alpha*exp(-H(p)));
    on the first failure emit argmax(p); lossy but higher-throughput.

    draft_tokens [B, k]; target_probs [B, k+1, V].
    """
    B, k = draft_tokens.shape
    p_at_d = jnp.take_along_axis(target_probs[:, :k], draft_tokens[..., None],
                                 axis=-1).squeeze(-1)                       # [B, k]
    ent = -jnp.sum(target_probs[:, :k] *
                   jnp.log(jnp.maximum(target_probs[:, :k], 1e-30)), axis=-1)
    thresh = jnp.minimum(posterior_threshold,
                         posterior_alpha * jnp.exp(-ent))                   # [B, k]
    accept = p_at_d > thresh

    rejected = ~accept
    n_acc = jnp.where(jnp.any(rejected, axis=1), jnp.argmax(rejected, axis=1), k)
    pos = jnp.minimum(n_acc, k)
    p_next = jnp.take_along_axis(target_probs, pos[:, None, None], axis=1)[:, 0]
    final_tok = jnp.argmax(p_next, axis=-1).astype(jnp.int32)
    accepted_len = n_acc + 1

    slots = jnp.arange(k + 1)[None, :]
    out = jnp.where(slots < n_acc[:, None],
                    jnp.pad(draft_tokens, ((0, 0), (0, 1))), -1)
    out = jnp.where(slots == n_acc[:, None], final_tok[:, None], out)
    out = out.astype(jnp.int32)
    p_at_out = jnp.take_along_axis(target_probs, jnp.maximum(out, 0)[..., None],
                                   axis=-1)[..., 0]
    logp = jnp.where(out >= 0, jnp.log(jnp.maximum(p_at_out, 1e-30)), 0.0)
    return RejectionResult(out, accepted_len.astype(jnp.int32),
                           n_acc.astype(jnp.int32), logp.astype(jnp.float32))


def rejection_sample(draft_tokens: jnp.ndarray, draft_probs: jnp.ndarray,
                     target_probs: jnp.ndarray, key: jax.Array) -> RejectionResult:
    """Lossless speculative verification (reference rejection_sampler.py:60).

    draft_tokens: [B, k]; draft_probs: [B, k, V] (draft sampling dist q);
    target_probs: [B, k+1, V] (target dist p at each position). Per sequence:
    accept d_i with prob min(1, p_i(d_i)/q_i(d_i)); at the first rejection
    emit a recovery token from norm(max(p_i - q_i, 0)); if all k accepted,
    emit a bonus token from p_k. Output distribution provably equals the
    target's — verified in tests against autoregressive decoding.
    """
    B, k = draft_tokens.shape
    u_key, rec_key, bonus_key = jax.random.split(key, 3)

    d_safe = jnp.maximum(draft_tokens, 0)[..., None]
    p_at_d = jnp.take_along_axis(target_probs[:, :k], d_safe, axis=-1).squeeze(-1)
    q_at_d = jnp.take_along_axis(draft_probs, d_safe, axis=-1).squeeze(-1)
    u = jax.random.uniform(u_key, (B, k))
    accept = u < jnp.minimum(1.0, p_at_d / jnp.maximum(q_at_d, 1e-30))
    # a -1 slot means "no proposal" (ngram miss / null proposer): always
    # rejected, and q=0 there must not turn into an inf acceptance ratio
    accept = accept & (draft_tokens >= 0) & (q_at_d > 0)

    # number of leading accepts
    rejected = ~accept
    first_rej = jnp.where(jnp.any(rejected, axis=1),
                          jnp.argmax(rejected, axis=1), k)  # [B] in [0, k]
    n_acc = first_rej

    # recovery distribution at the first rejected position
    pos = jnp.minimum(n_acc, k - 1)
    p_rej = jnp.take_along_axis(target_probs, pos[:, None, None], axis=1)[:, 0]  # [B, V]
    q_rej = jnp.take_along_axis(draft_probs, pos[:, None, None], axis=1)[:, 0]
    resid = jnp.maximum(p_rej - q_rej, 0.0)
    resid_sum = jnp.sum(resid, axis=-1, keepdims=True)
    # degenerate case (q covers p exactly): fall back to p
    resid = jnp.where(resid_sum > 1e-9, resid, p_rej)
    recovery = jax.random.categorical(
        rec_key, jnp.log(jnp.maximum(resid, 1e-30)), axis=-1).astype(jnp.int32)

    bonus = jax.random.categorical(
        bonus_key, jnp.log(jnp.maximum(target_probs[:, k], 1e-30)), axis=-1
    ).astype(jnp.int32)

    all_accepted = n_acc == k
    final_tok = jnp.where(all_accepted, bonus, recovery)  # token at slot n_acc
    accepted_len = n_acc + 1

    slots = jnp.arange(k + 1)[None, :]
    out = jnp.where(slots < n_acc[:, None],
                    jnp.pad(draft_tokens, ((0, 0), (0, 1))), -1)
    out = jnp.where(slots == n_acc[:, None], final_tok[:, None], out)
    out = out.astype(jnp.int32)

    p_at_out = jnp.take_along_axis(target_probs, jnp.maximum(out, 0)[..., None],
                                   axis=-1)[..., 0]
    logp = jnp.where(out >= 0, jnp.log(jnp.maximum(p_at_out, 1e-30)), 0.0)
    return RejectionResult(out, accepted_len.astype(jnp.int32),
                           n_acc.astype(jnp.int32), logp.astype(jnp.float32))


def rejection_sample_onehot(draft_tokens: jnp.ndarray,
                            target_probs: jnp.ndarray,
                            key: jax.Array) -> RejectionResult:
    """rejection_sample specialized to DETERMINISTIC proposals (q_i is the
    one-hot at d_i: ngram lookup, Medusa/EAGLE/MLPSpeculator top-1 chains).

    Substituting q = delta(d_i) into the lossless rule collapses it without
    ever materializing the [B, k, V] draft distribution (at Llama-3's
    V=128256, B=32, k=8 that tensor is ~131 MB of fp32 per round):

    * accept prob  min(1, p(d_i)/q(d_i)) = p(d_i)
    * residual     norm(max(p - q, 0))   = p with entry d_i zeroed
      (max(p(d)-1, 0) = 0 at d; p elsewhere)

    Output distribution still provably equals the target's — tested
    equivalent to rejection_sample with an explicit one-hot q
    (tests/test_sampling.py). Reference semantics:
    layers/rejection_sampler.py:60.
    """
    B, k = draft_tokens.shape
    u_key, rec_key, bonus_key = jax.random.split(key, 3)

    d_safe = jnp.maximum(draft_tokens, 0)[..., None]
    p_at_d = jnp.take_along_axis(target_probs[:, :k], d_safe,
                                 axis=-1).squeeze(-1)
    u = jax.random.uniform(u_key, (B, k))
    accept = (u < p_at_d) & (draft_tokens >= 0)

    rejected = ~accept
    first_rej = jnp.where(jnp.any(rejected, axis=1),
                          jnp.argmax(rejected, axis=1), k)   # [B] in [0, k]
    n_acc = first_rej

    # recovery: p at the first rejected position, with the rejected draft
    # token's mass removed (q's one-hot support); -1 slots carried no
    # proposal, so nothing is masked there
    pos = jnp.minimum(n_acc, k - 1)
    p_rej = jnp.take_along_axis(target_probs, pos[:, None, None],
                                axis=1)[:, 0]                # [B, V]
    d_rej = jnp.take_along_axis(draft_tokens, pos[:, None], axis=1)  # [B, 1]
    V = target_probs.shape[-1]
    mask_d = (jnp.arange(V)[None, :] == d_rej) & (d_rej >= 0)
    resid = jnp.where(mask_d, 0.0, p_rej)
    resid_sum = jnp.sum(resid, axis=-1, keepdims=True)
    resid = jnp.where(resid_sum > 1e-9, resid, p_rej)
    recovery = jax.random.categorical(
        rec_key, jnp.log(jnp.maximum(resid, 1e-30)), axis=-1).astype(jnp.int32)

    bonus = jax.random.categorical(
        bonus_key, jnp.log(jnp.maximum(target_probs[:, k], 1e-30)), axis=-1
    ).astype(jnp.int32)

    all_accepted = n_acc == k
    final_tok = jnp.where(all_accepted, bonus, recovery)
    accepted_len = n_acc + 1

    slots = jnp.arange(k + 1)[None, :]
    out = jnp.where(slots < n_acc[:, None],
                    jnp.pad(draft_tokens, ((0, 0), (0, 1))), -1)
    out = jnp.where(slots == n_acc[:, None], final_tok[:, None], out)
    out = out.astype(jnp.int32)

    p_at_out = jnp.take_along_axis(target_probs,
                                   jnp.maximum(out, 0)[..., None],
                                   axis=-1)[..., 0]
    logp = jnp.where(out >= 0, jnp.log(jnp.maximum(p_at_out, 1e-30)), 0.0)
    return RejectionResult(out, accepted_len.astype(jnp.int32),
                           n_acc.astype(jnp.int32), logp.astype(jnp.float32))
