"""Model runner: builds and caches the jitted TPU step functions.

TPU-native analogue of the reference's GPUModelRunner + CUDAGraphRunner +
TP1DraftModelRunner (vllm/worker/model_runner.py:990,2012;
vllm/spec_decode/draft_model_runner.py). Where the reference captures CUDA
graphs per batch size, we compile one XLA executable per (phase, batch
bucket) — jit *is* the graph capture. The QSpec scheme switch
(spec_decode_worker.py:795-812) appears here as two step functions closed
over the *same* params pytree: `draft_steps` (scheme=w4a4, scans k draft
tokens fully on-device — replacing the csrc advance_step kernel) and
`verify_step` (scheme=w4a16 + fused rejection sampling).

All functions take/return the paged caches functionally with donation, so
XLA updates the KV pages in place.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from qspec_tpu.config import EngineConfig
from qspec_tpu.models.llama import AttentionBatch, model_forward
from qspec_tpu.ops import kv_cache as kvc
from qspec_tpu.ops.sampling import (RejectionResult, SamplingTensors,
                                    grammar_advance, rejection_sample, sample,
                                    sample_with_logprob, sampling_probs,
                                    top_logprobs)


def _slot_of(block_tables: jnp.ndarray, pos: jnp.ndarray, page_size: int) -> jnp.ndarray:
    """Flat kv slot for absolute positions. block_tables [B, P], pos [B, Q]."""
    page_idx = pos // page_size
    page_id = jnp.take_along_axis(block_tables, page_idx, axis=1)
    return page_id * page_size + pos % page_size


# ---------------------------------------------------------------------------
# jitted step functions (pure; closed over static cfg/scheme)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit,
                   static_argnames=("cfg", "scheme", "axis_name",
                                    "with_hidden", "ring_cap"),
                   donate_argnames=("cache",))
def prefill_step(params, cache, token_ids, positions, block_tables, ctx_len,
                 lora_ids=None, input_embeds=None, embeds_rows=None,
                 mrope=None, *, cfg,
                 scheme, axis_name=None, with_hidden=False, ring_cap=None):
    """One prompt chunk for one sequence. token_ids [1, Q]; returns logits of
    the final valid position ([1, V]) and the updated cache.

    `ctx_len` [1] counts tokens including this chunk; padded tail positions
    (>= ctx_len) write to the null page and are masked out of attention by
    the kernel's causal/length mask.

    ``with_hidden`` additionally returns the final position's post-norm
    hidden state ([B, H]) — last-token pooling for embedding requests
    (reference vllm/model_executor/layers/pooler.py).

    ``ring_cap``: ring-buffer KV write floor (the MagicDec-style windowed
    draft's cache, see ModelRunner ring layout): ``block_tables`` wraps with
    period ring_pages, so within one rectangle only the final ``ring_cap``
    positions before each row's ctx_len may be written — older positions
    would alias the same physical pages in a single scatter (undefined write
    order). Their KV is dead anyway: the windowed draft never reads past the
    window, and early-query attention outputs of a prefill are discarded.
    """
    page_size = cache.page_size
    Q = token_ids.shape[1]
    valid = positions < ctx_len[:, None]
    if ring_cap is not None:
        valid &= positions >= ctx_len[:, None] - ring_cap
    slot = jnp.where(valid, _slot_of(block_tables, positions, page_size), 0)
    # mrope [B, 3, Q]: Qwen2-VL 3-channel rope positions (-> [3, B, Q] for
    # the rope lookup); attention masking stays on `positions`
    batch = AttentionBatch(positions=positions, slot_mapping=slot,
                           block_tables=block_tables, ctx_lens=ctx_len,
                           mrope=(None if mrope is None
                                  else mrope.transpose(1, 0, 2)))
    last_idx = jnp.clip(ctx_len - 1 - positions[:, 0], 0, Q - 1)
    if with_hidden:
        logits, hidden, cache = model_forward(
            params, cfg, token_ids, cache, batch, scheme=scheme,
            axis_name=axis_name, logits_indices=last_idx, lora_ids=lora_ids,
            return_hidden=True, input_embeds=input_embeds,
            embeds_rows=embeds_rows)
        return logits[:, 0], hidden[:, 0], cache
    logits, cache = model_forward(params, cfg, token_ids, cache, batch,
                                  scheme=scheme, axis_name=axis_name,
                                  logits_indices=last_idx, lora_ids=lora_ids,
                                  input_embeds=input_embeds,
                                  embeds_rows=embeds_rows)
    return logits[:, 0], cache


@functools.partial(jax.jit, static_argnames=("cfg", "scheme", "axis_name",
                                             "num_top"),
                   donate_argnames=("cache",))
def decode_step(params, cache, last_tokens, start_pos, block_tables, st, key,
                lora_ids=None, mrope_delta=None, *, cfg, scheme,
                axis_name=None, num_top=0):
    """Autoregressive decode: one token per sequence.

    last_tokens [B] (not yet processed), start_pos [B] = their positions.
    Returns (next_tokens [B], logprobs [B], cache); with ``num_top`` > 0 also
    the top-n alternative logprobs (values [B, n], ids [B, n]) before the
    cache — the reference's per-position Logprob dicts (vllm/sequence.py).
    """
    page_size = cache.page_size
    pos = start_pos[:, None]
    slot = _slot_of(block_tables, pos, page_size)
    # Qwen2-VL decode: all three rope channels equal pos + delta (HF
    # get_rope_index decode rule); attention stays at the true position
    mr = (None if mrope_delta is None else jnp.broadcast_to(
        (start_pos + mrope_delta)[None, :, None], (3,) + pos.shape))
    batch = AttentionBatch(positions=pos, slot_mapping=slot,
                           block_tables=block_tables, ctx_lens=start_pos + 1,
                           mrope=mr)
    logits, cache = model_forward(params, cfg, last_tokens[:, None], cache, batch,
                                  scheme=scheme, axis_name=axis_name,
                                  lora_ids=lora_ids)
    next_tokens, lp = sample_with_logprob(logits[:, 0], st, key)
    if num_top:
        topv, topi = top_logprobs(logits[:, 0], num_top)
        return next_tokens, lp, topv, topi, cache
    return next_tokens, lp, cache


@functools.partial(jax.jit, static_argnames=("cfg", "scheme", "num_steps",
                                             "axis_name", "num_top"),
                   donate_argnames=("cache",))
def multi_decode_step(params, cache, last_tokens, start_pos, block_tables,
                      max_new, st, key, lora_ids=None, mrope_delta=None, *,
                      cfg, scheme, num_steps,
                      axis_name=None, num_top=0):
    """num_steps autoregressive decode steps in one executable.

    TPU-native analogue of the reference's multi-step model runner
    (vllm/worker/multi_step_model_runner.py + csrc/prepare_inputs/
    advance_step.cu): token advancement happens on device; per-seq budgets
    cap emission. Returns (tokens [N, B] (-1 past budget), cache).
    """
    page_size = cache.page_size

    def body(carry, step_key):
        cache, tok, pos, budget, g = carry
        p = pos[:, None]
        slot = _slot_of(block_tables, p, page_size)
        mr = (None if mrope_delta is None else jnp.broadcast_to(
            (pos + mrope_delta)[None, :, None], (3,) + p.shape))
        batch = AttentionBatch(positions=p, slot_mapping=slot,
                               block_tables=block_tables, ctx_lens=pos + 1,
                               mrope=mr)
        logits, cache = model_forward(params, cfg, tok[:, None], cache, batch,
                                      scheme=scheme, axis_name=axis_name,
                                      lora_ids=lora_ids)
        nxt, lp = sample_with_logprob(logits[:, 0], st, step_key, g)
        active = budget > 0
        out = jnp.where(active, nxt, -1)
        new_tok = jnp.where(active, nxt, tok)
        g = jnp.where(active, grammar_advance(st, g, nxt), g) \
            if g is not None else None
        ys = (out, lp)
        if num_top:
            ys = ys + top_logprobs(logits[:, 0], num_top)
        return (cache, new_tok, pos + active.astype(jnp.int32),
                budget - active.astype(jnp.int32), g), ys

    keys = jax.random.split(key, num_steps)
    (cache, f_last, f_pos, f_budget, _), ys = jax.lax.scan(
        body, (cache, last_tokens, start_pos, max_new, st.grammar_state), keys)
    adv = (f_last, f_pos, f_budget)
    if num_top:
        toks, lps, topv, topi = ys
        return toks, lps, topv, topi, adv, cache
    toks, lps = ys
    return toks, lps, adv, cache


def _grammar_advance_emitted(st, g, toks):
    """Advance grammar states through one round's emitted tokens
    (toks [B, k+1], -1 past accepted_len)."""
    if g is None:
        return None
    for i in range(toks.shape[1]):
        t = toks[:, i]
        g = jnp.where(t >= 0, grammar_advance(st, g, jnp.maximum(t, 0)), g)
    return g


def _draft_impl(params, cache, last_tokens, start_pos, block_tables, st, key,
                *, cfg, scheme, k, axis_name=None, lora_ids=None, gstate=None,
                prev_tokens=None):
    """k sequential draft forwards; returns (tokens [B,k], probs, cache).

    ``prev_tokens`` (the token at ``start_pos - 1``) upgrades the FIRST step
    to a Q=2 pass over [prev, last]. This closes the draft-KV hole left by
    the PREVIOUS round: the k-th proposal's KV is never written during its
    own round (the scan's last step produces it but the next step — which
    would write it — never runs), so a fully-accepted round would otherwise
    leave a permanently stale draft-cache entry at that position. One such
    hole per full-acceptance round compounds into garbage draft attention
    and caps acceptance around ~0.6 even for a draft that is arithmetically
    identical to the target (observed: w4a16 full-context draft at 0.66).
    Re-processing the predecessor token rewrites that slot with the correct
    KV at zero extra weight traffic — the same self-healing structure the
    verify pass gets for free by scoring [last, d_1..d_k]. (The reference's
    draft runner re-runs all tokens emitted since the previous round for the
    same reason: vllm/spec_decode/multi_step_worker.py sampler_output
    feeding seq updates before proposals.) Rows at start_pos == 0 (1-token
    prompts, no predecessor) route the phantom query's KV write to the
    reserved null page; its garbage output is discarded.
    """
    page_size = cache.page_size
    if gstate is None:
        gstate = st.grammar_state

    first_k = k
    toks0 = probs0 = None
    if prev_tokens is not None:
        key, k0 = jax.random.split(key)
        p2 = jnp.stack([start_pos - 1, start_pos], axis=1)       # [B, 2]
        slot2 = jnp.where(
            p2 >= 0,
            _slot_of(block_tables, jnp.maximum(p2, 0), page_size), 0)
        batch = AttentionBatch(positions=p2, slot_mapping=slot2,
                               block_tables=block_tables,
                               ctx_lens=start_pos + 1)
        t2 = jnp.stack([prev_tokens, last_tokens], axis=1)
        logits, cache = model_forward(params, cfg, t2, cache, batch,
                                      scheme=scheme, axis_name=axis_name,
                                      lora_ids=lora_ids)
        probs0 = sampling_probs(logits[:, 1], st, gstate)
        toks0 = sample(logits[:, 1], st, k0, gstate)
        gstate = (grammar_advance(st, gstate, toks0)
                  if gstate is not None else None)
        last_tokens, start_pos = toks0, start_pos + 1
        first_k = k - 1

    def body(carry, step_key):
        cache, tok, pos, g = carry
        p = pos[:, None]
        slot = _slot_of(block_tables, p, page_size)
        batch = AttentionBatch(positions=p, slot_mapping=slot,
                               block_tables=block_tables, ctx_lens=pos + 1)
        logits, cache = model_forward(params, cfg, tok[:, None], cache, batch,
                                      scheme=scheme, axis_name=axis_name,
                                      lora_ids=lora_ids)
        # grammar-mask the draft distribution too: proposals stay inside the
        # grammar, so guided speculation keeps its acceptance rate
        probs = sampling_probs(logits[:, 0], st, g)
        nxt = sample(logits[:, 0], st, step_key, g)
        g = grammar_advance(st, g, nxt) if g is not None else None
        return (cache, nxt, pos + 1, g), (nxt, probs)

    if first_k > 0:
        keys = jax.random.split(key, first_k)
        (cache, _, _, _), (toks, probs) = jax.lax.scan(
            body, (cache, last_tokens, start_pos, gstate), keys)
        toks, probs = jnp.moveaxis(toks, 0, 1), jnp.moveaxis(probs, 0, 1)
    else:
        B = last_tokens.shape[0]
        toks = jnp.zeros((B, 0), last_tokens.dtype)
        probs = jnp.zeros((B, 0, cfg.vocab_size), jnp.float32)
    if toks0 is not None:
        toks = jnp.concatenate([toks0[:, None], toks], axis=1)
        probs = jnp.concatenate([probs0[:, None], probs], axis=1)
    return toks, probs, cache


@functools.partial(jax.jit, static_argnames=("cfg", "scheme", "k", "axis_name"),
                   donate_argnames=("cache",))
def draft_steps(params, cache, last_tokens, start_pos, block_tables, st, key,
                *, cfg, scheme, k, axis_name=None):
    """k sequential draft steps fully on-device (lax.scan).

    Replaces the reference's TP1DraftModelRunner python loop + advance_step
    CUDA kernel (draft_model_runner.py:280-341, csrc/prepare_inputs/
    advance_step.cu). Returns (draft_tokens [B, k], draft_probs [B, k, V],
    cache).
    """
    return _draft_impl(params, cache, last_tokens, start_pos, block_tables, st,
                       key, cfg=cfg, scheme=scheme, k=k, axis_name=axis_name)


def _verify_impl(params, cache, last_tokens, draft_tokens, draft_probs, start_pos,
                 block_tables, st, key, *, cfg, scheme, axis_name=None,
                 acceptance="rejection_sampler", lora_ids=None, gstate=None,
                 return_hidden=False):
    page_size = cache.page_size
    B, k = draft_tokens.shape
    tokens = jnp.concatenate([last_tokens[:, None], draft_tokens], axis=1)  # [B, k+1]
    positions = start_pos[:, None] + jnp.arange(k + 1)[None, :]
    slot = _slot_of(block_tables, positions, page_size)
    batch = AttentionBatch(positions=positions, slot_mapping=slot,
                           block_tables=block_tables, ctx_lens=start_pos + k + 1)
    hidden = None
    if return_hidden:
        # post-final-norm hidden per position: feeds the Medusa heads for
        # the NEXT round's proposals (spec_decode/medusa.py)
        logits, hidden, cache = model_forward(
            params, cfg, tokens, cache, batch, scheme=scheme,
            axis_name=axis_name, lora_ids=lora_ids, return_hidden=True)
    else:
        logits, cache = model_forward(params, cfg, tokens, cache, batch,
                                      scheme=scheme, axis_name=axis_name,
                                      lora_ids=lora_ids)  # [B, k+1, V]
    V = logits.shape[-1]
    st_rep = SamplingTensors(
        temperature=jnp.repeat(st.temperature, k + 1),
        top_k=jnp.repeat(st.top_k, k + 1),
        top_p=jnp.repeat(st.top_p, k + 1),
        min_p=jnp.repeat(st.min_p, k + 1),
        vocab_mask=st.vocab_mask,  # sampling_probs row-repeats 2D arrays
        logit_bias=st.logit_bias,
        grammar_next=st.grammar_next,
        grammar_idx=st.grammar_idx,
    )
    if gstate is None:
        gstate = st.grammar_state
    pos_states = None
    if st.grammar_next is not None and gstate is not None:
        # spec-mode re-masking: position i's target distribution is masked by
        # the automaton state reached through draft tokens 0..i-1 (reference
        # concept: guided logits processors applied per proposal position)
        states = [gstate]
        for i in range(k):
            states.append(grammar_advance(
                st, states[-1], jnp.maximum(draft_tokens[:, i], 0)))
        pos_states = jnp.stack(states, axis=1).reshape(B * (k + 1))
    target_probs = sampling_probs(logits.reshape(B * (k + 1), V), st_rep,
                                  pos_states)
    target_probs = target_probs.reshape(B, k + 1, V)
    if acceptance == "typical_acceptance_sampler":
        from qspec_tpu.ops.sampling import typical_acceptance_sample
        result = typical_acceptance_sample(draft_tokens, target_probs, key)
    elif draft_probs is None:
        # deterministic proposals: the one-hot-specialized lossless rule
        # (no [B, k, V] draft distribution ever materialized)
        from qspec_tpu.ops.sampling import rejection_sample_onehot
        result = rejection_sample_onehot(draft_tokens, target_probs, key)
    else:
        result = rejection_sample(draft_tokens, draft_probs, target_probs, key)
    if return_hidden:
        return (result, hidden), cache
    return result, cache


@functools.partial(jax.jit, static_argnames=("cfg", "scheme", "axis_name"),
                   donate_argnames=("cache",))
def verify_step(params, cache, last_tokens, draft_tokens, draft_probs, start_pos,
                block_tables, st, key, *, cfg, scheme, axis_name=None):
    """Score k+1 positions in one pass and rejection-sample.

    The MQA-scorer idea (vllm/spec_decode/mqa_scorer.py:10): the whole
    [last, d_1..d_k] window is one attention call per sequence, so the target
    weights stream once for k+1 tokens. Fuses the RejectionSampler
    (layers/rejection_sampler.py:60) into the same executable.
    """
    return _verify_impl(params, cache, last_tokens, draft_tokens, draft_probs,
                        start_pos, block_tables, st, key, cfg=cfg, scheme=scheme,
                        axis_name=axis_name)


@functools.partial(jax.jit, static_argnames=("cfg", "scheme", "axis_name"),
                   donate_argnames=("cache",))
def verify_step_onehot(params, cache, last_tokens, draft_tokens, start_pos,
                       block_tables, st, key, *, cfg, scheme, axis_name=None):
    """Verify deterministic proposals (n-gram prompt lookup): the draft
    distribution is the one-hot at each proposed token, handled implicitly
    by the specialized sampler (rejection_sample_onehot)."""
    return _verify_impl(params, cache, last_tokens, draft_tokens, None,
                        start_pos, block_tables, st, key, cfg=cfg, scheme=scheme,
                        axis_name=axis_name)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "draft_cfg", "draft_scheme",
                                    "verify_scheme", "k", "num_rounds",
                                    "axis_name", "draft_axis_name",
                                    "acceptance", "force_accept"),
                   donate_argnames=("draft_cache", "cache"))
def spec_rounds_step(params, draft_cache, cache, last_tokens, prev_tokens,
                     start_pos,
                     block_tables, draft_block_tables, max_new, enable, st,
                     key, lora_ids=None,
                     draft_params=None, *, cfg, draft_scheme, verify_scheme, k,
                     num_rounds=1, axis_name=None, draft_cfg=None,
                     draft_axis_name="inherit", acceptance="rejection_sampler",
                     force_accept=None):
    """`num_rounds` full QSpec rounds (draft k + verify + rejection) in ONE
    executable — one host round-trip for up to num_rounds*(k+1) tokens.

    This is the TPU answer to both the reference's SpecDecodeWorker step
    (spec_decode_worker.py:757) and its multi-step runner
    (worker/multi_step_model_runner.py): all control flow — token
    advancement, per-sequence accepted lengths, early stop on budget — runs
    on device with static shapes. `max_new` [B] caps emission per sequence
    (sequences that hit their cap keep "running" masked: writes keep landing
    on their already-allocated lookahead pages but results are discarded
    host-side).

    ``enable`` is a TRACED scalar bool (mirrors ngram_rounds_step): False
    nulls every proposal (tokens -> -1, draft probs -> 0, so the recovery
    distribution degenerates to the exact target distribution) and the
    executable emits exactly one autoregressive token per round THROUGH THE
    SAME COMPILED PROGRAM — the bit-exact AR oracle for the greedy
    spec == AR invariant on hardware (reference
    tests/spec_decode/e2e/test_integration.py:34-126).

    ``draft_params``/``draft_cfg``: a SEPARATE (typically much smaller) draft
    model (reference draft_model_config + multi_step_worker.py). When None,
    drafting reuses the shared QSpec weights under ``draft_scheme``;
    ``draft_cfg`` may still be set to a sliding-window variant of the target
    cfg (SpeculativeConfig.draft_kv_window — the MagicDec-style draft whose
    attention reads only the recent KV window).
    ``draft_axis_name`` is the draft's TP axis; the default "inherit" follows
    the target's. Under a mesh, pass None with replicated draft weights to
    run the draft collective-free on every chip — the TPU analogue of the
    reference's draft-TP=1 smaller_tp_proposer_worker.py.

    ``draft_block_tables`` maps the DRAFT cache's logical pages (same array
    as ``block_tables`` when the draft pool shares the target's page ids;
    a wrap-around ring table under the windowed draft's ring-buffer pool —
    see ModelRunner ring layout).

    Returns (tokens [R, B, k+1] (-1 padded), accepted_len [R, B], new caches).
    """
    d_params = params if draft_params is None else draft_params
    d_cfg = cfg if draft_cfg is None else draft_cfg
    assert d_cfg.vocab_size == cfg.vocab_size, \
        "draft and target must share a vocabulary (rejection sampling)"
    d_axis = axis_name if draft_axis_name == "inherit" else draft_axis_name
    # LoRA adapters live on the target weights only
    d_lora = lora_ids if draft_params is None else None

    def round_body(carry, round_key):
        draft_cache, cache, last, prev, pos, budget, g = carry
        dk, vk = jax.random.split(round_key)
        d_toks, d_probs, draft_cache = _draft_impl(
            d_params, draft_cache, last, pos, draft_block_tables, st, dk,
            cfg=d_cfg, scheme=draft_scheme, k=k, axis_name=d_axis,
            lora_ids=d_lora, gstate=g, prev_tokens=prev)
        # oracle mode: -1 tokens always reject; zeroed q makes the recovery
        # residual max(p - q, 0) = p exactly, so emission is bit-exact AR
        d_toks = jnp.where(enable, d_toks, -1)
        d_probs = jnp.where(enable, d_probs, 0.0)
        result, cache = _verify_impl(
            params, cache, last, d_toks, d_probs, pos, block_tables, st, vk,
            cfg=cfg, scheme=verify_scheme, axis_name=axis_name,
            acceptance=acceptance, lora_ids=lora_ids, gstate=g)
        # budget mask: emit at most `budget` more tokens per seq
        real_acc = result.accepted_len
        if force_accept is not None:
            # TIMING-HARNESS mode (SpeculativeConfig.force_accept_len):
            # override the acceptance decision with a fixed accepted length
            # to measure throughput as a function of acceptance at shapes
            # whose weights are synthetic (e.g. 8B dims with no in-image
            # checkpoint). ALL device work (k draft forwards, the full
            # verify pass, rejection arithmetic) still runs — only the
            # accepted-length decision is replaced, so wall time is honest.
            # Output tokens are NOT the target's greedy continuation.
            real_acc = jnp.full_like(real_acc,
                                     min(force_accept + 1, k + 1))
            # slots past the REAL accepted length hold -1; clamp so the
            # advanced last/prev tokens stay valid ids
            result = result._replace(tokens=jnp.maximum(result.tokens, 0))
        acc = jnp.minimum(real_acc, jnp.maximum(budget, 0))
        active = budget > 0
        acc = jnp.where(active, jnp.maximum(acc, 1), 0)
        slots = jnp.arange(k + 1)[None, :]
        toks = jnp.where(slots < acc[:, None], result.tokens, -1)
        lps = jnp.where(slots < acc[:, None], result.token_logprobs, 0.0)
        # advance: next input token is the last accepted; position += acc
        gather_idx = jnp.maximum(acc - 1, 0)[:, None]
        new_last = jnp.take_along_axis(result.tokens, gather_idx, axis=1)[:, 0]
        new_last = jnp.where(active, new_last, last)
        new_pos = pos + acc
        # predecessor token (at new_pos - 1) for the next round's draft
        # backfill pass: emitted[acc-2] when >= 2 tokens were emitted, else
        # this round's input `last` keeps that position
        idx2 = jnp.maximum(acc - 2, 0)[:, None]
        cand = jnp.take_along_axis(result.tokens, idx2, axis=1)[:, 0]
        new_prev = jnp.where(acc >= 2, cand, last)
        new_prev = jnp.where(active, new_prev, prev)
        g = _grammar_advance_emitted(st, g, toks)
        return ((draft_cache, cache, new_last, new_prev, new_pos,
                 budget - acc, g), (toks, acc, lps))

    keys = jax.random.split(key, num_rounds)
    (draft_cache, cache, f_last, f_prev, f_pos, f_budget, _), \
        (toks, accs, lps) = jax.lax.scan(
        round_body, (draft_cache, cache, last_tokens, prev_tokens, start_pos,
                     max_new, st.grammar_state), keys)
    return toks, accs, lps, (f_last, f_prev, f_pos, f_budget), \
        draft_cache, cache


@functools.partial(jax.jit,
                   static_argnames=("cfg", "scheme", "k", "num_rounds", "nmin",
                                    "nmax", "axis_name"),
                   donate_argnames=("cache", "history"))
def ngram_rounds_step(params, cache, history, hist_rows, hist_len, last_tokens,
                      start_pos, block_tables, max_new, enable, st, key, *, cfg,
                      scheme, k, num_rounds=1, nmin=1, nmax=4, axis_name=None):
    """`num_rounds` prompt-lookup speculation rounds in ONE executable.

    TPU-native redesign of the reference's NGramWorker round
    (vllm/spec_decode/ngram_worker.py): the host proposer costs one device
    round-trip per round; here the token history is a device array
    (``history`` [rows, Hmax], row per sequence slot, ``hist_rows`` [B]
    mapping batch position -> row) and matching + one-hot verification +
    rejection + history append all run on device (see ops/ngram.py).

    ``enable`` is a TRACED scalar bool: False turns every proposal into -1
    (always rejected), which makes this executable emit exactly one
    autoregressive token per round THROUGH THE SAME COMPILED PROGRAM — the
    bit-exact oracle for the greedy spec == greedy AR invariant on hardware
    (reference tests/spec_decode/e2e/test_integration.py:34; separate
    Q=1-shaped executables differ by bf16-amplified fusion-order ULPs).

    Returns (tokens [R, B, k+1] (-1 padded), accepted [R, B], logprobs,
    history, cache).
    """
    from qspec_tpu.ops.ngram import ngram_match_device
    Hmax = history.shape[1]

    def round_body(carry, round_key):
        cache, history, last, pos, hlen, budget, g = carry
        hist_b = history[hist_rows]
        props = ngram_match_device(hist_b, hlen, k=k, nmin=nmin, nmax=nmax)
        props = jnp.where(enable, props, -1)
        result, cache = _verify_impl(
            params, cache, last, props, None, pos, block_tables, st,
            round_key, cfg=cfg, scheme=scheme, axis_name=axis_name, gstate=g)
        acc = jnp.minimum(result.accepted_len, jnp.maximum(budget, 0))
        active = budget > 0
        acc = jnp.where(active, jnp.maximum(acc, 1), 0)
        slots = jnp.arange(k + 1)[None, :]
        toks = jnp.where(slots < acc[:, None], result.tokens, -1)
        lps = jnp.where(slots < acc[:, None], result.token_logprobs, 0.0)
        # append accepted tokens to each row's device history (OOB -> drop)
        cols = jnp.where(slots < acc[:, None], hlen[:, None] + slots, Hmax)
        history = history.at[hist_rows[:, None], cols].set(
            jnp.maximum(toks, 0), mode="drop")
        gather_idx = jnp.maximum(acc - 1, 0)[:, None]
        new_last = jnp.take_along_axis(result.tokens, gather_idx, axis=1)[:, 0]
        new_last = jnp.where(active, new_last, last)
        g = _grammar_advance_emitted(st, g, toks)
        return ((cache, history, new_last, pos + acc, hlen + acc,
                 budget - acc, g), (toks, acc, lps))

    keys = jax.random.split(key, num_rounds)
    (cache, history, f_last, f_pos, f_hlen, f_budget, _), (toks, accs, lps) = \
        jax.lax.scan(
        round_body, (cache, history, last_tokens, start_pos, hist_len, max_new,
                     st.grammar_state),
        keys)
    return toks, accs, lps, (f_last, f_pos, f_hlen, f_budget), history, cache


@functools.partial(jax.jit,
                   static_argnames=("cfg", "scheme", "k", "num_rounds",
                                    "axis_name"),
                   donate_argnames=("cache", "props"))
def medusa_rounds_step(params, cache, props, prop_rows, last_tokens, start_pos,
                       block_tables, max_new, enable, st, key, *, cfg, scheme,
                       k, num_rounds=1, axis_name=None):
    """`num_rounds` Medusa / MLPSpeculator speculation rounds in ONE
    executable (the proposer net is picked by which subtree the params
    carry: "medusa" -> independent heads, "mlp_spec" -> the recurrent
    token/embedding chain of spec_decode/mlp_speculator.py).

    TPU-native redesign of the reference's MedusaWorker round
    (vllm/spec_decode/medusa_worker.py): instead of a separate proposer
    worker running the heads on its own stored hidden states, each round's
    verify pass ALSO returns the post-norm hidden at every scored position;
    the heads (params["medusa"], spec_decode/medusa.py) read the hidden at
    the last ACCEPTED position and emit the next round's k proposals — so
    drafting costs zero additional forward passes and the whole
    propose->verify->accept->re-propose chain runs on device.

    ``props`` [rows, Pmax] is the device-resident proposal store (row per
    sequence slot, like ngram's history array; -1 rows mean "no proposal
    yet" and verify falls back to one AR token while still producing the
    hidden that seeds the next round). ``enable`` is a traced bool: False
    nulls every proposal — the same-executable bit-exact AR oracle used for
    the greedy-invariant check on hardware (see ngram_rounds_step).

    Returns (tokens [R, B, k+1] (-1 padded), accepted [R, B], logprobs,
    props, cache).
    """
    from qspec_tpu.spec_decode.medusa import medusa_propose
    from qspec_tpu.spec_decode.mlp_speculator import mlp_speculator_propose

    def round_body(carry, round_key):
        cache, props, last, pos, budget, g = carry
        p_b = props[prop_rows][:, :k]                     # [B, k]
        p_b = jnp.where(enable, p_b, -1)
        (result, hidden), cache = _verify_impl(
            params, cache, last, p_b, None, pos, block_tables, st,
            round_key, cfg=cfg, scheme=scheme, axis_name=axis_name, gstate=g,
            return_hidden=True)
        acc = jnp.minimum(result.accepted_len, jnp.maximum(budget, 0))
        active = budget > 0
        acc = jnp.where(active, jnp.maximum(acc, 1), 0)
        slots = jnp.arange(k + 1)[None, :]
        toks = jnp.where(slots < acc[:, None], result.tokens, -1)
        lps = jnp.where(slots < acc[:, None], result.token_logprobs, 0.0)
        gather_idx = jnp.maximum(acc - 1, 0)[:, None]
        new_last = jnp.take_along_axis(result.tokens, gather_idx, axis=1)[:, 0]
        new_last = jnp.where(active, new_last, last)
        # heads read the hidden that PRODUCED the last emitted token (index
        # acc-1): its lm_head output is that token, head j predicts j+1
        # positions further — exactly next round's draft slots
        h_star = jnp.take_along_axis(
            hidden, jnp.maximum(acc - 1, 0)[:, None, None], axis=1)[:, 0]
        if "medusa" in params:
            new_p = medusa_propose(params["medusa"], h_star)  # [B, K_heads]
        else:
            # MLPSpeculator's recurrent chain also consumes the last
            # EMITTED token (mlp_speculator_worker.py feeds sampled ids)
            new_p = mlp_speculator_propose(params["mlp_spec"], h_star,
                                           new_last)
        props = props.at[prop_rows, :new_p.shape[1]].set(
            jnp.where(active[:, None], new_p, props[prop_rows][:, :new_p.shape[1]]))
        g = _grammar_advance_emitted(st, g, toks)
        return ((cache, props, new_last, pos + acc, budget - acc, g),
                (toks, acc, lps))

    keys = jax.random.split(key, num_rounds)
    (cache, props, f_last, f_pos, f_budget, _), (toks, accs, lps) = \
        jax.lax.scan(
        round_body, (cache, props, last_tokens, start_pos, max_new,
                     st.grammar_state), keys)
    return toks, accs, lps, (f_last, f_pos, f_budget), props, cache


def _verify_tree_impl(params, cache, recent_tokens, tree_tokens, start_pos,
                      block_tables, st, key, *, cfg, scheme, tspec,
                      axis_name=None):
    """One Medusa TREE verify pass (reference: the Medusa tree attention the
    reference's heads are built for — top-k candidates per head scored in
    one pass under a tree-structured causal mask, models/medusa.py).

    Rectangle layout per row: [recent prefix | tree nodes].
    ``recent_tokens`` [B, prefix] are the last `prefix` COMMITTED tokens
    (rightmost at position start_pos). Re-scoring them every round (a) gives
    the root its logits and (b) REWRITES their KV slots — accepted tokens
    from the previous round had their KV parked at tree slots, so this is
    the same self-healing the shared-weights draft gets from its Q=2
    backfill (_draft_impl). Tree node i carries proposal token
    tree_tokens[:, i], rope position start_pos + depth(i), and cache SLOT
    start_pos + 1 + i; its attention sees the committed context plus its
    tree ancestors only (ops/attention.tree_slot_mask / the Pallas kernel's
    ancestor bits).

    Returns (t_samp [B, 1+T], t_lp [B, 1+T], hidden [B, 1+T, H], cache):
    the target-SAMPLED token (greedy: argmax) at the root and at every
    node — each is distributed as p_target(. | that node's path prefix), so
    the tree walk emits a lossless transcript at any temperature.
    """
    page_size = cache.page_size
    B, prefix = recent_tokens.shape
    T = tspec.num_nodes
    tokens = jnp.concatenate([recent_tokens, tree_tokens], axis=1)
    prefix_pos = (start_pos[:, None] - (prefix - 1)
                  + jnp.arange(prefix)[None, :])
    depth = jnp.asarray(tspec.depth, jnp.int32)
    tree_pos = start_pos[:, None] + depth[None, :]
    positions = jnp.concatenate([jnp.maximum(prefix_pos, 0), tree_pos], 1)
    tree_slot_idx = start_pos[:, None] + 1 + jnp.arange(T)[None, :]
    slot_idx = jnp.concatenate([jnp.maximum(prefix_pos, 0), tree_slot_idx], 1)
    slot = _slot_of(block_tables, slot_idx, page_size)
    # phantom prefix rows (position < 0 on very short prompts) write to the
    # reserved null page; their outputs are never read
    slot = jnp.where(jnp.concatenate(
        [prefix_pos >= 0, jnp.ones_like(tree_slot_idx, bool)], 1), slot, 0)
    batch = AttentionBatch(positions=positions, slot_mapping=slot,
                           block_tables=block_tables,
                           ctx_lens=start_pos + 1 + T)
    logits, hidden, cache = model_forward(
        params, cfg, tokens, cache, batch, scheme=scheme,
        axis_name=axis_name, return_hidden=True,
        tree=(prefix, tspec.ancestors))
    # sample the target at the root (row prefix-1) and at every tree node
    sel = jnp.arange(prefix - 1, prefix + T)
    lg = logits[:, sel]                                   # [B, 1+T, V]
    hid = hidden[:, sel]
    V = lg.shape[-1]
    n = T + 1
    st_rep = SamplingTensors(
        temperature=jnp.repeat(st.temperature, n),
        top_k=jnp.repeat(st.top_k, n), top_p=jnp.repeat(st.top_p, n),
        min_p=jnp.repeat(st.min_p, n), vocab_mask=st.vocab_mask,
        logit_bias=st.logit_bias, grammar_next=None, grammar_idx=None)
    t_samp, t_lp = sample_with_logprob(lg.reshape(B * n, V), st_rep, key)
    return (t_samp.reshape(B, n), t_lp.reshape(B, n), hid, cache)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "scheme", "tspec", "num_rounds",
                                    "axis_name"),
                   donate_argnames=("cache", "props", "recent_bank"))
def medusa_tree_rounds_step(params, cache, props, recent_bank, prop_rows,
                            start_pos, block_tables, max_new, enable, st, key,
                            *, cfg, scheme, tspec, num_rounds=1,
                            axis_name=None):
    """`num_rounds` Medusa TREE rounds in one executable.

    The reference pairs its Medusa heads with top-k/tree candidates
    (models/medusa.py + the Medusa paper's tree attention); the single-chain
    round ran the method below spec (~0.32 acceptance at k=5). Here every
    round verifies the whole static candidate tree in one rectangle and
    WALKS it: start at the root, sample the target's token, descend into the
    child proposing that token (emit it), repeat; the first miss ends the
    round with that sampled token as the recovery emission. Each emitted
    token is target-sampled conditioned on its accepted prefix -> lossless
    at any temperature; greedy is bit-equal to AR (``enable=False`` nulls
    the proposals and reduces every round to exactly that AR sample).

    ``props`` [rows, T]: device-resident per-sequence tree-node proposals.
    ``recent_bank`` [rows, D+2]: each sequence's last D+2 committed tokens
    (rightmost = the token at start_pos) — the verify prefix that re-scores
    the root and heals tree-slot KV residue.

    Returns (tokens [R, B, D+1] (-1 padded), accepted [R, B], logprobs,
    (start_pos, budget) advance, props, recent_bank, cache).
    """
    from qspec_tpu.spec_decode.medusa_tree import medusa_propose_tree
    T = tspec.num_nodes
    D = tspec.max_depth
    prefix = recent_bank.shape[1]
    B = prop_rows.shape[0]

    def round_body(carry, round_key):
        cache, props, recent_bank, pos, budget = carry
        recent = recent_bank[prop_rows]                  # [B, prefix]
        p_b = props[prop_rows][:, :T]
        p_b = jnp.where(enable, p_b, -1)
        t_samp, t_lp, hid, cache = _verify_tree_impl(
            params, cache, recent, p_b, pos, block_tables, st, round_key,
            cfg=cfg, scheme=scheme, tspec=tspec, axis_name=axis_name)

        # walk the tree (static unroll over depth levels)
        cur = jnp.zeros((B,), jnp.int32)                 # 0=root, 1..T=nodes
        alive = jnp.ones((B,), bool)
        e = t_samp[:, 0]
        lp_e = t_lp[:, 0]
        emitted = [e]
        lps_l = [lp_e]
        acc = jnp.ones((B,), jnp.int32)
        for d in range(1, D + 1):
            best = jnp.full((B,), -1, jnp.int32)
            for i in range(T):
                if tspec.depth[i] != d:
                    continue
                m = (alive & (cur == tspec.parent[i] + 1)
                     & (p_b[:, i] == e) & (p_b[:, i] >= 0))
                best = jnp.where(m & (best < 0), i + 1, best)
            alive = alive & (best >= 0)
            cur = jnp.where(alive, best, cur)
            e_next = jnp.take_along_axis(t_samp, cur[:, None], 1)[:, 0]
            lp_next = jnp.take_along_axis(t_lp, cur[:, None], 1)[:, 0]
            e = jnp.where(alive, e_next, e)
            lp_e = jnp.where(alive, lp_next, lp_e)
            emitted.append(jnp.where(alive, e_next, -1))
            lps_l.append(jnp.where(alive, lp_next, 0.0))
            acc = acc + alive.astype(jnp.int32)

        toks_full = jnp.stack(emitted, axis=1)           # [B, D+1]
        lps_full = jnp.stack(lps_l, axis=1)
        acc = jnp.minimum(acc, jnp.maximum(budget, 0))
        active = budget > 0
        acc = jnp.where(active, jnp.maximum(acc, 1), 0)
        slots = jnp.arange(D + 1)[None, :]
        toks = jnp.where(slots < acc[:, None], toks_full, -1)
        lps = jnp.where(slots < acc[:, None], lps_full, 0.0)

        # roll the recent window forward by `acc`
        combined = jnp.concatenate([recent, jnp.maximum(toks, 0)], axis=1)
        idx = acc[:, None] + jnp.arange(prefix)[None, :]
        new_recent = jnp.take_along_axis(combined, idx, axis=1)
        new_recent = jnp.where(active[:, None], new_recent, recent)
        recent_bank = recent_bank.at[prop_rows].set(new_recent, mode="drop")

        # next round's proposals from the hidden at the last ACCEPTED node
        h_star = jnp.take_along_axis(
            hid, cur[:, None, None], axis=1)[:, 0]
        new_p = medusa_propose_tree(params["medusa"], h_star, tspec)
        props = props.at[prop_rows].set(
            jnp.where(active[:, None], new_p, p_b), mode="drop")
        return ((cache, props, recent_bank, pos + acc, budget - acc),
                (toks, acc, lps))

    keys = jax.random.split(key, num_rounds)
    (cache, props, recent_bank, f_pos, f_budget), (toks, accs, lps) = \
        jax.lax.scan(round_body,
                     (cache, props, recent_bank, start_pos, max_new), keys)
    return toks, accs, lps, (f_pos, f_budget), props, recent_bank, cache


def _embed_rows_of(params, cfg, tokens):
    """Embed-table rows (with gemma's scale) for arbitrary token tensors."""
    e = params["embed"][tokens.reshape(-1)].astype(jnp.bfloat16)
    if cfg.embed_scale is not None:
        e = e * jnp.asarray(cfg.embed_scale, e.dtype)
    return e.reshape(tokens.shape + (e.shape[-1],))


@functools.partial(jax.jit, static_argnames=("cfg", "ecfg", "scheme",
                                             "axis_name"),
                   donate_argnames=("cache", "draft_cache"))
def prefill_eagle_step(params, cache, draft_cache, token_ids, shifted_tokens,
                       feat_len, positions, block_tables, ctx_len, *, cfg,
                       ecfg, scheme, axis_name=None):
    """Target prefill chunk + EAGLE draft-KV construction in one executable.

    ``shifted_tokens`` [B, Q] holds x_{p+1} for each position p of the chunk
    (known for the whole prompt); ``feat_len`` [B] counts valid features in
    the chunk (chunk_len, or chunk_len - 1 on the final chunk whose last
    feature needs the yet-unsampled first output token — the decode rounds
    cover that position from the carried span). Returns
    (logits_last [B, V], hidden_last [B, H], cache, draft_cache).
    """
    from qspec_tpu.spec_decode.eagle import eagle_layer_step, fuse_features

    page_size = cache.page_size
    B, Q = token_ids.shape
    valid = positions < ctx_len[:, None]
    slot = jnp.where(valid, _slot_of(block_tables, positions, page_size), 0)
    batch = AttentionBatch(positions=positions, slot_mapping=slot,
                           block_tables=block_tables, ctx_lens=ctx_len)
    last_idx = jnp.clip(ctx_len - 1 - positions[:, 0], 0, Q - 1)
    logits, hidden, cache = model_forward(
        params, cfg, token_ids, cache, batch, scheme=scheme,
        axis_name=axis_name, logits_indices=last_idx, return_hidden="all")

    feats = fuse_features(params["eagle"],
                          _embed_rows_of(params, cfg, shifted_tokens), hidden)
    start = positions[:, 0]
    fvalid = positions < (start + feat_len)[:, None]
    fslot = jnp.where(fvalid, slot, 0)
    fbatch = AttentionBatch(positions=positions, slot_mapping=fslot,
                            block_tables=block_tables,
                            ctx_lens=start + feat_len)
    _, draft_cache = eagle_layer_step(params["eagle"], ecfg, draft_cache,
                                      feats, fbatch)
    h_last = jnp.take_along_axis(hidden, last_idx[:, None, None], axis=1)[:, 0]
    return logits[:, 0], h_last, cache, draft_cache


@functools.partial(jax.jit,
                   static_argnames=("cfg", "ecfg", "scheme", "k",
                                    "num_rounds", "axis_name"),
                   donate_argnames=("draft_cache", "cache", "espan_h",
                                    "espan_t", "espan_pos", "espan_len"))
def eagle_rounds_step(params, draft_cache, cache, espan_h, espan_t,
                      espan_pos, espan_len, rows, block_tables, max_new, st,
                      key, *, cfg, ecfg, scheme, k, num_rounds=1,
                      axis_name=None):
    """`num_rounds` EAGLE rounds in ONE executable over the DEVICE-RESIDENT
    span bank.

    The carried span state — the previous round's accepted positions with
    their TRUE hiddens — lives in per-sequence bank rows (espan_h
    [rows, k+1, H], espan_t [rows, k+1], espan_pos/espan_len [rows]),
    donated and updated in place; ``rows`` [B] maps each batch lane to its
    row. Shipping this state host-side between engine steps used to cost a
    ~30 ms tunnel sync + a [B, k+1, H] download/upload per call and made
    EAGLE 0.73x AR at 0.99 acceptance while the fused round itself ran
    1.85x AR on-device (scratch/exp44_eagle_cost.py); resident rows follow
    the ngram history-bank pattern.

    Each round (1) re-feeds the span through the draft layer — overwriting
    any KV the previous drafting pass wrote there (the EAGLE rollback) and
    yielding the prediction seed; (2) drafts k tokens autoregressively on
    predicted hiddens; (3) verifies + rejection-samples through the one-hot
    path (lossless); (4) builds the next span from the verify pass's
    hiddens.

    Returns (tokens [R, B, k+1] (-1 padded), accepted [R, B], logprobs,
    budget, (espan_h, espan_t, espan_pos, espan_len), draft_cache, cache).
    """
    h_span = espan_h[rows].astype(jnp.bfloat16)
    t_span = espan_t[rows]
    span_pos = espan_pos[rows]
    span_len = espan_len[rows]
    from qspec_tpu.spec_decode.eagle import eagle_layer_step, fuse_features

    page_size = cache.page_size
    B = t_span.shape[0]
    lm_head = params["lm_head"]
    eagle = params["eagle"]
    span_w = t_span.shape[1]          # k + 1

    def round_body(carry, round_key):
        (draft_cache, cache, h_span, t_span, span_pos, span_len, budget,
         g) = carry
        pos = span_pos + span_len     # position of the pending last token
        last = jnp.take_along_axis(
            t_span, jnp.maximum(span_len - 1, 0)[:, None], axis=1)[:, 0]

        # (1) span re-feed with true hiddens
        feats = fuse_features(eagle, _embed_rows_of(params, cfg, t_span),
                              h_span)                       # [B, k+1, H]
        fpos = span_pos[:, None] + jnp.arange(span_w)[None, :]
        fvalid = jnp.arange(span_w)[None, :] < span_len[:, None]
        fslot = jnp.where(fvalid, _slot_of(block_tables, fpos, page_size), 0)
        fbatch = AttentionBatch(positions=fpos, slot_mapping=fslot,
                                block_tables=block_tables, ctx_lens=pos)
        a, draft_cache = eagle_layer_step(eagle, ecfg, draft_cache, feats,
                                          fbatch)
        h_hat = jnp.take_along_axis(
            a, jnp.maximum(span_len - 1, 0)[:, None, None], axis=1)[:, 0]

        # (2) draft k tokens on predicted hiddens (top-1, like Top1Proposer)
        def draft_one(j, carry):
            h_hat, draft_cache, props = carry
            d = _vocab_argmax(compute_logits_jit(h_hat, lm_head),
                              axis_name).astype(jnp.int32)  # token @ pos+1+j
            props = props.at[:, j].set(d)
            fp = (pos + j)[:, None]
            fs = _slot_of(block_tables, fp, page_size)
            fb = AttentionBatch(positions=fp, slot_mapping=fs,
                                block_tables=block_tables, ctx_lens=pos + j + 1)
            f = fuse_features(eagle, _embed_rows_of(params, cfg, d[:, None]),
                              h_hat[:, None])
            a1, draft_cache = eagle_layer_step(eagle, ecfg, draft_cache, f, fb)
            return a1[:, 0], draft_cache, props

        props = jnp.zeros((B, k), jnp.int32)
        h_hat, draft_cache, props = jax.lax.fori_loop(
            0, k, draft_one, (h_hat, draft_cache, props))

        # (3) verify + rejection (one-hot draft => lossless)
        (result, hidden), cache = _verify_impl(
            params, cache, last, props, None, pos, block_tables, st,
            round_key, cfg=cfg, scheme=scheme, axis_name=axis_name, gstate=g,
            return_hidden=True)
        acc = jnp.minimum(result.accepted_len, jnp.maximum(budget, 0))
        active = budget > 0
        acc = jnp.where(active, jnp.maximum(acc, 1), 0)
        slots = jnp.arange(k + 1)[None, :]
        toks = jnp.where(slots < acc[:, None], result.tokens, -1)
        lps = jnp.where(slots < acc[:, None], result.token_logprobs, 0.0)

        # (4) next span: true hiddens h_pos..h_pos+k paired with the
        # emitted tokens (t_span[i] = x at position pos+i+1)
        new_h = jnp.where(active[:, None, None], hidden, h_span)
        new_t = jnp.where(active[:, None], jnp.maximum(result.tokens, 0),
                          t_span)
        new_span_pos = jnp.where(active, pos, span_pos)
        new_span_len = jnp.where(active, acc, span_len)
        g = _grammar_advance_emitted(st, g, toks)
        return ((draft_cache, cache, new_h, new_t, new_span_pos,
                 new_span_len, budget - acc, g), (toks, acc, lps))

    keys = jax.random.split(key, num_rounds)
    (draft_cache, cache, h_span, t_span, span_pos, span_len, f_budget, _), \
        (toks, accs, lps) = jax.lax.scan(
            round_body,
            (draft_cache, cache, h_span, t_span, span_pos, span_len, max_new,
             st.grammar_state), keys)
    espan_h = espan_h.at[rows].set(h_span.astype(espan_h.dtype))
    espan_t = espan_t.at[rows].set(t_span)
    espan_pos = espan_pos.at[rows].set(span_pos)
    espan_len = espan_len.at[rows].set(span_len)
    return (toks, accs, lps, f_budget,
            (espan_h, espan_t, espan_pos, espan_len),
            draft_cache, cache)


# jitted-by-ambient compute_logits for the draft loop (params already traced)
def compute_logits_jit(x, lm_head):
    from qspec_tpu.models.llama import compute_logits
    return compute_logits(x, lm_head)


def _vocab_argmax(local, axis_name):
    """Argmax over logits whose vocab axis may be TP-sharded.

    Under shard_map each chip holds [B, V/S] of the head's output; a plain
    argmax would yield a different LOCAL index per chip and the replicated
    draft state would diverge. Each shard reduces its slice, then shards
    exchange (value, global-index) pairs; tie-breaking (lowest global index
    wins) matches the single-chip jnp.argmax exactly."""
    if axis_name is None:
        return jnp.argmax(local, axis=-1)
    v_local = local.shape[-1]
    li = jnp.argmax(local, axis=-1)
    lv = jnp.take_along_axis(local, li[..., None], axis=-1)[..., 0]
    gi = li + jax.lax.axis_index(axis_name) * v_local
    allv = jax.lax.all_gather(lv, axis_name)       # [S, B]
    alli = jax.lax.all_gather(gi, axis_name)
    shard = jnp.argmax(allv, axis=0)
    return jnp.take_along_axis(alli, shard[None], axis=0)[0]


# ---------------------------------------------------------------------------
# Runner: host-side padding/bucketing + cache ownership
# ---------------------------------------------------------------------------


class ModelRunner:
    """Owns params + paged caches and dispatches bucketed jitted steps."""

    def __init__(self, config: EngineConfig, params, num_pages: int,
                 need_draft_cache: bool = False, mesh=None, draft_params=None):
        self.config = config
        self.cfg = config.model
        self.params = params
        self.mesh = mesh
        page_size = config.cache.page_size
        if self.cfg.arch in ("mamba", "mamba2"):
            # state-in-page: the cache's physical page holds one layer's
            # recurrent state per sequence (models/mamba.py); the BLOCK
            # MANAGER keeps counting in tokens-per-page, the two page
            # notions are independent
            if self.cfg.arch == "mamba2":
                from qspec_tpu.models.mamba2 import state_page_geometry2 \
                    as state_page_geometry
            else:
                from qspec_tpu.models.mamba import state_page_geometry
            H, S, D = state_page_geometry(self.cfg)
            kv_cfg = kvc.KVCacheConfig(
                num_layers=self.cfg.num_layers, num_kv_heads=H,
                head_dim=D, num_pages=num_pages, page_size=S,
                dtype="bfloat16")
        else:
            kv_cfg = kvc.KVCacheConfig(
                num_layers=self.cfg.num_layers,
                num_kv_heads=self.cfg.cache_kv_heads,
                head_dim=self.cfg.cache_head_dim,
                num_pages=num_pages, page_size=page_size,
                dtype=config.cache.kv_cache_dtype)
        self.cache = kvc.allocate(kv_cfg)
        # encoder-decoder family: a SECOND paged cache holds the per-
        # decoder-layer cross K/V over encoder positions (models/bart.py);
        # same geometry and page tables as the self-KV cache
        self._encdec = self.cfg.arch == "bart"
        self.cross_cache = kvc.allocate(kv_cfg) if self._encdec else None
        # whisper: the cross bank is a row-per-sequence paged cache with
        # one max_source_positions page per row (models/whisper.py)
        self._whisper = self.cfg.arch == "whisper"
        self._cross_slot: dict = {}
        if self._whisper:
            rows = max(config.scheduler.decode_batch_buckets) + 1
            ccfg = kvc.KVCacheConfig(
                num_layers=self.cfg.num_layers,
                num_kv_heads=self.cfg.cache_kv_heads,
                head_dim=self.cfg.cache_head_dim, num_pages=rows,
                page_size=self.cfg.whisper_max_source_positions)
            self.cross_cache = kvc.allocate(ccfg)
        # separate-draft-model proposer: its own cfg/params/cache geometry
        # (same page ids/tables as the target — only the page CONTENTS and
        # per-page byte sizes differ)
        sep_draft = (config.speculative is not None
                     and config.speculative.draft_model is not None)
        self._eagle = (config.speculative is not None
                       and config.speculative.method == "eagle")
        self.draft_cfg = (config.speculative.draft_model if sep_draft
                          else self.cfg)
        self._windowed_draft = False
        if (config.speculative is not None and not sep_draft
                and config.speculative.draft_kv_window is not None):
            # MagicDec-style shared-weights draft: same params, but its
            # attention (and prompt prefill) run under a sliding window so
            # the draft streams only the recent KV at long context
            import dataclasses as _dc
            w = config.speculative.draft_kv_window
            if self.cfg.sliding_window is not None:
                w = min(w, self.cfg.sliding_window)
            self.draft_cfg = _dc.replace(self.cfg, sliding_window=w,
                                         sliding_window_pattern=1)
            self._windowed_draft = True
        if self._eagle:
            if "eagle" not in params:
                raise ValueError("speculative.method='eagle' but params "
                                 "carry no 'eagle' draft net (load with "
                                 "spec_decode.eagle.load_eagle)")
            from qspec_tpu.spec_decode.eagle import eagle_cfg_for
            # the draft KV cache geometry is the one-layer draft net's
            self.draft_cfg = eagle_cfg_for(self.cfg)
        self.draft_params = draft_params
        if sep_draft and draft_params is None:
            raise ValueError("speculative.draft_model set but no draft_params "
                             "passed to the engine")
        self.page_size = page_size
        self.max_pages_per_seq = -(-config.scheduler.max_model_len // page_size)
        spec_k = (config.speculative.num_speculative_tokens
                  if config.speculative else 1)
        # Ring-buffer draft-KV layout (MagicDec): the windowed draft only
        # ever reads the last `window` positions and writes at most k ahead,
        # so its cache needs a per-sequence RING of
        # ceil((window + k + 1) / page_size) + 2 pages with wrap-around page
        # reuse — NOT a second full-size pool (which doubled KV HBM and
        # OOM'd the 8B 2k-ctx bf16 point, BENCH_NOTES.md). The ring block
        # table maps logical page lp -> row*R + lp % R, so draft executables
        # are unchanged: the indirection lives entirely in the table. The
        # +2 page slack covers page-boundary straddle (a span of N tokens
        # touches up to ceil(N/S)+1 logical pages) and window off-by-ones.
        self._ring_pages = 0
        self._ring_rows = 0
        self._ring_slot: dict = {}
        ring_enabled = os.environ.get("QSPEC_RING_DRAFT", "1") != "0"
        if (need_draft_cache and self._windowed_draft and not self._eagle
                and ring_enabled):
            w = self.draft_cfg.sliding_window
            self._ring_pages = -(-(w + spec_k + 1) // page_size) + 2
            # row per sequence slot + a SCRATCH row for padded batch lanes;
            # page 0 stays the reserved null page (phantom-query writes,
            # masked prefill lanes), so rings start at page 1
            self._ring_rows = max(config.scheduler.decode_batch_buckets) + 1
            d_num_pages = self._ring_rows * self._ring_pages + 1
            # precomputed wrap pattern: table row = 1 + ring_row*R + lp % R
            self._ring_base = np.arange(self.max_pages_per_seq,
                                        dtype=np.int32) % self._ring_pages
        else:
            d_num_pages = num_pages
        if need_draft_cache:
            d_kv_cfg = kvc.KVCacheConfig(
                num_layers=self.draft_cfg.num_layers,
                num_kv_heads=self.draft_cfg.cache_kv_heads,
                head_dim=self.draft_cfg.cache_head_dim,
                num_pages=d_num_pages,
                page_size=page_size, dtype=config.cache.kv_cache_dtype)
            self.draft_cache = kvc.allocate(d_kv_cfg)
        else:
            self.draft_cache = None
        self.key = jax.random.PRNGKey(0)
        self._verify_scheme = ("w4a16" if self.cfg.quant in ("w4", "w4g", "w8")
                               else "bf16")
        if (config.speculative is not None
                and self.cfg.quant in ("w4g", "w8")
                and config.speculative.method in ("qspec", "qspec_null")
                and config.speculative.draft_model is None
                and config.speculative.draft_scheme != "w4a16"):
            raise ValueError(
                "AWQ/GPTQ/compressed-tensors (w4g/w8) checkpoints have no "
                "QuaRot rotations, so the shared-weights w4a4/w4a8 draft "
                "scheme is unavailable; use draft_scheme='w4a16' (with "
                "draft_kv_window), method='ngram'/'medusa'/'mlp_speculator', "
                "or a separate draft_model")
        k = config.speculative.num_speculative_tokens if config.speculative else 1
        draft_scheme = (config.speculative.draft_scheme if config.speculative
                        else "w4a4")
        if sep_draft and self.draft_cfg.quant != "w4":
            draft_scheme = "bf16"
        rounds = (config.speculative.rounds_per_step if config.speculative else 1)
        if mesh is not None:
            from qspec_tpu.parallel.tp import (make_tp_step_fns, replicate,
                                               shard_cache, shard_params)
            self.params = shard_params(params, self.cfg, mesh)
            self.cache = shard_cache(self.cache, mesh)
            if self.draft_cache is not None:
                # separate-draft and eagle run replicated (draft-TP=1):
                # their caches too
                self.draft_cache = (replicate(self.draft_cache, mesh)
                                    if sep_draft or self._eagle
                                    else shard_cache(self.draft_cache, mesh))
            if sep_draft:
                self.draft_params = replicate(draft_params, mesh)
            self.fns = make_tp_step_fns(
                mesh, self.cfg, self.params, self._verify_scheme, draft_scheme,
                k, num_rounds=rounds,
                draft_cfg=self.draft_cfg
                if (sep_draft or self._windowed_draft) else None,
                draft_params=self.draft_params,
                draft_ring_cap=self.ring_cap if self._ring_pages else None,
                decode_steps=config.scheduler.steps_per_decode_call,
                nmin=(config.speculative.ngram_prompt_lookup_min
                      if config.speculative else 1),
                nmax=(config.speculative.ngram_prompt_lookup_max
                      if config.speculative else 4))
        else:
            self.fns = {
                "prefill": functools.partial(prefill_step, cfg=self.cfg,
                                             scheme=self._verify_scheme),
                "prefill_hidden": functools.partial(
                    prefill_step, cfg=self.cfg, scheme=self._verify_scheme,
                    with_hidden=True),
                "prefill_draft": functools.partial(
                    prefill_step, cfg=self.draft_cfg, scheme=draft_scheme,
                    ring_cap=self.ring_cap if self._ring_pages else None),
                "decode": functools.partial(decode_step, cfg=self.cfg,
                                            scheme=self._verify_scheme),
                "decode_top": functools.partial(
                    decode_step, cfg=self.cfg, scheme=self._verify_scheme,
                    num_top=TOPN),
                "multi_decode": functools.partial(
                    multi_decode_step, cfg=self.cfg, scheme=self._verify_scheme,
                    num_steps=config.scheduler.steps_per_decode_call),
                "multi_decode_top": functools.partial(
                    multi_decode_step, cfg=self.cfg, scheme=self._verify_scheme,
                    num_steps=config.scheduler.steps_per_decode_call,
                    num_top=TOPN),
                "draft": functools.partial(draft_steps, cfg=self.draft_cfg,
                                           scheme=draft_scheme, k=k),
                "verify": functools.partial(verify_step, cfg=self.cfg,
                                            scheme=self._verify_scheme),
                "spec_rounds": functools.partial(
                    spec_rounds_step, cfg=self.cfg, draft_scheme=draft_scheme,
                    verify_scheme=self._verify_scheme, k=k, num_rounds=rounds,
                    draft_cfg=self.draft_cfg
                    if (sep_draft or self._windowed_draft) else None,
                    acceptance=(config.speculative.acceptance_method
                                if config.speculative else "rejection_sampler"),
                    force_accept=(config.speculative.force_accept_len
                                  if config.speculative else None)),
                "verify_onehot": functools.partial(
                    verify_step_onehot, cfg=self.cfg,
                    scheme=self._verify_scheme),
                "ngram_rounds": functools.partial(
                    ngram_rounds_step, cfg=self.cfg,
                    scheme=self._verify_scheme, k=k, num_rounds=rounds,
                    nmin=(config.speculative.ngram_prompt_lookup_min
                          if config.speculative else 1),
                    nmax=(config.speculative.ngram_prompt_lookup_max
                          if config.speculative else 4)),
                "medusa_rounds": functools.partial(
                    medusa_rounds_step, cfg=self.cfg,
                    scheme=self._verify_scheme, k=k, num_rounds=rounds),
                "prefill_whisper": None if not self._whisper else
                functools.partial(
                    _whisper_mod().prefill_whisper_step, cfg=self.cfg),
                "multi_decode_whisper": None if not self._whisper else
                functools.partial(
                    _whisper_mod().multi_decode_whisper_step, cfg=self.cfg,
                    num_steps=config.scheduler.steps_per_decode_call),
                "prefill_bart": None if not self._encdec else
                functools.partial(
                    _bart_mod().prefill_bart_step, cfg=self.cfg),
                "multi_decode_bart": None if not self._encdec else
                functools.partial(
                    _bart_mod().multi_decode_bart_step, cfg=self.cfg,
                    num_steps=config.scheduler.steps_per_decode_call),
                "prefill_eagle": functools.partial(
                    prefill_eagle_step, cfg=self.cfg, ecfg=self.draft_cfg,
                    scheme=self._verify_scheme),
                "eagle_rounds": functools.partial(
                    eagle_rounds_step, cfg=self.cfg, ecfg=self.draft_cfg,
                    scheme=self._verify_scheme, k=k, num_rounds=rounds),
            }
        # device-side token history for the fused ngram/null proposer rounds
        # (rows assigned per sequence; see run_ngram_rounds)
        self._hist = None
        self._hist_slot: dict = {}
        self._hist_synced: dict = {}
        if config.speculative is not None and \
                config.speculative.method in ("ngram", "null"):
            rows = max(config.scheduler.decode_batch_buckets)
            hmax = (config.scheduler.max_model_len
                    + (k + 1) * max(rounds, 1) + 8)
            self._hist = jnp.zeros((rows, hmax), jnp.int32)
        # device-resident EAGLE span bank (see eagle_rounds_step): one row
        # per sequence slot + a final scratch row for padding lanes, so a
        # padded batch never scatters garbage into a live row
        self._espan_h = None
        self._espan_slot: dict = {}
        self._espan_synced: dict = {}
        if self._eagle:
            rows = max(config.scheduler.decode_batch_buckets) + 1
            H = self.cfg.hidden_size
            self._espan_h = jnp.zeros((rows, k + 1, H), jnp.bfloat16)
            self._espan_t = jnp.zeros((rows, k + 1), jnp.int32)
            self._espan_pos = jnp.zeros((rows,), jnp.int32)
            self._espan_len = jnp.zeros((rows,), jnp.int32)
        # device-side proposal store for the fused Medusa / MLPSpeculator
        # rounds (row per sequence slot; -1 = no proposal yet)
        self._mprops = None
        self._mtree = None
        self._mprop_slot: dict = {}
        if config.speculative is not None and \
                config.speculative.method in ("medusa", "mlp_speculator",
                                              "medusa_null"):
            net_key = ("mlp_spec"
                       if config.speculative.method == "mlp_speculator"
                       else "medusa")
            if net_key not in params:
                raise ValueError(
                    f"speculative.method='{config.speculative.method}' but "
                    f"params carry no '{net_key}' net (load it with "
                    f"spec_decode.{config.speculative.method}."
                    f"load_{config.speculative.method})")
            n_heads = int(params[net_key]["head"].shape[0])
            if k > n_heads:
                raise ValueError(f"num_speculative_tokens={k} exceeds the "
                                 f"{n_heads} trained proposer heads")
            rows = max(config.scheduler.decode_batch_buckets)
            if (config.speculative.medusa_tree is not None
                    and config.speculative.method in ("medusa",
                                                      "medusa_null")):
                from qspec_tpu.spec_decode.medusa_tree import build_tree
                self._mtree = build_tree(config.speculative.medusa_tree)
                if self._mtree.max_depth > n_heads:
                    raise ValueError(
                        f"medusa_tree depth {self._mtree.max_depth} exceeds "
                        f"the {n_heads} trained proposer heads")
                self._mprops = jnp.full((rows, self._mtree.num_nodes), -1,
                                        jnp.int32)
                # per-row recent-token window (verify prefix): D+1 tokens,
                # rightmost = the token at the sequence's current position
                self._mrecent = jnp.zeros(
                    (rows, self._mtree.max_depth + 1), jnp.int32)
                self._mrecent_synced: dict = {}
                self.fns["medusa_tree_rounds"] = functools.partial(
                    medusa_tree_rounds_step, cfg=self.cfg,
                    scheme=self._verify_scheme, tspec=self._mtree,
                    num_rounds=rounds) if mesh is None else None
                if mesh is not None:
                    raise NotImplementedError(
                        "medusa_tree under a TP mesh is not wired yet; "
                        "use the single-chain medusa rounds")
            else:
                self._mprops = jnp.full((rows, n_heads), -1, jnp.int32)

    # -- helpers ----------------------------------------------------------
    def _lora_ids(self, seqs, bucket: int):
        """[bucket] adapter ids, or None when no adapters are in play."""
        if "lora" not in self.params:
            return None
        if all(getattr(s, "lora_id", 0) == 0 for s in seqs):
            return None
        ids = np.zeros(bucket, np.int32)
        for i, s in enumerate(seqs):
            ids[i] = getattr(s, "lora_id", 0)
        return jnp.asarray(ids)

    def _bucket_batch(self, b: int) -> int:
        for cand in self.config.scheduler.decode_batch_buckets:
            if b <= cand:
                return cand
        return self.config.scheduler.decode_batch_buckets[-1]

    def _bucket_tokens(self, t: int) -> int:
        for cand in self.config.scheduler.prefill_token_buckets:
            if t <= cand:
                return cand
        return self.config.scheduler.prefill_token_buckets[-1]

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _pad_block_tables(self, tables: list) -> np.ndarray:
        out = np.zeros((len(tables), self.max_pages_per_seq), np.int32)
        for i, t in enumerate(tables):
            n = min(len(t), self.max_pages_per_seq)
            out[i, :n] = t[:n]
        return out

    # -- phases -----------------------------------------------------------
    def run_prefill_chunks(self, chunks, *, draft: bool = False,
                           want_hidden: bool = False):
        """Batched prompt chunks: one (B, Q) rectangle for several sequences.

        chunks: list of (seq, start, end). Returns device logits [B, V] of
        each row's final valid position (only meaningful for rows whose chunk
        completes the prompt). With ``want_hidden`` also returns the pooled
        (last-token, post-norm) hidden states [B, H] for embedding rows.
        """
        # pad the batch dim to a bucket too: staggered admissions otherwise
        # produce B=1..n-1 rectangles, each a fresh XLA compile
        B = self._bucket_batch(len(chunks))
        Q = self._bucket_tokens(max(end - start for _, start, end in chunks))
        toks = np.zeros((B, Q), np.int32)
        positions = np.zeros((B, Q), np.int32)
        ctx = np.zeros(B, np.int32)
        tables = [[] for _ in range(B)]
        embeds = None
        erow = None
        for i, (seq, start, end) in enumerate(chunks):
            # token_ids (prompt + preserved outputs): a resumed preempted
            # sequence re-prefills its generated tokens too
            piece = seq.token_ids[start:end]
            toks[i, :len(piece)] = piece
            positions[i] = np.arange(start, start + Q, dtype=np.int32)
            ctx[i] = end
            tables[i] = seq.page_ids
            pe = getattr(seq, "prompt_embeds", None)
            if pe is not None:
                if embeds is None:
                    embeds = np.zeros((B, Q, pe.shape[-1]), np.float32)
                    erow = np.zeros((B, Q), bool)
                # a resumed sequence past its prompt re-prefills generated
                # tokens from the embed table (positions past prompt_len
                # stay unmasked)
                pe_piece = np.asarray(pe[start:min(end, len(pe))], np.float32)
                embeds[i, :len(pe_piece)] = pe_piece
                erow[i, :len(pe_piece)] = True
        if want_hidden and not draft:
            fn = self.fns["prefill_hidden"]
            if embeds is not None and self.mesh is not None:
                fn = self.fns["prefill_hidden_embeds"]
        else:
            fn = self.fns["prefill_draft"] if draft else self.fns["prefill"]
            if embeds is not None and self.mesh is not None:
                fn = self.fns["prefill_draft_embeds" if draft
                              else "prefill_embeds"]
        cache = self.draft_cache if draft else self.cache
        p = (self.draft_params if draft and self.draft_params is not None
             else self.params)
        extra = ()
        if embeds is not None:
            # mixed rectangles: embed-table rows keep their lookup; flagged
            # rows take the provided vectors (models/llama.model_forward)
            extra = (jnp.asarray(embeds, jnp.bfloat16), jnp.asarray(erow))
        if draft and self._ring_pages:
            tables_arr = self._ring_tables([c[0] for c in chunks], B)
        else:
            tables_arr = self._pad_block_tables(tables)
        kw = {}
        if self.cfg.mrope_section is not None:
            # Qwen2-VL 3-channel rope positions: prompt positions read the
            # per-sequence table; positions past it (resumed re-prefill of
            # generated tokens) advance all channels at pos + delta
            mr = np.zeros((B, 3, Q), np.int32)
            for i, (seq, start, end) in enumerate(chunks):
                d = getattr(seq, "mrope_delta", 0)
                mr[i] = positions[i][None] + d
                tbl = getattr(seq, "mrope_table", None)
                if tbl is not None and start < tbl.shape[1]:
                    n = min(tbl.shape[1], start + Q) - start
                    mr[i, :, :n] = tbl[:, start:start + n]
            kw["mrope"] = jnp.asarray(mr)
        out = fn(
            p, cache, jnp.asarray(toks), jnp.asarray(positions),
            jnp.asarray(tables_arr), jnp.asarray(ctx),
            None if draft and self.draft_params is not None
            else self._lora_ids([c[0] for c in chunks], B), *extra, **kw)
        hidden = None
        if want_hidden and not draft:
            logits, hidden, new_cache = out
        else:
            logits, new_cache = out
        if draft:
            self.draft_cache = new_cache
        else:
            self.cache = new_cache
        if want_hidden:
            return logits, hidden
        return logits

    def run_prefill_chunk(self, seq, start: int, end: int, *, draft: bool = False):
        """Single-sequence compatibility wrapper; returns logits [1, V] when
        the chunk completes the prompt, else None."""
        logits = self.run_prefill_chunks([(seq, start, end)], draft=draft)
        if end == seq.prompt_len:
            return logits
        return None

    def sample_first_token(self, logits, st_row: SamplingTensors) -> int:
        tok, _ = _sample_jit(logits, st_row, self._next_key())
        return int(jax.device_get(tok)[0])

    def gather_pages(self, page_ids, draft: bool = False):
        """[L, n, 2, Hkv, S, D] (+ scales) host copy of one seq's pages —
        the payload of a KV handoff (kv_transfer.py) or of swap-mode
        preemption (core/swap.py). ``draft`` reads the draft-model cache
        (same page ids, different contents/geometry)."""
        cache = self.draft_cache if draft else self.cache
        ids = jnp.asarray(np.asarray(page_ids, np.int32))
        pages = jax.device_get(_gather_pages_jit(cache.kv_pages, ids))
        scales = None
        if cache.kv_scales is not None:
            scales = jax.device_get(
                _gather_pages_jit(cache.kv_scales, ids))
        return np.asarray(pages), (np.asarray(scales)
                                   if scales is not None else None)

    def write_pages(self, page_ids, pages, scales=None, draft: bool = False):
        """Scatter transferred pages into this runner's cache."""
        cache = self.draft_cache if draft else self.cache
        ids = jnp.asarray(np.asarray(page_ids, np.int32))
        kv = _write_pages_jit(cache.kv_pages, ids,
                              jnp.asarray(pages, cache.kv_pages.dtype))
        new_scales = cache.kv_scales
        if scales is not None and new_scales is not None:
            new_scales = _write_pages_jit(new_scales, ids,
                                          jnp.asarray(scales,
                                                      new_scales.dtype))
        cache = cache._replace(kv_pages=kv, kv_scales=new_scales)
        if draft:
            self.draft_cache = cache
        else:
            self.cache = cache

    def sample_tokens(self, logits, st: SamplingTensors, want_top: bool = False):
        """Sample one token per row of [B, V] device logits (jitted — the
        eager path costs dozens of per-op compiles on this platform).
        Returns (tokens [B], logprobs [B][, top (vals [B, TOPN], ids)])."""
        toks, lps = _sample_jit(logits, st, self._next_key())
        if want_top:
            topv, topi = _top_jit(logits, n=TOPN)
            toks, lps, topv, topi = jax.device_get((toks, lps, topv, topi))
            return (np.asarray(toks), np.asarray(lps),
                    (np.asarray(topv), np.asarray(topi)))
        toks, lps = jax.device_get((toks, lps))
        return np.asarray(toks), np.asarray(lps)

    def run_decode(self, seqs, sampling: SamplingTensors,
                   num_steps: int = 1, want_top: bool = False,
                   chain: int = 1) -> np.ndarray:
        """Autoregressive decode. num_steps == 1 returns [1, B] next tokens;
        otherwise runs the fused multi-step executable -> [N, B] (-1 padded).
        Returns (tokens, logprobs, top) where top is None or
        (vals [N, B, TOPN], ids [N, B, TOPN])."""
        B = self._bucket_batch(len(seqs))
        last = np.zeros(B, np.int32)
        pos = np.zeros(B, np.int32)
        max_new = np.zeros(B, np.int32)
        tables = [[] for _ in range(B)]
        for i, s in enumerate(seqs):
            last[i] = s.last_token()
            pos[i] = s.num_tokens - 1
            max_new[i] = max(s.sampling_params.max_tokens - len(s.output_token_ids), 0)
            tables[i] = s.page_ids
        st = _pad_sampling(sampling, len(seqs), B)
        lora = self._lora_ids(seqs, B)
        n = len(seqs)
        kw = {}
        if self.cfg.mrope_section is not None:
            deltas = np.zeros(B, np.int32)
            for i, s in enumerate(seqs):
                deltas[i] = getattr(s, "mrope_delta", 0)
            kw["mrope_delta"] = jnp.asarray(deltas)
        if num_steps == 1:
            out = self.fns["decode_top" if want_top else "decode"](
                self.params, self.cache, jnp.asarray(last), jnp.asarray(pos),
                jnp.asarray(self._pad_block_tables(tables)), st, self._next_key(),
                lora, **kw)
            if want_top:
                next_tokens, lp, topv, topi, self.cache = out
                next_tokens, lp, topv, topi = jax.device_get(
                    (next_tokens, lp, topv, topi))
                top = (np.asarray(topv)[None, :n], np.asarray(topi)[None, :n])
            else:
                next_tokens, lp, self.cache = out
                next_tokens, lp = jax.device_get((next_tokens, lp))
                top = None
            toks = np.asarray(next_tokens)[None, :n]
            return toks, np.asarray(lp)[None, :n], top
        fname = "multi_decode_top" if want_top else "multi_decode"
        tables_d = jnp.asarray(self._pad_block_tables(tables))
        last_d, pos_d = jnp.asarray(last), jnp.asarray(pos)
        budget_d = jnp.asarray(max_new)
        parts = []
        for _ in range(max(1, chain)):
            out = self.fns[fname](
                self.params, self.cache, last_d, pos_d, tables_d, budget_d,
                st, self._next_key(), lora, **kw)
            if want_top:
                toks, lps, topv, topi, adv, self.cache = out
                parts.append((toks, lps, topv, topi))
            else:
                toks, lps, adv, self.cache = out
                parts.append((toks, lps))
            last_d, pos_d, budget_d = adv
        parts = jax.device_get(parts)
        toks = np.concatenate([np.asarray(p[0]) for p in parts], axis=0)
        lps = np.concatenate([np.asarray(p[1]) for p in parts], axis=0)
        top = None
        if want_top:
            top = (np.concatenate([np.asarray(p[2]) for p in parts], 0)[:, :n],
                   np.concatenate([np.asarray(p[3]) for p in parts], 0)[:, :n])
        return toks[:, :n], lps[:, :n], top

    def run_spec_rounds(self, seqs, sampling: SamplingTensors, k: int,
                        num_rounds: int = 1, chain: int = 1,
                        enable: bool = True):
        """`num_rounds` fused QSpec rounds per device call; ``chain`` calls
        dispatched back-to-back on device-resident advance state (see
        run_ngram_rounds — hides the host round-trip). ``enable=False`` runs
        the same executable with nulled proposals — the bit-exact AR oracle.

        Returns (tokens [chain*R, B, k+1] (-1 padded), accepted) numpy,
        cropped to the live batch.
        """
        B = self._bucket_batch(len(seqs))
        last = np.zeros(B, np.int32)
        prev = np.zeros(B, np.int32)
        pos = np.zeros(B, np.int32)
        max_new = np.zeros(B, np.int32)
        tables = [[] for _ in range(B)]
        for i, s in enumerate(seqs):
            last[i] = s.last_token()
            toks = s.token_ids
            # token at pos-1 for the draft's backfill pass (_draft_impl)
            prev[i] = toks[-2] if len(toks) >= 2 else last[i]
            pos[i] = s.num_tokens - 1
            max_new[i] = max(s.sampling_params.max_tokens - len(s.output_token_ids), 0)
            tables[i] = s.page_ids
        st = _pad_sampling(sampling, len(seqs), B)

        extra = (() if self.draft_params is None else (self.draft_params,))
        tables_d = jnp.asarray(self._pad_block_tables(tables))
        dtables_d = (jnp.asarray(self._ring_tables(seqs, B))
                     if self._ring_pages else tables_d)
        lora = self._lora_ids(seqs, B)
        last_d, pos_d = jnp.asarray(last), jnp.asarray(pos)
        prev_d = jnp.asarray(prev)
        budget_d = jnp.asarray(max_new)
        en_d = jnp.asarray(bool(enable))
        parts = []
        for _ in range(max(1, chain)):
            toks, accs, lps, adv, self.draft_cache, self.cache = \
                self.fns["spec_rounds"](
                    self.params, self.draft_cache, self.cache, last_d, prev_d,
                    pos_d,
                    tables_d, dtables_d, budget_d, en_d, st, self._next_key(),
                    lora, *extra)
            last_d, prev_d, pos_d, budget_d = adv
            parts.append((toks, accs, lps))
        parts = jax.device_get(parts)
        toks = np.concatenate([np.asarray(p[0]) for p in parts], axis=0)
        accs = np.concatenate([np.asarray(p[1]) for p in parts], axis=0)
        lps = np.concatenate([np.asarray(p[2]) for p in parts], axis=0)
        n = len(seqs)
        return toks[:, :n], accs[:, :n], lps[:, :n]

    # -- ring-buffer draft KV (windowed shared-weights draft) --------------
    @property
    def ring_cap(self) -> int:
        """Ring write floor: only the last ring_cap positions of a prefill
        rectangle may be written (older ones would alias ring pages within
        one scatter). Always >= window + k + page_size."""
        return (self._ring_pages - 1) * self.page_size

    def _ring_row_for(self, seq, live_ids) -> int:
        """Assign (or reuse) a draft-KV ring row for a sequence; evict rows
        of sequences not in the current batch when full (acceptance-only
        cost: the evictee's draft window rebuilds through backfill)."""
        sid = seq.seq_id
        if sid in self._ring_slot:
            return self._ring_slot[sid]
        used = set(self._ring_slot.values())
        # last row is the padded-lane scratch ring — never assigned
        row = next((r for r in range(self._ring_rows - 1) if r not in used),
                   None)
        if row is None:
            victim = next(s for s in self._ring_slot if s not in live_ids)
            row = self._ring_slot.pop(victim)
        self._ring_slot[sid] = row
        return row

    def ring_page_ids_for(self, seq):
        """The R physical draft-pool page ids of a sequence's ring row (for
        swap-mode preemption payloads), or None if it has no row yet."""
        row = self._ring_slot.get(seq.seq_id)
        if row is None:
            return None
        start = 1 + row * self._ring_pages
        return list(range(start, start + self._ring_pages))

    def _ring_tables(self, seqs, B: int) -> np.ndarray:
        """[B, max_pages_per_seq] draft block tables under the ring layout:
        entry lp -> 1 + row*R + lp % R. Padded lanes ride the scratch ring."""
        live = {s.seq_id for s in seqs}
        out = np.empty((B, self.max_pages_per_seq), np.int32)
        scratch = 1 + (self._ring_rows - 1) * self._ring_pages
        out[:] = scratch + self._ring_base
        for i, s in enumerate(seqs):
            out[i] = (1 + self._ring_row_for(s, live) * self._ring_pages
                      + self._ring_base)
        return out

    def free_ring_row(self, seq) -> None:
        self._ring_slot.pop(seq.seq_id, None)

    def _hist_row_for(self, seq, live_ids) -> int:
        """Assign (or reuse) a device-history row for a sequence; evict rows
        of sequences not in the current batch when full."""
        sid = seq.seq_id
        if sid in self._hist_slot:
            return self._hist_slot[sid]
        used = set(self._hist_slot.values())
        row = next((r for r in range(self._hist.shape[0]) if r not in used), None)
        if row is None:
            victim = next(s for s in self._hist_slot if s not in live_ids)
            row = self._hist_slot.pop(victim)
            self._hist_synced.pop(victim, None)
        self._hist_slot[sid] = row
        return row

    def run_ngram_rounds(self, seqs, sampling: SamplingTensors,
                         enable: bool = True, chain: int = 1):
        """Fused device-side prompt-lookup rounds (one host call for
        num_rounds * (k+1) potential tokens). ``enable=False`` runs the same
        executable with null proposals — the bit-exact AR oracle.

        ``chain`` > 1 dispatches that many executions back-to-back, feeding
        each call the previous one's DEVICE-resident advance state
        (last/pos/hist_len/budget) — no host read-back between them, so the
        tunnel round-trip leaves the critical path (the async-dispatch
        analogue of the reference's async output processing,
        vllm --async-output-proc). One device_get at the end.

        Returns (tokens [chain*R, B, k+1] (-1 padded), accepted, logprobs).
        """
        B = self._bucket_batch(len(seqs))
        live_ids = {s.seq_id for s in seqs}
        last = np.zeros(B, np.int32)
        pos = np.zeros(B, np.int32)
        max_new = np.zeros(B, np.int32)
        hist_rows = np.zeros(B, np.int32)
        hist_len = np.zeros(B, np.int32)
        tables = [[] for _ in range(B)]
        for i, s in enumerate(seqs):
            last[i] = s.last_token()
            pos[i] = s.num_tokens - 1
            max_new[i] = max(s.sampling_params.max_tokens - len(s.output_token_ids), 0)
            tables[i] = s.page_ids
            row = self._hist_row_for(s, live_ids)
            if self._hist_synced.get(s.seq_id) != s.num_tokens:
                toks = jnp.asarray(np.asarray(s.token_ids, np.int32))
                self._hist = self._hist.at[row, :len(s.token_ids)].set(toks)
                self._hist_synced[s.seq_id] = s.num_tokens
            hist_rows[i] = row
            hist_len[i] = s.num_tokens
        st = _pad_sampling(sampling, len(seqs), B)
        rows_d = jnp.asarray(hist_rows)
        tables_d = jnp.asarray(self._pad_block_tables(tables))
        en_d = jnp.asarray(bool(enable))
        last_d, pos_d = jnp.asarray(last), jnp.asarray(pos)
        hlen_d, budget_d = jnp.asarray(hist_len), jnp.asarray(max_new)
        parts = []
        for _ in range(max(1, chain)):
            toks, accs, lps, adv, self._hist, self.cache = \
                self.fns["ngram_rounds"](
                    self.params, self.cache, self._hist, rows_d, hlen_d,
                    last_d, pos_d, tables_d, budget_d, en_d, st,
                    self._next_key())
            last_d, pos_d, hlen_d, budget_d = adv
            parts.append((toks, accs, lps))
        parts = jax.device_get(parts)
        toks = np.concatenate([np.asarray(p[0]) for p in parts], axis=0)
        accs = np.concatenate([np.asarray(p[1]) for p in parts], axis=0)
        lps = np.concatenate([np.asarray(p[2]) for p in parts], axis=0)
        n = len(seqs)
        for i, s in enumerate(seqs):
            self._hist_synced[s.seq_id] = int(self._hist_synced[s.seq_id]
                                              + accs[:, i].sum())
        return toks[:, :n], accs[:, :n], lps[:, :n]

    def _mprop_row_for(self, seq, live_ids) -> int:
        """Assign (or reuse) a proposal-store row; fresh assignments reset
        the row to -1 (no proposal -> first round decodes one AR token and
        seeds the heads from its hidden)."""
        sid = seq.seq_id
        if sid in self._mprop_slot:
            return self._mprop_slot[sid]
        used = set(self._mprop_slot.values())
        row = next((r for r in range(self._mprops.shape[0]) if r not in used),
                   None)
        if row is None:
            victim = next(s for s in self._mprop_slot if s not in live_ids)
            row = self._mprop_slot.pop(victim)
            if self._mtree is not None:
                # the victim's recent-window sync is void with its row
                self._mrecent_synced.pop(victim, None)
        self._mprop_slot[sid] = row
        self._mprops = self._mprops.at[row].set(-1)
        return row

    def run_medusa_rounds(self, seqs, sampling: SamplingTensors,
                          enable: bool = True, chain: int = 1):
        """Fused Medusa-head speculation rounds (see medusa_rounds_step).
        Call shape mirrors run_ngram_rounds: ``enable=False`` is the
        bit-exact AR oracle, ``chain`` dispatches back-to-back executions on
        device-resident advance state."""
        B = self._bucket_batch(len(seqs))
        live_ids = {s.seq_id for s in seqs}
        last = np.zeros(B, np.int32)
        pos = np.zeros(B, np.int32)
        max_new = np.zeros(B, np.int32)
        # padded rows point past the store: their gathers clamp (results are
        # discarded anyway) and their scatters DROP — a 0 here would race the
        # live row-0 write inside medusa_rounds_step and could revert a live
        # sequence's fresh proposals to stale ones (XLA scatter with
        # duplicate indices picks an arbitrary winner)
        prop_rows = np.full(B, self._mprops.shape[0], np.int32)
        tables = [[] for _ in range(B)]
        for i, s in enumerate(seqs):
            last[i] = s.last_token()
            pos[i] = s.num_tokens - 1
            max_new[i] = max(s.sampling_params.max_tokens - len(s.output_token_ids), 0)
            tables[i] = s.page_ids
            prop_rows[i] = self._mprop_row_for(s, live_ids)
        st = _pad_sampling(sampling, len(seqs), B)
        rows_d = jnp.asarray(prop_rows)
        tables_d = jnp.asarray(self._pad_block_tables(tables))
        en_d = jnp.asarray(bool(enable))
        last_d, pos_d = jnp.asarray(last), jnp.asarray(pos)
        budget_d = jnp.asarray(max_new)
        if self._mtree is not None:
            # tree mode: sync each newly-assigned row's recent-token window
            # (the verify prefix) from host once; afterwards the executable
            # rolls it forward on device
            W = self._mrecent.shape[1]
            sync_rows, sync_vals = [], []
            for i, s in enumerate(seqs):
                r = prop_rows[i]
                if self._mrecent_synced.get(s.seq_id) != r:
                    tail = s.token_ids[-W:]
                    tail = [tail[0]] * (W - len(tail)) + list(tail)
                    sync_rows.append(r)
                    sync_vals.append(tail)
                    self._mrecent_synced[s.seq_id] = r
            if sync_rows:
                self._mrecent = self._mrecent.at[
                    jnp.asarray(np.asarray(sync_rows, np.int32))].set(
                    jnp.asarray(np.asarray(sync_vals, np.int32)))
            parts = []
            for _ in range(max(1, chain)):
                toks, accs, lps, adv, self._mprops, self._mrecent, \
                    self.cache = self.fns["medusa_tree_rounds"](
                        self.params, self.cache, self._mprops, self._mrecent,
                        rows_d, pos_d, tables_d, budget_d, en_d, st,
                        self._next_key())
                pos_d, budget_d = adv
                parts.append((toks, accs, lps))
            parts = jax.device_get(parts)
            toks = np.concatenate([np.asarray(p[0]) for p in parts], axis=0)
            accs = np.concatenate([np.asarray(p[1]) for p in parts], axis=0)
            lps = np.concatenate([np.asarray(p[2]) for p in parts], axis=0)
            n = len(seqs)
            return toks[:, :n], accs[:, :n], lps[:, :n]
        parts = []
        for _ in range(max(1, chain)):
            toks, accs, lps, adv, self._mprops, self.cache = \
                self.fns["medusa_rounds"](
                    self.params, self.cache, self._mprops, rows_d, last_d,
                    pos_d, tables_d, budget_d, en_d, st, self._next_key())
            last_d, pos_d, budget_d = adv
            parts.append((toks, accs, lps))
        parts = jax.device_get(parts)
        toks = np.concatenate([np.asarray(p[0]) for p in parts], axis=0)
        accs = np.concatenate([np.asarray(p[1]) for p in parts], axis=0)
        lps = np.concatenate([np.asarray(p[2]) for p in parts], axis=0)
        n = len(seqs)
        return toks[:, :n], accs[:, :n], lps[:, :n]

    def _cross_row_for(self, seq, live_ids) -> int:
        sid = seq.seq_id
        if sid in self._cross_slot:
            return self._cross_slot[sid]
        used = set(self._cross_slot.values())
        n_rows = self.cross_cache.kv_pages.shape[1] - 1
        row = next((r for r in range(1, n_rows + 1) if r not in used), None)
        if row is None:
            victim = next(s for s in self._cross_slot if s not in live_ids)
            row = self._cross_slot.pop(victim)
        self._cross_slot[sid] = row
        return row

    def run_embed_bert(self, chunks):
        """Encoder-only embedding rectangle (models/bert.py): one
        bidirectional pass, pooled per row. Returns [B, H] numpy."""
        from qspec_tpu.models.bert import embed_bert_step
        B = self._bucket_batch(len(chunks))
        Q = self._bucket_tokens(max(end - start for _, start, end in chunks))
        toks = np.zeros((B, Q), np.int32)
        valid = np.zeros((B, Q), bool)
        for i, (seq, start, end) in enumerate(chunks):
            piece = seq.token_ids[start:end]
            toks[i, :len(piece)] = piece
            valid[i, :len(piece)] = True
        pooled = embed_bert_step(self.params, jnp.asarray(toks),
                                 jnp.asarray(valid), cfg=self.cfg,
                                 pooling=self.cfg.bert_pooling)
        return np.asarray(jax.device_get(pooled), np.float32)

    def run_prefill_whisper(self, chunks):
        """Audio encode + cross-bank build + decoder prompt replay
        (models/whisper.prefill_whisper_step). The decoder stream IS the
        engine's token stream, so chunked/resumed prompts replay
        normally; the encoder re-runs per chunk (idempotent row writes).
        Mel rectangles are FIXED-shape (2 * max_source_positions frames,
        whisper's 30 s window) for one compile. Returns logits [B, V]."""
        B = self._bucket_batch(len(chunks))
        Qd = self._bucket_tokens(max(end - start for _, start, end in chunks))
        T_mel = 2 * self.cfg.whisper_max_source_positions
        n_mel = self.cfg.whisper_num_mel
        live_ids = {seq.seq_id for seq, _, _ in chunks}
        mel = np.zeros((B, T_mel, n_mel), np.float32)
        mel_valid = np.zeros((B, T_mel), bool)
        rows = np.zeros(B, np.int32)
        dec_toks = np.zeros((B, Qd), np.int32)
        dec_pos = np.zeros((B, Qd), np.int32)
        dec_ctx = np.zeros(B, np.int32)
        enc_len = np.zeros(B, np.int32)
        tables = [[] for _ in range(B)]
        from qspec_tpu.models.whisper import enc_out_len
        for i, (seq, start, end) in enumerate(chunks):
            af = getattr(seq, "audio_features", None)
            if af is None:
                raise ValueError("whisper request needs mm_audio features")
            af = np.asarray(af, np.float32)[:T_mel]
            mel[i, :af.shape[0]] = af
            mel_valid[i, :af.shape[0]] = True
            enc_len[i] = enc_out_len(af.shape[0])
            rows[i] = self._cross_row_for(seq, live_ids)
            piece = seq.token_ids[start:end]
            dec_toks[i, :len(piece)] = piece
            dec_pos[i] = np.arange(start, start + Qd, dtype=np.int32)
            dec_ctx[i] = end
            tables[i] = seq.page_ids
        logits, self.cache, cross_pages = self.fns["prefill_whisper"](
            self.params, self.cache, self.cross_cache.kv_pages,
            jnp.asarray(mel), jnp.asarray(mel_valid), jnp.asarray(rows),
            jnp.asarray(dec_toks), jnp.asarray(dec_pos),
            jnp.asarray(dec_ctx),
            jnp.asarray(self._pad_block_tables(tables)),
            jnp.asarray(rows[:, None]), jnp.asarray(enc_len))
        self.cross_cache = self.cross_cache._replace(kv_pages=cross_pages)
        return logits

    def run_decode_whisper(self, seqs, sampling: SamplingTensors,
                           num_steps: int = 1, chain: int = 1):
        """Fused whisper decoder steps over the row-bank cross cache;
        mirrors run_decode's (tokens, logprobs, top) contract."""
        B = self._bucket_batch(len(seqs))
        live_ids = {s.seq_id for s in seqs}
        last = np.zeros(B, np.int32)
        pos = np.zeros(B, np.int32)
        enc_len = np.zeros(B, np.int32)
        max_new = np.zeros(B, np.int32)
        rows = np.zeros(B, np.int32)
        tables = [[] for _ in range(B)]
        from qspec_tpu.models.whisper import enc_out_len
        for i, s in enumerate(seqs):
            last[i] = s.last_token()
            pos[i] = s.num_tokens - 1
            af = getattr(s, "audio_features", None)
            enc_len[i] = enc_out_len(
                min(np.asarray(af).shape[0],
                    2 * self.cfg.whisper_max_source_positions))
            rows[i] = self._cross_row_for(s, live_ids)
            max_new[i] = max(s.sampling_params.max_tokens
                             - len(s.output_token_ids), 0)
            tables[i] = s.page_ids
        st = _pad_sampling(sampling, len(seqs), B)
        tables_d = jnp.asarray(self._pad_block_tables(tables))
        ctab_d = jnp.asarray(rows[:, None])
        last_d, pos_d = jnp.asarray(last), jnp.asarray(pos)
        budget_d = jnp.asarray(max_new)
        enc_d = jnp.asarray(enc_len)
        parts = []
        for _ in range(max(1, chain)):
            toks, lps, adv, self.cache = self.fns["multi_decode_whisper"](
                self.params, self.cache, self.cross_cache.kv_pages,
                last_d, pos_d, tables_d, ctab_d, enc_d, budget_d, st,
                self._next_key())
            last_d, pos_d, budget_d = adv
            parts.append((toks, lps))
        parts = jax.device_get(parts)
        toks = np.concatenate([np.asarray(p[0]) for p in parts], axis=0)
        lps = np.concatenate([np.asarray(p[1]) for p in parts], axis=0)
        n = len(seqs)
        return toks[:, :n], lps[:, :n], None

    def run_prefill_encdec(self, chunks):
        """Encoder + cross-KV build + decoder replay (prefill_bart_step).
        The encoder needs the WHOLE prompt bidirectionally, so enc-dec
        prompts are single-chunk (enforced at add_request). Resumed
        (recompute-preempted) sequences replay their decoder stream in
        the same rectangle. Returns logits [B, V]."""
        B = self._bucket_batch(len(chunks))
        Q = self._bucket_tokens(max(end - start for _, start, end in chunks))
        dec_lens = [1 + len(s.output_token_ids) for s, _, _ in chunks]
        Qd = self._bucket_tokens(max(dec_lens))
        enc_toks = np.zeros((B, Q), np.int32)
        enc_pos = np.zeros((B, Q), np.int32)
        enc_len = np.zeros(B, np.int32)
        dec_toks = np.zeros((B, Qd), np.int32)
        dec_pos = np.zeros((B, Qd), np.int32)
        dec_ctx = np.zeros(B, np.int32)
        tables = [[] for _ in range(B)]
        start_id = self.cfg.decoder_start_token_id or 0
        for i, (seq, start, end) in enumerate(chunks):
            prompt = seq.prompt_token_ids
            enc_toks[i, :len(prompt)] = prompt
            enc_pos[i] = np.arange(Q, dtype=np.int32)
            enc_len[i] = len(prompt)
            stream = [start_id] + list(seq.output_token_ids)
            dec_toks[i, :len(stream)] = stream
            dec_pos[i] = np.arange(Qd, dtype=np.int32)
            dec_ctx[i] = len(stream)
            tables[i] = seq.page_ids
        valid = jnp.asarray(enc_pos) < jnp.asarray(enc_len)[:, None]
        logits, self.cache, cross_pages = self.fns["prefill_bart"](
            self.params, self.cache, self.cross_cache.kv_pages,
            jnp.asarray(enc_toks), valid, jnp.asarray(enc_pos),
            jnp.asarray(dec_toks), jnp.asarray(dec_pos),
            jnp.asarray(dec_ctx),
            jnp.asarray(self._pad_block_tables(tables)),
            jnp.asarray(enc_len))
        self.cross_cache = self.cross_cache._replace(kv_pages=cross_pages)
        return logits

    def run_decode_encdec(self, seqs, sampling: SamplingTensors,
                          num_steps: int = 1, chain: int = 1):
        """Fused decoder steps (multi_decode_bart_step); mirrors
        run_decode's (tokens, logprobs, top) contract (top unsupported)."""
        B = self._bucket_batch(len(seqs))
        last = np.zeros(B, np.int32)
        pos = np.zeros(B, np.int32)
        enc_len = np.zeros(B, np.int32)
        max_new = np.zeros(B, np.int32)
        tables = [[] for _ in range(B)]
        start_id = self.cfg.decoder_start_token_id or 0
        for i, s in enumerate(seqs):
            outs = s.output_token_ids
            last[i] = outs[-1] if outs else start_id
            pos[i] = len(outs)
            enc_len[i] = len(s.prompt_token_ids)
            max_new[i] = max(s.sampling_params.max_tokens - len(outs), 0)
            tables[i] = s.page_ids
        st = _pad_sampling(sampling, len(seqs), B)
        tables_d = jnp.asarray(self._pad_block_tables(tables))
        last_d, pos_d = jnp.asarray(last), jnp.asarray(pos)
        budget_d = jnp.asarray(max_new)
        enc_d = jnp.asarray(enc_len)
        parts = []
        for _ in range(max(1, chain)):
            toks, lps, adv, self.cache = self.fns["multi_decode_bart"](
                self.params, self.cache, self.cross_cache.kv_pages,
                last_d, pos_d, tables_d, enc_d, budget_d, st,
                self._next_key())
            last_d, pos_d, budget_d = adv
            parts.append((toks, lps))
        parts = jax.device_get(parts)
        toks = np.concatenate([np.asarray(p[0]) for p in parts], axis=0)
        lps = np.concatenate([np.asarray(p[1]) for p in parts], axis=0)
        n = len(seqs)
        return toks[:, :n], lps[:, :n], None

    def run_prefill_chunks_eagle(self, chunks):
        """Eagle prefill: target chunk + draft-KV construction fused
        (prefill_eagle_step). Returns (logits [B, V], h_last [B, H] numpy —
        the hidden at each row's final computed position, pairing with the
        NEXT token to seed the decode-round span)."""
        B = self._bucket_batch(len(chunks))
        Q = self._bucket_tokens(max(end - start for _, start, end in chunks))
        toks = np.zeros((B, Q), np.int32)
        shifted = np.zeros((B, Q), np.int32)
        feat_len = np.zeros(B, np.int32)
        positions = np.zeros((B, Q), np.int32)
        ctx = np.zeros(B, np.int32)
        tables = [[] for _ in range(B)]
        for i, (seq, start, end) in enumerate(chunks):
            piece = seq.token_ids[start:end]
            toks[i, :len(piece)] = piece
            # x_{p+1} for each chunk position p; the final computed
            # position's pairing token is unknown for a fresh prompt
            # (sampled after this call) and is covered by the decode
            # rounds' carried span — feat_len excludes it
            nxt = seq.token_ids[start + 1:min(end + 1, seq.num_tokens)]
            shifted[i, :len(nxt)] = nxt
            feat_len[i] = len(nxt)
            positions[i] = np.arange(start, start + Q, dtype=np.int32)
            ctx[i] = end
            tables[i] = seq.page_ids
        logits, h_last, self.cache, self.draft_cache = \
            self.fns["prefill_eagle"](
                self.params, self.cache, self.draft_cache, jnp.asarray(toks),
                jnp.asarray(shifted), jnp.asarray(feat_len),
                jnp.asarray(positions),
                jnp.asarray(self._pad_block_tables(tables)), jnp.asarray(ctx))
        return logits, np.asarray(jax.device_get(h_last))

    def _espan_row_for(self, seq, live_ids) -> int:
        """Assign (or reuse) a span-bank row; evict rows of sequences not
        in the current batch when full. The final row is the padding
        scratch and is never assigned."""
        sid = seq.seq_id
        if sid in self._espan_slot:
            return self._espan_slot[sid]
        used = set(self._espan_slot.values())
        n_rows = self._espan_h.shape[0] - 1
        row = next((r for r in range(n_rows) if r not in used), None)
        if row is None:
            victim = next(s for s in self._espan_slot if s not in live_ids)
            row = self._espan_slot.pop(victim)
            self._espan_synced.pop(victim, None)
        self._espan_slot[sid] = row
        # a fresh row holds someone else's (or zero) state: force the
        # seed upload even if the marker thinks this seq is in sync
        self._espan_synced.pop(sid, None)
        return row

    def run_eagle_rounds(self, seqs, sampling: SamplingTensors, k: int,
                         chain: int = 1):
        """Fused EAGLE rounds over the device-resident span bank.

        Only the emitted tokens come back to the host; the span state
        (true hiddens + paired tokens of the last accepted stretch) stays
        in per-sequence bank rows between engine steps — seq.eagle_span is
        just the SEED, uploaded when the sync marker says the row is stale
        (fresh prefill, preemption-recompute). Shipping the spans through
        the tunnel every step is what made EAGLE slower than AR in r03
        (exp44: 30 ms sync + [B, k+1, H] roundtrip vs a 712 us round)."""
        B = self._bucket_batch(len(seqs))
        live_ids = {s.seq_id for s in seqs}
        scratch = self._espan_h.shape[0] - 1
        rows = np.full(B, scratch, np.int32)
        max_new = np.zeros(B, np.int32)
        tables = [[] for _ in range(B)]
        H = self.cfg.hidden_size
        for i, s in enumerate(seqs):
            row = self._espan_row_for(s, live_ids)
            if self._espan_synced.get(s.seq_id) != s.num_tokens:
                h, t, p, n = s.eagle_span
                if int(p) + int(n) != s.num_tokens - 1:
                    # stale seed (the seq lost its bank row AFTER its host
                    # seed went stale — swap-in past an eviction): fall
                    # back to a position-CORRECT degenerate span (the
                    # pending last token sits at num_tokens - 1 =
                    # span_pos + span_len, the same convention as
                    # run_spec_rounds' pos). The zero hidden only hurts
                    # draft quality for a round; a wrong span_pos/last
                    # would corrupt verify outputs.
                    h = np.zeros((1, H), np.float32)
                    t = np.asarray([s.last_token()], np.int32)
                    p, n = s.num_tokens - 2, 1
                n = min(int(n), k + 1)
                hpad = np.zeros((k + 1, H), np.float32)
                hpad[:min(h.shape[0], k + 1)] = h[:k + 1]
                tpad = np.zeros(k + 1, np.int32)
                tpad[:min(len(t), k + 1)] = t[:k + 1]
                self._espan_h = self._espan_h.at[row].set(
                    jnp.asarray(hpad, jnp.bfloat16))
                self._espan_t = self._espan_t.at[row].set(jnp.asarray(tpad))
                self._espan_pos = self._espan_pos.at[row].set(int(p))
                self._espan_len = self._espan_len.at[row].set(n)
                self._espan_synced[s.seq_id] = s.num_tokens
            rows[i] = row
            max_new[i] = max(s.sampling_params.max_tokens
                             - len(s.output_token_ids), 0)
            tables[i] = s.page_ids
        st = _pad_sampling(sampling, len(seqs), B)
        tables_d = jnp.asarray(self._pad_block_tables(tables))
        rows_d = jnp.asarray(rows)
        budget_d = jnp.asarray(max_new)
        parts = []
        for _ in range(max(1, chain)):
            (toks, accs, lps, budget_d,
             (self._espan_h, self._espan_t, self._espan_pos,
              self._espan_len),
             self.draft_cache, self.cache) = \
                self.fns["eagle_rounds"](
                    self.params, self.draft_cache, self.cache,
                    self._espan_h, self._espan_t, self._espan_pos,
                    self._espan_len, rows_d, tables_d, budget_d, st,
                    self._next_key())
            parts.append((toks, accs, lps))
        parts = jax.device_get(parts)
        toks = np.concatenate([np.asarray(p[0]) for p in parts], axis=0)
        accs = np.concatenate([np.asarray(p[1]) for p in parts], axis=0)
        lps = np.concatenate([np.asarray(p[2]) for p in parts], axis=0)
        n = len(seqs)
        for i, s in enumerate(seqs):
            self._espan_synced[s.seq_id] = int(
                self._espan_synced[s.seq_id] + accs[:, i].sum())
        return toks[:, :n], accs[:, :n], lps[:, :n]

    def run_ngram_round(self, seqs, sampling: SamplingTensors,
                        draft_tokens: np.ndarray):
        """One n-gram verify round (no draft model, no draft cache).

        draft_tokens: [n_seqs, k]. Returns (tokens [1, B, k+1], accepted [1, B]).
        """
        B = self._bucket_batch(len(seqs))
        k = draft_tokens.shape[1]
        last = np.zeros(B, np.int32)
        pos = np.zeros(B, np.int32)
        d_toks = np.zeros((B, k), np.int32)
        tables = [[] for _ in range(B)]
        for i, s in enumerate(seqs):
            last[i] = s.last_token()
            pos[i] = s.num_tokens - 1
            d_toks[i] = draft_tokens[i]
            tables[i] = s.page_ids
        st = _pad_sampling(sampling, len(seqs), B)
        result, self.cache = self.fns["verify_onehot"](
            self.params, self.cache, jnp.asarray(last), jnp.asarray(d_toks),
            jnp.asarray(pos), jnp.asarray(self._pad_block_tables(tables)), st,
            self._next_key())
        res = jax.device_get(result)
        n = len(seqs)
        return (np.asarray(res.tokens)[None, :n],
                np.asarray(res.accepted_len)[None, :n],
                np.asarray(res.token_logprobs)[None, :n])


def _bart_mod():
    from qspec_tpu.models import bart
    return bart


def _whisper_mod():
    from qspec_tpu.models import whisper
    return whisper


_sample_jit = jax.jit(sample_with_logprob)


@jax.jit
def _gather_pages_jit(cache_array, ids):
    return jnp.take(cache_array, ids, axis=1)


@functools.partial(jax.jit, donate_argnames=("cache_array",))
def _write_pages_jit(cache_array, ids, pages):
    return cache_array.at[:, ids].set(pages)

# bucketed top-N width for logprob dicts: one extra executable pair instead
# of one per requested N, matching the reference's max_logprobs=20 default
# (OpenAI allows 5; beam search asks for 2*beam_width). Requests asking for
# fewer get a host-side slice.
TOPN = 20
_top_jit = jax.jit(top_logprobs, static_argnames=("n",))


def _pad_sampling(st: SamplingTensors, n: int, bucket: int) -> SamplingTensors:
    def pad(x, fill):
        arr = np.asarray(x, np.float32 if x.dtype != np.int32 else np.int32)
        out = np.full(bucket, fill, arr.dtype)
        out[:n] = arr[:n]
        return jnp.asarray(out)
    mask = st.vocab_mask
    if mask is not None:
        m = np.ones((bucket, mask.shape[1]), bool)
        m[:n] = np.asarray(mask)[:n]
        mask = jnp.asarray(m)
    bias = st.logit_bias
    if bias is not None:
        bb = np.zeros((bucket, bias.shape[1]), np.float32)
        bb[:n] = np.asarray(bias)[:n]
        bias = jnp.asarray(bb)
    gnext, gidx, gstate = st.grammar_next, None, None
    if gnext is not None:
        gi = np.full(bucket, -1, np.int32)
        gi[:n] = np.asarray(st.grammar_idx)[:n]
        gs = np.zeros(bucket, np.int32)
        gs[:n] = np.asarray(st.grammar_state)[:n]
        gnext, gidx, gstate = jnp.asarray(gnext), jnp.asarray(gi), jnp.asarray(gs)
    return SamplingTensors(
        temperature=pad(np.asarray(st.temperature), 0.0),
        top_k=pad(np.asarray(st.top_k, np.int32), 0),
        top_p=pad(np.asarray(st.top_p), 1.0),
        min_p=pad(np.asarray(st.min_p), 0.0),
        vocab_mask=mask,
        logit_bias=bias,
        grammar_next=gnext,
        grammar_idx=gidx,
        grammar_state=gstate,
    )


def make_sampling_tensors(seqs, vocab_size: Optional[int] = None,
                          eos_token_id: Optional[int] = None) -> SamplingTensors:
    """Batch the per-sequence knobs; builds a [B, V] vocab mask only when a
    row carries guided-decoding constraints (allowed/banned token sets,
    min-tokens EOS suppression)."""
    mask = None
    if vocab_size is not None:
        need = any(s.sampling_params.allowed_token_ids
                   or s.sampling_params.banned_token_ids
                   or (s.sampling_params.min_tokens
                       and len(s.output_token_ids) < s.sampling_params.min_tokens)
                   for s in seqs)
        if need:
            m = np.ones((len(seqs), vocab_size), bool)
            for i, s in enumerate(seqs):
                sp = s.sampling_params
                if sp.allowed_token_ids:
                    m[i] = False
                    m[i, np.asarray(sp.allowed_token_ids)] = True
                if sp.banned_token_ids:
                    m[i, np.asarray(sp.banned_token_ids)] = False
                if (sp.min_tokens and eos_token_id is not None
                        and len(s.output_token_ids) < sp.min_tokens):
                    m[i, eos_token_id] = False
                    for t in (sp.stop_token_ids or ()):
                        m[i, t] = False
            mask = m
    bias = None
    if vocab_size is not None and any(
            s.sampling_params.presence_penalty or s.sampling_params.frequency_penalty
            or s.sampling_params.logit_bias for s in seqs):
        bias = np.zeros((len(seqs), vocab_size), np.float32)
        for i, s in enumerate(seqs):
            sp = s.sampling_params
            if sp.presence_penalty or sp.frequency_penalty:
                counts = np.bincount(np.asarray(s.output_token_ids, np.int64),
                                     minlength=vocab_size) if s.output_token_ids \
                    else np.zeros(vocab_size, np.int64)
                bias[i] = -(sp.presence_penalty * (counts > 0)
                            + sp.frequency_penalty * counts)
            if sp.logit_bias:
                for tok, b in sp.logit_bias.items():
                    t = int(tok)
                    if 0 <= t < vocab_size:
                        bias[i, t] += float(b)
    gnext = gidx = gstate = None
    if any(getattr(s, "grammar_fsm", None) is not None for s in seqs):
        # stack the distinct grammars (dedup by object identity), pad state
        # axes to the largest automaton; -1 rows stay "banned everywhere"
        fsms, which = [], []
        for s in seqs:
            f = s.grammar_fsm
            if f is None:
                which.append(-1)
                continue
            if all(f is not g for g in fsms):
                fsms.append(f)
            which.append(next(i for i, g in enumerate(fsms) if g is f))
        smax = max(f.num_states for f in fsms)
        V = fsms[0].next_state.shape[1]
        gnext = np.full((len(fsms), smax, V), -1, np.int32)
        for i, f in enumerate(fsms):
            gnext[i, :f.num_states] = f.next_state
        gidx = np.asarray(which, np.int32)
        gstate = np.asarray([getattr(s, "grammar_state", 0) for s in seqs],
                            np.int32)
    return SamplingTensors(
        temperature=np.array([s.sampling_params.temperature for s in seqs], np.float32),
        top_k=np.array([s.sampling_params.top_k for s in seqs], np.int32),
        top_p=np.array([s.sampling_params.top_p for s in seqs], np.float32),
        min_p=np.array([s.sampling_params.min_p for s in seqs], np.float32),
        vocab_mask=mask,
        logit_bias=bias,
        grammar_next=gnext,
        grammar_idx=gidx,
        grammar_state=gstate,
    )
