"""Guided decoding via vocab-mask logits processors (reference:
vllm/model_executor/guided_decoding — here: allowed/banned token sets and
min-tokens EOS suppression, enforced on device in every phase)."""

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
    return mc, init_params(mc, seed=0)


def make_engine(setup, spec=None, eos=None):
    mc, params = setup
    cfg = EngineConfig(
        model=mc, cache=CacheConfig(page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=128,
                                  prefill_chunk_size=32,
                                  decode_batch_buckets=(2,),
                                  prefill_token_buckets=(32,)),
        speculative=spec)
    return LLMEngine(cfg, params, eos_token_id=eos)


def drain(eng):
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.output_token_ids
    return outs


def test_allowed_token_ids(setup):
    eng = make_engine(setup)
    allowed = [11, 22, 33]
    rid = eng.add_request([5, 6, 7], SamplingParams(
        temperature=0.0, max_tokens=10, ignore_eos=True,
        allowed_token_ids=allowed))
    outs = drain(eng)
    assert all(t in allowed for t in outs[rid])


def test_banned_token_ids(setup):
    eng0 = make_engine(setup)
    rid = eng0.add_request([5, 6, 7], SamplingParams(temperature=0.0,
                                                     max_tokens=10,
                                                     ignore_eos=True))
    base = drain(eng0)[rid]
    banned = list(set(base))
    eng = make_engine(setup)
    rid = eng.add_request([5, 6, 7], SamplingParams(
        temperature=0.0, max_tokens=10, ignore_eos=True,
        banned_token_ids=banned))
    outs = drain(eng)
    assert all(t not in banned for t in outs[rid])


def test_allowed_with_spec_decode(setup):
    eng = make_engine(setup, spec=SpeculativeConfig(num_speculative_tokens=2))
    allowed = [3, 4, 5]
    rid = eng.add_request([9, 10, 11], SamplingParams(
        temperature=0.0, max_tokens=8, ignore_eos=True,
        allowed_token_ids=allowed))
    outs = drain(eng)
    assert all(t in allowed for t in outs[rid])


def test_min_tokens_suppresses_eos(setup):
    # find the token greedy generation emits first, make it the eos
    eng0 = make_engine(setup)
    rid = eng0.add_request([8, 9], SamplingParams(temperature=0.0, max_tokens=6,
                                                  ignore_eos=True))
    first = drain(eng0)[rid][0]

    # without min_tokens: stops immediately on "eos"
    eng1 = make_engine(setup, eos=first)
    rid = eng1.add_request([8, 9], SamplingParams(temperature=0.0, max_tokens=10))
    out1 = drain(eng1)[rid]
    assert out1[-1] == first and len(out1) <= 2

    # with min_tokens: eos masked until the floor is reached
    eng2 = make_engine(setup, eos=first)
    rid = eng2.add_request([8, 9], SamplingParams(temperature=0.0, max_tokens=10,
                                                  min_tokens=5))
    out2 = drain(eng2)[rid]
    assert len(out2) >= 5
    assert first not in out2[:4]


def test_presence_penalty_reduces_repetition(setup):
    # the tiny greedy model loops heavily; a strong presence penalty must
    # produce strictly more distinct tokens
    eng0 = make_engine(setup)
    r0 = eng0.add_request([4, 5, 6], SamplingParams(temperature=0.0,
                                                    max_tokens=16,
                                                    ignore_eos=True))
    base = drain(eng0)[r0]

    eng1 = make_engine(setup)
    r1 = eng1.add_request([4, 5, 6], SamplingParams(temperature=0.0,
                                                    max_tokens=16,
                                                    ignore_eos=True,
                                                    presence_penalty=50.0))
    pen = drain(eng1)[r1]
    assert len(set(pen)) > len(set(base))


# ---------------------------------------------------------------- grammar

def _toy_vocab(vsize=512):
    """id 0 = eos; 1..9 digits '1'..'9'; 10 ','; 11 '['; 12 ']'; 13 '0';
    14 'a'; 15 '"'; rest unmappable (always banned under a grammar)."""
    vocab = [None] * vsize
    for i in range(1, 10):
        vocab[i] = str(i).encode()
    vocab[10], vocab[11], vocab[12] = b",", b"[", b"]"
    vocab[13], vocab[14], vocab[15] = b"0", b"a", b'"'
    return vocab


def _grammar_engine(setup, spec=None):
    mc, params = setup
    cfg = EngineConfig(
        model=mc, cache=CacheConfig(page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=128,
                                  prefill_chunk_size=32,
                                  decode_batch_buckets=(2,),
                                  prefill_token_buckets=(32,)),
        speculative=spec)
    return LLMEngine(cfg, params, eos_token_id=0, grammar_vocab=_toy_vocab())


def _walk(fsm, toks):
    s = 0
    for t in toks:
        s = int(fsm.next_state[s, t])
        if s < 0:
            return s
    return s


def test_guided_regex_prefix_valid(setup):
    eng = _grammar_engine(setup)
    rid = eng.add_request([5, 6, 7], SamplingParams(
        temperature=0.0, max_tokens=12, guided_regex=r"\[\d(,\d)*\]"))
    outs = drain(eng)
    toks = outs[rid]
    seq_fsm = eng._get_grammar_compiler().from_regex(r"\[\d(,\d)*\]")
    body = toks[:-1] if toks and toks[-1] == 0 else toks
    assert body, "no tokens generated"
    assert _walk(seq_fsm, body) >= 0, f"grammar violated: {toks}"
    assert body[0] == 11  # must open with '['


def test_guided_two_grammars_one_batch(setup):
    eng = _grammar_engine(setup)
    r1 = eng.add_request([5, 6, 7], SamplingParams(
        temperature=0.0, max_tokens=10, guided_regex=r"\[\d(,\d)*\]"))
    r2 = eng.add_request([8, 9, 10], SamplingParams(
        temperature=0.0, max_tokens=10, guided_regex=r"a+"))
    outs = drain(eng)
    gc = eng._get_grammar_compiler()
    b1 = [t for t in outs[r1] if t != 0]
    b2 = [t for t in outs[r2] if t != 0]
    assert _walk(gc.from_regex(r"\[\d(,\d)*\]"), b1) >= 0
    assert all(t == 14 for t in b2), b2  # only 'a' tokens


@pytest.mark.parametrize("method", ["draft", "ngram"])
def test_guided_spec_matches_ar(setup, method):
    """Greedy guided generation must be identical with and without
    speculation (spec-mode per-position re-masking)."""
    pat = r"\[\d(,\d)*\]"
    eng0 = _grammar_engine(setup)
    rid0 = eng0.add_request([5, 6, 7], SamplingParams(
        temperature=0.0, max_tokens=12, guided_regex=pat))
    base = drain(eng0)[rid0]

    spec = (SpeculativeConfig(num_speculative_tokens=2) if method == "draft"
            else SpeculativeConfig(num_speculative_tokens=2, method="ngram"))
    eng1 = _grammar_engine(setup, spec=spec)
    rid1 = eng1.add_request([5, 6, 7], SamplingParams(
        temperature=0.0, max_tokens=12, guided_regex=pat))
    got = drain(eng1)[rid1]
    assert got == base, (got, base)


def test_guided_json_schema(setup):
    eng = _grammar_engine(setup)
    schema = {"type": "array", "items": {"type": "integer"}, "minItems": 1,
              "maxItems": 4}
    rid = eng.add_request([5, 6], SamplingParams(
        temperature=0.0, max_tokens=14, guided_json=schema))
    outs = drain(eng)
    toks = [t for t in outs[rid] if t != 0]
    gc = eng._get_grammar_compiler()
    assert _walk(gc.from_json_schema(schema), toks) >= 0, toks
