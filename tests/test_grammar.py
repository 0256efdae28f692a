"""Regex -> byte DFA -> token FSM compiler units (qspec_tpu/guided/)."""

import json

import numpy as np
import pytest

from qspec_tpu.guided import (GrammarCompiler, compile_regex, schema_to_regex)


@pytest.mark.parametrize("pat,yes,no", [
    (r"abc", ["abc"], ["ab", "abcd", ""]),
    (r"a*b+", ["b", "ab", "aaabbb"], ["a", "", "ba"]),
    (r"(foo|bar)+", ["foo", "barfoo"], ["fo", "foobaz"]),
    (r"[a-c]{2,3}", ["ab", "abc", "ccc"], ["a", "abcd", "ad"]),
    (r"-?\d+(\.\d+)?", ["3", "-42", "3.14"], ["3.", ".5", "-"]),
    (r'"[^"\n]*"', ['""', '"hi there"'], ['"', '"a', 'a"']),
    (r"a.c", ["abc", "axc"], ["ac", "a\nc"]),
    (r"(ab){1,2}c", ["abc", "ababc"], ["c", "abababc"]),
    (r"\w+@\w+\.(com|org)", ["a_1@b.com", "x@y.org"], ["a@b.net", "@b.com"]),
    (r"(a|b){2,}", ["ab", "aab", "bbbb"], ["a", ""]),
    (r"héllo", ["héllo"], ["hello"]),  # multi-byte UTF-8 literal
    (r"[\x41-\x43]+", ["ABC", "A"], ["D", ""]),  # hex escapes
])
def test_regex_dfa(pat, yes, no):
    d = compile_regex(pat)
    for s in yes:
        assert d.matches(s), (pat, s)
    for s in no:
        assert not d.matches(s), (pat, s)


@pytest.mark.parametrize("schema,yes,no", [
    ({"enum": ["red", "green", 3]}, ['"red"', "3"], ['"blue"']),
    ({"type": "array", "items": {"type": "integer"},
      "minItems": 2, "maxItems": 3},
     ["[1,2]", "[1,2,3]"], ["[1]", "[1,2,3,4]", "[]"]),
    ({"anyOf": [{"type": "integer"}, {"type": "null"}]},
     ["7", "null"], ['"7"']),
    ({"type": "string", "format": "uuid"},
     ['"123e4567-e89b-12d3-a456-426614174000"'], ['"123"']),
    ({"type": "string", "minLength": 2, "maxLength": 4},
     ['"ab"', '"abcd"'], ['"a"', '"abcde"']),
    ({"type": "boolean"}, ["true", "false"], ["maybe"]),
    ({"type": "number"}, ["0", "-1.5", "2e10"], ["01", "--3"]),
])
def test_schema_regex(schema, yes, no):
    d = compile_regex(schema_to_regex(schema))
    for s in yes:
        assert d.matches(s), (schema, s)
    for s in no:
        assert not d.matches(s), (schema, s)


def test_schema_object_required_and_optional():
    sch = {"type": "object",
           "properties": {"name": {"type": "string"},
                          "age": {"type": "integer"},
                          "nick": {"type": "string"}},
           "required": ["name", "age"]}
    d = compile_regex(schema_to_regex(sch))
    ok = {"name": "Ada", "age": 36}
    assert d.matches(json.dumps(ok, separators=(",", ":")))
    ok2 = {"name": "Ada", "age": 36, "nick": "al"}
    assert d.matches(json.dumps(ok2, separators=(",", ":")))
    assert not d.matches('{"name":"Ada"}')
    assert not d.matches('{"age":36,"name":"Ada"}')  # canonical order only


def test_token_fsm_walk_and_eos():
    vocab = [None, b"a", b"b", b"ab", b"1", b"2", b",", b"[", b"]", b'"',
             b"12"]
    gc = GrammarCompiler(vocab, eos_token_id=0)
    fsm = gc.from_regex(r"\[(\d+)(,\d+)*\]")
    s = 0
    for tok in [7, 10, 6, 4, 8]:  # [ 12 , 1 ]
        assert fsm.next_state[s, tok] >= 0, (s, tok)
        s = fsm.next_state[s, tok]
    assert fsm.next_state[s, 0] == s       # EOS allowed at accept
    assert fsm.next_state[0, 0] == -1      # EOS banned at start
    assert fsm.next_state[0, 1] == -1      # 'a' banned
    assert np.all(fsm.next_state[:, 3] == -1)  # 'ab' never legal


def test_multi_byte_tokens_cross_dfa_edges():
    # token "ab" must be accepted by a grammar whose DFA crosses a->b
    vocab = [None, b"a", b"b", b"ab"]
    gc = GrammarCompiler(vocab, eos_token_id=0)
    fsm = gc.from_regex(r"ab")
    s = fsm.next_state[0, 3]
    assert s >= 0 and fsm.next_state[s, 0] == s
