"""OpenAI tool-calling tests (reference: tests/tool_use/ +
entrypoints/openai/tool_parsers): parser unit tests plus HTTP flows over
the aiohttp test client with a tokenizer rigged to emit tool-call text."""

import asyncio
import json

import pytest

aiohttp = pytest.importorskip("aiohttp")
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402

from qspec_tpu.entrypoints.openai.tool_parser import (  # noqa: E402
    forced_call_schema, parse_tool_calls, tools_system_message)

TOOLS = [
    {"type": "function",
     "function": {"name": "get_weather",
                  "description": "Get the weather for a city",
                  "parameters": {"type": "object",
                                 "properties": {"city": {"type": "string"}},
                                 "required": ["city"]}}},
    {"type": "function",
     "function": {"name": "add",
                  "parameters": {"type": "object",
                                 "properties": {"a": {"type": "integer"},
                                                "b": {"type": "integer"}},
                                 "required": ["a", "b"]}}},
]


# -- parser units ----------------------------------------------------------

def test_parse_hermes_block():
    text = ('Let me check.<tool_call>{"name": "get_weather", '
            '"arguments": {"city": "SF"}}</tool_call>')
    content, calls = parse_tool_calls(text)
    assert content == "Let me check."
    assert len(calls) == 1
    assert calls[0]["type"] == "function"
    assert calls[0]["function"]["name"] == "get_weather"
    assert json.loads(calls[0]["function"]["arguments"]) == {"city": "SF"}
    assert calls[0]["id"].startswith("call_")


def test_parse_multiple_blocks():
    text = ('<tool_call>{"name": "add", "arguments": {"a": 1, "b": 2}}'
            '</tool_call><tool_call>{"name": "add", '
            '"arguments": {"a": 3, "b": 4}}</tool_call>')
    content, calls = parse_tool_calls(text)
    assert content is None
    assert [json.loads(c["function"]["arguments"]) for c in calls] == \
        [{"a": 1, "b": 2}, {"a": 3, "b": 4}]


def test_parse_bare_json_object():
    text = '{"name": "get_weather", "arguments": {"city": "Paris"}}'
    content, calls = parse_tool_calls(text)
    assert content is None
    assert calls[0]["function"]["name"] == "get_weather"


def test_parse_llama_parameters_key():
    text = '{"name": "add", "parameters": {"a": 5, "b": 7}}'
    _, calls = parse_tool_calls(text)
    assert json.loads(calls[0]["function"]["arguments"]) == {"a": 5, "b": 7}


def test_parse_mistral_marker():
    text = ('[TOOL_CALLS] [{"name": "add", "arguments": {"a": 1, "b": 2}}]')
    content, calls = parse_tool_calls(text)
    assert content is None
    assert calls[0]["function"]["name"] == "add"


def test_plain_text_is_content():
    content, calls = parse_tool_calls("The answer is {42} not a call.")
    assert calls == []
    assert "answer" in content


def test_unterminated_block_still_parses():
    text = '<tool_call>{"name": "add", "arguments": {"a": 1, "b": 2}}'
    _, calls = parse_tool_calls(text)
    assert len(calls) == 1


def test_forced_schema_named():
    s = forced_call_schema(TOOLS, "get_weather")
    assert s["properties"]["name"]["const"] == "get_weather"
    assert s["properties"]["arguments"]["properties"]["city"]["type"] == \
        "string"


def test_forced_schema_required_any():
    s = forced_call_schema(TOOLS)
    assert len(s["anyOf"]) == 2


def test_forced_schema_unknown_tool():
    with pytest.raises(ValueError, match="unknown tool"):
        forced_call_schema(TOOLS, "nope")


def test_forced_schema_compiles_to_fsm():
    """The forced-call schema must flow through the grammar compiler
    (guided/json_schema.py) — the property the reference can't offer its
    tool parsers (vllm hopes the model emits JSON; we constrain it)."""
    from qspec_tpu.guided.json_schema import schema_to_regex
    from qspec_tpu.guided.regex_dfa import compile_regex
    rx = schema_to_regex(forced_call_schema(TOOLS, "add"))
    dfa = compile_regex(rx)
    assert dfa.matches('{"name":"add","arguments":{"a":3,"b":4}}')
    assert not dfa.matches('{"name":"sub","arguments":{"a":3,"b":4}}')


def test_system_message_lists_tools():
    m = tools_system_message(TOOLS)
    assert m["role"] == "system"
    assert "get_weather" in m["content"] and "<tool_call>" in m["content"]


# -- HTTP flows ------------------------------------------------------------

class ToolTokenizer:
    """Tokenizer rigged so every decode yields a hermes tool-call block."""
    eos_token_id = 0

    def encode(self, s):
        return [ord(c) % 250 + 1 for c in s][:32]

    def decode(self, ids):
        return ('<tool_call>{"name": "get_weather", '
                '"arguments": {"city": "SF"}}</tool_call>')

    def apply_chat_template(self, messages, tokenize=True,
                            add_generation_prompt=True):
        text = " ".join(m["content"] for m in messages)
        return self.encode(text)


class PlainTokenizer(ToolTokenizer):
    def decode(self, ids):
        return "just words"


def make_server(tokenizer):
    from qspec_tpu.engine.arg_utils import EngineArgs
    from qspec_tpu.entrypoints.openai.api_server import build_server
    from qspec_tpu.config import ModelConfig
    from qspec_tpu.models.llama import init_params

    cfg = ModelConfig.tiny(quant="w4")
    params = init_params(cfg, seed=0)
    args = EngineArgs(model="tiny", max_model_len=256, max_num_seqs=4)
    return build_server(args, model_name="tiny-test", params=params,
                        tokenizer=tokenizer)


def _run(server, coro_fn):
    async def runner():
        client = TestClient(TestServer(server.app()))
        await client.start_server()
        try:
            await coro_fn(client)
        finally:
            await client.close()

    asyncio.run(runner())


def test_chat_tools_auto_parses_calls():
    async def body(client):
        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "weather in SF?"}],
            "tools": TOOLS, "max_tokens": 8})
        assert r.status == 200
        d = await r.json()
        ch = d["choices"][0]
        assert ch["finish_reason"] == "tool_calls"
        calls = ch["message"]["tool_calls"]
        assert calls[0]["function"]["name"] == "get_weather"
        assert json.loads(calls[0]["function"]["arguments"]) == {"city": "SF"}
        assert ch["message"]["content"] is None

    _run(make_server(ToolTokenizer()), body)


def test_chat_tool_choice_none_is_plain():
    async def body(client):
        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "hi"}],
            "tools": TOOLS, "tool_choice": "none", "max_tokens": 8})
        assert r.status == 200
        d = await r.json()
        msg = d["choices"][0]["message"]
        assert "tool_calls" not in msg
        assert isinstance(msg["content"], str)

    _run(make_server(ToolTokenizer()), body)


def test_chat_tools_no_calls_in_output():
    async def body(client):
        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "hi"}],
            "tools": TOOLS, "max_tokens": 8})
        assert r.status == 200
        d = await r.json()
        ch = d["choices"][0]
        assert "tool_calls" not in ch["message"]
        assert ch["message"]["content"] == "just words"
        assert ch["finish_reason"] != "tool_calls"

    _run(make_server(PlainTokenizer()), body)


def test_chat_tools_undeclared_name_stays_content():
    """A JSON object whose "name" is not a declared tool must stay content
    (ADVICE: {"name": "Alice", "age": 30} is not a call)."""
    content, calls = parse_tool_calls('{"name": "Alice", "age": 30}',
                                      ["get_weather", "add"])
    assert calls == []
    assert "Alice" in content


def test_block_without_name_keeps_content():
    """Valid JSON in a <tool_call> block lacking "name" is model output,
    not a silently-dropped call (ADVICE)."""
    content, calls = parse_tool_calls(
        '<tool_call>{"city": "SF"}</tool_call>', ["get_weather"])
    assert calls == []
    assert '"city"' in content


def test_unknown_tool_choice_is_400():
    async def body(client):
        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "hi"}],
            "tools": TOOLS, "max_tokens": 4,
            "tool_choice": {"type": "function",
                            "function": {"name": "nope"}}})
        assert r.status == 400

    _run(make_server(ToolTokenizer()), body)


# -- streaming tool-call parser (reference hermes_tool_parser streaming) ----

from qspec_tpu.entrypoints.openai.tool_parser import (  # noqa: E402
    StreamingToolParser)

NAMES = ["get_weather", "add"]


def feed(parser, chunks):
    deltas = []
    for c in chunks:
        deltas += parser.push(c)
    deltas += parser.finish()
    return deltas


def _texts(deltas):
    return "".join(d.get("content", "") for d in deltas if "content" in d)


def _calls(deltas):
    return [d["tool_calls"][0] for d in deltas if "tool_calls" in d]


def test_stream_parser_block_split_at_awkward_points():
    text = ('Let me check.<tool_call>{"name": "get_weather", '
            '"arguments": {"city": "SF"}}</tool_call>done')
    # split every 3 chars — markers and JSON straddle chunk boundaries
    chunks = [text[i:i + 3] for i in range(0, len(text), 3)]
    deltas = feed(StreamingToolParser(NAMES), chunks)
    calls = _calls(deltas)
    assert len(calls) == 1
    assert calls[0]["function"]["name"] == "get_weather"
    assert json.loads(calls[0]["function"]["arguments"]) == {"city": "SF"}
    assert _texts(deltas) == "Let me check.done"


def test_stream_parser_holds_back_marker_prefix():
    p = StreamingToolParser(NAMES)
    deltas = p.push("thinking <tool_")
    # "<tool_" may complete into the marker: must NOT be streamed yet
    assert _texts(deltas) == "thinking "
    deltas = p.push('call>{"name": "add", "arguments": {"a": 1, "b": 2}}'
                    "</tool_call>")
    calls = _calls(deltas)
    assert len(calls) == 1 and calls[0]["function"]["name"] == "add"


def test_stream_parser_unterminated_marker_flushes_as_content():
    p = StreamingToolParser(NAMES)
    out = p.push("see <tool_")
    out += p.finish()
    assert _texts(out) == "see <tool_"
    assert _calls(out) == []


def test_stream_parser_bare_json_undeclared_is_content():
    deltas = feed(StreamingToolParser(NAMES),
                  ['{"name": "Al', 'ice", "age": 30}', " hi"])
    assert _calls(deltas) == []
    assert _texts(deltas) == '{"name": "Alice", "age": 30} hi'


def test_stream_parser_bare_json_call():
    deltas = feed(StreamingToolParser(NAMES),
                  ['{"name": "add", "argu', 'ments": {"a": 1, "b": 2}}'])
    calls = _calls(deltas)
    assert len(calls) == 1
    assert json.loads(calls[0]["function"]["arguments"]) == {"a": 1, "b": 2}
    assert _texts(deltas) == ""


def test_stream_parser_mistral_marker():
    deltas = feed(StreamingToolParser(NAMES),
                  ["[TOOL_", 'CALLS] [{"name": "add", ',
                   '"arguments": {"a": 3, "b": 4}}]'])
    calls = _calls(deltas)
    assert len(calls) == 1 and calls[0]["function"]["name"] == "add"


def test_stream_parser_two_blocks_indexed():
    text = ('<tool_call>{"name": "add", "arguments": {"a": 1, "b": 2}}'
            '</tool_call><tool_call>{"name": "add", '
            '"arguments": {"a": 3, "b": 4}}</tool_call>')
    deltas = feed(StreamingToolParser(NAMES), [text])
    calls = _calls(deltas)
    assert [c["index"] for c in calls] == [0, 1]


# -- streaming over HTTP ----------------------------------------------------

class CharTokenizer:
    """Printable-ASCII char-level tokenizer (id == ord(char)) so guided
    decoding can spell real JSON and incremental detokenization is
    id-driven."""
    eos_token_id = 0
    vocab_size = 512  # match the tiny model's logits width

    def encode(self, s):
        return [ord(c) for c in s if 32 <= ord(c) < 127][:32]

    def decode(self, ids):
        return "".join(chr(i) for i in ids if 32 <= i < 127)

    def get_vocab(self):
        return {chr(i): i for i in range(32, 127)}

    def convert_tokens_to_string(self, toks):
        return "".join(toks)

    def apply_chat_template(self, messages, tokenize=True,
                            add_generation_prompt=True, tools=None):
        text = " ".join(m["content"] for m in messages)
        return self.encode(text)


async def _collect_sse(r):
    deltas, finish = [], None
    async for line in r.content:
        line = line.decode().strip()
        if not line.startswith("data: ") or line == "data: [DONE]":
            continue
        ch = json.loads(line[6:])["choices"][0]
        deltas.append(ch["delta"])
        if ch["finish_reason"]:
            finish = ch["finish_reason"]
    return deltas, finish


def test_chat_tools_streaming_forced_call():
    """stream=true + named tool_choice: the grammar-forced JSON call is
    emitted as a tool_calls delta and finish_reason == tool_calls
    (reference streams tool deltas; round-2 rejected this with a 400)."""
    async def body(client):
        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "add 1 and 2"}],
            "tools": TOOLS, "stream": True, "max_tokens": 200,
            "tool_choice": {"type": "function", "function": {"name": "add"}}})
        assert r.status == 200
        deltas, finish = await _collect_sse(r)
        assert finish == "tool_calls"
        calls = [d["tool_calls"][0] for d in deltas if "tool_calls" in d]
        assert len(calls) == 1
        assert calls[0]["function"]["name"] == "add"
        args = json.loads(calls[0]["function"]["arguments"])
        assert set(args) == {"a", "b"}

    _run(make_server(CharTokenizer()), body)


def test_chat_tools_streaming_plain_content_reassembles():
    """Tools declared but the model speaks prose: streamed content must
    reassemble to the non-streaming text and finish normally."""
    async def body(client):
        req = {"messages": [{"role": "user", "content": "hello there"}],
               "tools": TOOLS, "max_tokens": 12, "temperature": 0.0}
        r = await client.post("/v1/chat/completions", json=req)
        want = (await r.json())["choices"][0]["message"]["content"] or ""
        r = await client.post("/v1/chat/completions",
                              json={**req, "stream": True})
        assert r.status == 200
        deltas, finish = await _collect_sse(r)
        got = "".join(d.get("content", "") for d in deltas)
        assert got == want
        assert finish != "tool_calls"

    _run(make_server(CharTokenizer()), body)
