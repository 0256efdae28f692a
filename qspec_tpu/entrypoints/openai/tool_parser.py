"""OpenAI tool-calling support: prompt injection + tool-call extraction.

TPU-redesign notes vs the reference (vllm/entrypoints/openai/tool_parsers/):
the reference ships ~2.7k LoC of per-model streaming parsers (hermes,
llama, mistral, granite, jamba, pythonic ...). Here the serving surface is
one engine, so we keep ONE canonical wire format — the hermes-style
``<tool_call>{"name": ..., "arguments": {...}}</tool_call>`` block — plus a
permissive extractor that also accepts the two other shapes trained models
commonly emit (a bare JSON object, and mistral's ``[TOOL_CALLS]`` array).
Where the reference can only *hope* the model emits parseable JSON, forced
tool choice here rides the grammar-guided decoder (qspec_tpu/guided/): a
JSON-schema token FSM constrains generation so the arguments are valid by
construction (reference analogue: guided_decoding + tool_choice=named,
vllm/entrypoints/openai/serving_chat.py).
"""

from __future__ import annotations

import json
import uuid
from typing import List, Optional, Tuple

TOOL_CALL_OPEN = "<tool_call>"
TOOL_CALL_CLOSE = "</tool_call>"
MISTRAL_MARK = "[TOOL_CALLS]"

SYSTEM_TEMPLATE = (
    "You have access to the following tools. To call a tool, respond with\n"
    '<tool_call>{{"name": <tool-name>, "arguments": <args-json>}}</tool_call>\n'
    "Available tools:\n{tools}"
)


def tools_system_message(tools: List[dict]) -> dict:
    """A system message describing `tools` in the canonical wire format —
    the fallback when the tokenizer's chat template has no native `tools=`
    support (HF tool-capable templates are preferred when present)."""
    specs = [json.dumps(t.get("function", t), separators=(",", ":"))
             for t in tools]
    return {"role": "system",
            "content": SYSTEM_TEMPLATE.format(tools="\n".join(specs))}


def forced_call_schema(tools: List[dict],
                       name: Optional[str] = None) -> dict:
    """JSON schema for a guided (grammar-constrained) tool call.

    name=None -> any of the listed tools (tool_choice="required");
    name=str  -> exactly that tool (named tool_choice). The schema feeds
    SamplingParams.guided_json, so the emitted call parses by construction.
    """
    def one(t):
        fn = t.get("function", t)
        return {"type": "object",
                "properties": {"name": {"const": fn["name"]},
                               "arguments": fn.get("parameters",
                                                   {"type": "object"})},
                "required": ["name", "arguments"]}

    picked = [t for t in tools
              if name is None or t.get("function", t).get("name") == name]
    if not picked:
        raise ValueError(f"tool_choice names unknown tool {name!r}")
    if len(picked) == 1:
        return one(picked[0])
    return {"anyOf": [one(t) for t in picked]}


def _call_payload(obj: dict) -> Optional[dict]:
    """Normalize one parsed JSON object into an OpenAI tool_call entry."""
    if not isinstance(obj, dict) or "name" not in obj:
        return None
    args = obj.get("arguments", obj.get("parameters", {}))
    if isinstance(args, str):
        arg_str = args
    else:
        arg_str = json.dumps(args, separators=(",", ":"))
    return {"id": f"call_{uuid.uuid4().hex[:24]}", "type": "function",
            "function": {"name": str(obj["name"]), "arguments": arg_str}}


def _scan_json_objects(text: str) -> List[Tuple[int, int, object]]:
    """All top-level JSON values starting at '{' or '[' in `text`, found by
    raw_decode scanning (tolerates surrounding prose)."""
    dec = json.JSONDecoder()
    out = []
    i = 0
    while i < len(text):
        ch = text[i]
        if ch in "{[":
            try:
                val, end = dec.raw_decode(text, i)
            except ValueError:
                i += 1
                continue
            out.append((i, end, val))
            i = end
        else:
            i += 1
    return out


def parse_tool_calls(text: str) -> Tuple[Optional[str], List[dict]]:
    """Extract tool calls from generated text.

    Returns (content, tool_calls): content is the non-tool prose (None if
    the whole message was tool calls), tool_calls the OpenAI-format list.
    Accepted shapes: <tool_call>..</tool_call> blocks (canonical),
    [TOOL_CALLS] [..] (mistral), or bare JSON object(s) carrying
    name+arguments (llama-3 style / guided output).
    """
    calls: List[dict] = []
    content_parts: List[str] = []

    if TOOL_CALL_OPEN in text:
        rest = text
        while TOOL_CALL_OPEN in rest:
            pre, _, tail = rest.partition(TOOL_CALL_OPEN)
            content_parts.append(pre)
            body, sep, rest = tail.partition(TOOL_CALL_CLOSE)
            if not sep:           # unterminated block: try to parse anyway
                rest = ""
            try:
                c = _call_payload(json.loads(body.strip()))
                if c:
                    calls.append(c)
            except ValueError:
                content_parts.append(body)
        content_parts.append(rest)
    elif MISTRAL_MARK in text:
        pre, _, tail = text.partition(MISTRAL_MARK)
        content_parts.append(pre)
        for _s, _e, val in _scan_json_objects(tail):
            vals = val if isinstance(val, list) else [val]
            for v in vals:
                c = _call_payload(v)
                if c:
                    calls.append(c)
            break                 # the marker owns exactly one JSON value
    else:
        # bare JSON object(s): only treat as calls when they carry the
        # name+arguments shape, otherwise the text is plain content
        spans = []
        for s, e, val in _scan_json_objects(text):
            c = _call_payload(val)
            if c:
                calls.append(c)
                spans.append((s, e))
        if calls:
            last = 0
            for s, e in spans:
                content_parts.append(text[last:s])
                last = e
            content_parts.append(text[last:])
        else:
            content_parts.append(text)

    content = "".join(content_parts).strip()
    return (content or None), calls
