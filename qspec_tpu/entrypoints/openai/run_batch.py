"""Offline OpenAI Batch-API runner (reference:
vllm/entrypoints/openai/run_batch.py).

Input: a JSONL file where each line is an OpenAI batch request:

    {"custom_id": "req-1", "method": "POST", "url": "/v1/chat/completions",
     "body": {"messages": [...], "max_tokens": 16}}

Supported endpoints: /v1/chat/completions, /v1/completions, /v1/embeddings.
Output: a JSONL file of batch outputs:

    {"id": "qspec-batch-...", "custom_id": "req-1",
     "response": {"status_code": 200, "body": {...}}, "error": null}

All requests are submitted concurrently; the engine's continuous batching
does the scheduling (the reference's design: the batch runner is just a
client of the serving layer).

    python -m qspec_tpu.entrypoints.openai.run_batch -i in.jsonl -o out.jsonl \
        --model <dir-or-preset> [engine flags]
"""

from __future__ import annotations

import argparse
import asyncio
import json
import uuid


async def run_request(client, line: str):
    try:
        req = json.loads(line)
    except json.JSONDecodeError as e:
        return {"id": f"qspec-batch-{uuid.uuid4().hex[:16]}", "custom_id": None,
                "response": None,
                "error": {"message": f"invalid JSON: {e}"}}
    url = req.get("url", "")
    out = {"id": f"qspec-batch-{uuid.uuid4().hex[:16]}",
           "custom_id": req.get("custom_id"), "response": None, "error": None}
    if req.get("method", "POST") != "POST" or url not in (
            "/v1/chat/completions", "/v1/completions", "/v1/embeddings"):
        out["error"] = {"message": f"unsupported method/url "
                        f"{req.get('method')} {url}"}
        return out
    resp = await client.post(url, json=req.get("body") or {})
    body = await resp.json()
    out["response"] = {"status_code": resp.status, "body": body}
    if resp.status != 200:
        out["error"] = {"message": body.get("reason") or str(body)}
    return out


async def run_batch(server, input_path: str, output_path: str) -> int:
    """Run every request in input_path against an in-process server;
    returns the number of successful responses."""
    from aiohttp.test_utils import TestClient, TestServer

    with open(input_path) as f:
        lines = [ln for ln in f.read().splitlines() if ln.strip()]

    async with TestClient(TestServer(server.app())) as client:
        results = await asyncio.gather(*(run_request(client, ln)
                                         for ln in lines))
    ok = sum(1 for r in results
             if r["response"] and r["response"]["status_code"] == 200)
    with open(output_path, "w") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")
    return ok


def main(argv=None):
    from qspec_tpu.engine.arg_utils import EngineArgs
    from qspec_tpu.entrypoints.openai.api_server import build_server

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-i", "--input-file", required=True)
    ap.add_argument("-o", "--output-file", required=True)
    EngineArgs.add_cli_args(ap)
    args = ap.parse_args(argv)

    engine_args = EngineArgs.from_cli_args(args)
    server = build_server(engine_args, model_name=args.model or "qspec")
    ok = asyncio.run(run_batch(server, args.input_file, args.output_file))
    print(f"wrote {args.output_file}: {ok} ok")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
