"""Online serving benchmark (reference: benchmarks/benchmark_serving.py —
fixed-QPS Poisson arrivals against the OpenAI HTTP server, TTFT/TPOT/ITL)."""

from __future__ import annotations

import argparse
import asyncio
import json
import time

import numpy as np


async def run(args):
    from aiohttp.test_utils import TestClient, TestServer

    import sys
    sys.path.insert(0, ".")
    from bench import build
    from qspec_tpu.engine.arg_utils import EngineArgs
    from qspec_tpu.entrypoints.openai.api_server import build_server
    from qspec_tpu.models.llama import init_params_device

    class TokTokenizer:
        eos_token_id = None

        def encode(self, s):
            return [int(x) for x in s.split()]

        def decode(self, ids):
            return " ".join(map(str, ids))

    cfg = build(args.model)
    params = init_params_device(cfg, seed=0)
    eargs = EngineArgs(model=args.model, max_model_len=args.input_len +
                       args.output_len + 64, max_num_seqs=args.max_num_seqs,
                       num_speculative_tokens=args.num_speculative_tokens or None)
    server = build_server(eargs, model_name=args.model, params=params,
                          tokenizer=TokTokenizer())
    client = TestClient(TestServer(server.app()))
    await client.start_server()

    rng = np.random.default_rng(0)
    results = []

    async def one_request(delay):
        await asyncio.sleep(delay)
        prompt = " ".join(map(str, rng.integers(1, 30000, args.input_len)))
        t0 = time.perf_counter()
        ttft = None
        n_chunks = 0
        r = await client.post("/v1/completions", json={
            "prompt": prompt, "max_tokens": args.output_len,
            "temperature": 0.0, "ignore_eos": True, "stream": True})
        async for line in r.content:
            line = line.decode().strip()
            if line.startswith("data: ") and line != "data: [DONE]":
                if ttft is None:
                    ttft = time.perf_counter() - t0
                n_chunks += 1
        e2e = time.perf_counter() - t0
        tpot = (e2e - ttft) / max(args.output_len - 1, 1) if ttft else 0
        results.append({"ttft": ttft, "e2e": e2e, "tpot": tpot})

    delays = np.cumsum(rng.exponential(1.0 / args.qps, args.num_prompts))
    t0 = time.perf_counter()
    await asyncio.gather(*(one_request(d) for d in delays))
    wall = time.perf_counter() - t0
    await client.close()

    ttfts = np.array([r["ttft"] for r in results if r["ttft"]])
    tpots = np.array([r["tpot"] for r in results])
    print(json.dumps({
        "qps_target": args.qps,
        "qps_achieved": round(args.num_prompts / wall, 2),
        "mean_ttft_s": round(float(ttfts.mean()), 3) if len(ttfts) else None,
        "p99_ttft_s": round(float(np.percentile(ttfts, 99)), 3) if len(ttfts) else None,
        "mean_tpot_s": round(float(tpots.mean()), 4),
        "output_tokens_per_s": round(args.num_prompts * args.output_len / wall, 1),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--num-prompts", type=int, default=16)
    ap.add_argument("--qps", type=float, default=2.0)
    ap.add_argument("--input-len", type=int, default=64)
    ap.add_argument("--output-len", type=int, default=32)
    ap.add_argument("--max-num-seqs", type=int, default=8)
    ap.add_argument("--num-speculative-tokens", type=int, default=0)
    args = ap.parse_args()
    asyncio.run(run(args))


if __name__ == "__main__":
    main()
