"""Latency benchmark (reference: benchmarks/benchmark_latency.py — 32 input /
128 output tokens, fixed batch, mean/median/p99 end-to-end latency)."""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="1b")
    ap.add_argument("--input-len", type=int, default=32)
    ap.add_argument("--output-len", type=int, default=128)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--num-iters", type=int, default=5)
    ap.add_argument("--num-iters-warmup", type=int, default=1)
    ap.add_argument("--num-speculative-tokens", type=int, default=0)
    args = ap.parse_args()

    import sys
    sys.path.insert(0, ".")
    from bench import build
    from qspec_tpu.config import (CacheConfig, EngineConfig, SchedulerConfig,
                                  SpeculativeConfig)
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.models.llama import init_params_device
    from qspec_tpu.sampling_params import SamplingParams

    cfg = build(args.model)
    params = init_params_device(cfg, seed=0)
    spec = SpeculativeConfig(num_speculative_tokens=args.num_speculative_tokens,
                             rounds_per_step=4, draft_scheme="w4a8") \
        if args.num_speculative_tokens else None
    ec = EngineConfig(
        model=cfg, cache=CacheConfig(page_size=16),
        scheduler=SchedulerConfig(
            max_num_seqs=args.batch_size,
            max_model_len=args.input_len + args.output_len + 64,
            decode_batch_buckets=(args.batch_size,),
            steps_per_decode_call=1 if spec else 16),
        speculative=spec)

    rng = np.random.default_rng(0)

    def run_once(eng):
        for _ in range(args.batch_size):
            eng.add_request(list(map(int, rng.integers(1, 30000, args.input_len))),
                            SamplingParams(temperature=0.0,
                                           max_tokens=args.output_len,
                                           ignore_eos=True))
        t0 = time.perf_counter()
        while eng.has_unfinished_requests():
            eng.step()
        return time.perf_counter() - t0

    lat = []
    for i in range(args.num_iters_warmup + args.num_iters):
        eng = LLMEngine(ec, params)
        t = run_once(eng)
        if i >= args.num_iters_warmup:
            lat.append(t)
    lat = np.array(lat)
    print(json.dumps({
        "avg_latency_s": round(float(lat.mean()), 3),
        "median_latency_s": round(float(np.median(lat)), 3),
        "p99_latency_s": round(float(np.percentile(lat, 99)), 3),
        "tokens_per_s": round(args.batch_size * args.output_len / float(lat.mean()), 1),
    }))


if __name__ == "__main__":
    main()
