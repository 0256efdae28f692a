"""Offline throughput benchmark (reference: benchmarks/benchmark_throughput.py
— N prompts with sampled lengths, dynamic continuous batching, tokens/s)."""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="1b")
    ap.add_argument("--num-prompts", type=int, default=32)
    ap.add_argument("--input-len-mean", type=int, default=256)
    ap.add_argument("--output-len-mean", type=int, default=64)
    ap.add_argument("--max-num-seqs", type=int, default=8)
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
    rng = np.random.default_rng(0)
    reqs = []
    for _ in range(args.num_prompts):
        ilen = max(8, int(rng.normal(args.input_len_mean, args.input_len_mean / 4)))
        olen = max(4, int(rng.normal(args.output_len_mean, args.output_len_mean / 4)))
        reqs.append((list(map(int, rng.integers(1, 30000, ilen))), olen))
    max_len = max(i and len(p) + o for p, o in reqs for i in [1]) + 64

    spec = SpeculativeConfig(num_speculative_tokens=args.num_speculative_tokens,
                             rounds_per_step=4, draft_scheme="w4a8") \
        if args.num_speculative_tokens else None
    ec = EngineConfig(
        model=cfg, cache=CacheConfig(page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=args.max_num_seqs,
                                  max_model_len=max_len,
                                  decode_batch_buckets=(args.max_num_seqs,),
                                  steps_per_decode_call=1 if spec else 16),
        speculative=spec)

    # warmup compile
    weng = LLMEngine(ec, params)
    weng.add_request(reqs[0][0], SamplingParams(temperature=0.0, max_tokens=2,
                                                ignore_eos=True))
    while weng.has_unfinished_requests():
        weng.step()

    eng = LLMEngine(ec, params)
    for p, o in reqs:
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=o,
                                          ignore_eos=True))
    t0 = time.perf_counter()
    total_out = 0
    while eng.has_unfinished_requests():
        for out in eng.step():
            if out.finished:
                total_out += len(out.output_token_ids)
    wall = time.perf_counter() - t0
    total_in = sum(len(p) for p, _ in reqs)
    print(json.dumps({
        "requests_per_s": round(args.num_prompts / wall, 2),
        "output_tokens_per_s": round(total_out / wall, 1),
        "total_tokens_per_s": round((total_in + total_out) / wall, 1),
        "wall_s": round(wall, 1),
    }))


if __name__ == "__main__":
    main()
