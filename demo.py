"""QSpec demo driver — mirror of the reference's demo.py workload
(/root/reference/demo.py:20-77): GSM8K-style few-shot prompts, greedy,
max_num_seqs=4, k=3 speculative tokens, throughput + acceptance printout.

Without network access there is no GSM8K download or tokenizer; prompts are
synthetic token sequences shaped like the 5-shot prefix (~700 tokens) unless
--model points at a real HF checkpoint directory with a tokenizer.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="1b")
    ap.add_argument("--num-speculative-tokens", type=int, default=3)
    ap.add_argument("--rounds-per-step", type=int, default=4)
    ap.add_argument("--max-num-seqs", type=int, default=4)
    ap.add_argument("--prompts", type=int, default=8)
    ap.add_argument("--prompt-len", type=int, default=700)
    ap.add_argument("--max-tokens", type=int, default=128)
    ap.add_argument("--no-spec", action="store_true")
    args = ap.parse_args()

    from bench import build, induction_prompts, load_induction
    from qspec_tpu.config import (CacheConfig, EngineConfig, SchedulerConfig,
                                  SpeculativeConfig)
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.engine.metrics import LoggingStatLogger
    from qspec_tpu.models.llama import init_params_device
    from qspec_tpu.sampling_params import SamplingParams

    if args.model == "induction":
        # REAL weights: the in-image-trained induction LM (see
        # benchmarks/train_induction.py and BENCH_NOTES.md)
        cfg, params, train_seq = load_induction()
        assert cfg is not None, "train it first: python benchmarks/train_induction.py"
        args.prompt_len = min(args.prompt_len, train_seq // 2)
        args.max_tokens = min(args.max_tokens, train_seq - args.prompt_len - 32)
    else:
        cfg = build(args.model)
        params = init_params_device(cfg, seed=0)

    spec = None if args.no_spec else SpeculativeConfig(
        num_speculative_tokens=args.num_speculative_tokens,
        rounds_per_step=args.rounds_per_step)
    max_len = args.prompt_len + args.max_tokens + 64
    ec = EngineConfig(
        model=cfg, cache=CacheConfig(page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=args.max_num_seqs,
                                  max_model_len=max_len,
                                  decode_batch_buckets=(args.max_num_seqs,),
                                  steps_per_decode_call=1 if spec else 16),
        speculative=spec)
    eng = LLMEngine(ec, params)
    eng.stat_loggers.append(LoggingStatLogger(interval_s=5.0))

    rng = np.random.default_rng(0)
    if args.model == "induction":
        prompts = induction_prompts(args.prompts, args.prompt_len,
                                    cfg.vocab_size)
    else:
        prompts = [list(map(int, rng.integers(1, min(cfg.vocab_size, 30000),
                                              size=args.prompt_len)))
                   for _ in range(args.prompts)]
    for toks in prompts:
        eng.add_request(toks, SamplingParams(temperature=0.0,
                                             max_tokens=args.max_tokens,
                                             ignore_eos=True))

    t0 = time.perf_counter()
    done = 0
    total_tokens = 0
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                done += 1
                total_tokens += len(o.output_token_ids)
    wall = time.perf_counter() - t0

    print(f"\n{done} requests, {total_tokens} output tokens in {wall:.1f}s "
          f"-> {total_tokens / wall:.2f} tok/s")
    if spec:
        print("spec metrics:", eng.spec_metrics.summary())


if __name__ == "__main__":
    main()
