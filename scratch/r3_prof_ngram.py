"""Profile one ngram verify round + AR steps at long ctx on the medium-2k
checkpoint; dump an xprof trace and per-call timings."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import load_trained, induction_prompts
from qspec_tpu.config import (CacheConfig, EngineConfig, SchedulerConfig,
                              SpeculativeConfig)
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.engine.model_runner import make_sampling_tensors
from qspec_tpu.sampling_params import SamplingParams

cfg, params, train_seq = load_trained("induction_medium_v*")
B = 32
PROMPT = 1536  # measure at deep ctx directly

prompts = induction_prompts(B, PROMPT, cfg.vocab_size)


def build(spec):
    sched = SchedulerConfig(max_num_seqs=B, max_model_len=2048,
                            prefill_chunk_size=512,
                            max_num_batched_tokens=4096,
                            decode_batch_buckets=(B,),
                            prefill_token_buckets=(512,),
                            steps_per_decode_call=16)
    ec = EngineConfig(model=cfg, cache=CacheConfig(page_size=128),
                      scheduler=sched, speculative=spec)
    eng = LLMEngine(ec, params)
    for p in prompts:
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=256,
                                          ignore_eos=True))
    while any(s.num_computed_tokens < len(s.prompt_token_ids)
              for s in list(eng.scheduler.waiting) + eng.scheduler.running):
        eng.step()
        if not eng.scheduler.waiting and all(
                s.num_computed_tokens >= len(s.prompt_token_ids) - 1
                for s in eng.scheduler.running):
            break
    return eng


def timeit(fn, n=5, label=""):
    walls = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    print(f"{label}: {[f'{w*1000:.1f}' for w in walls]} ms", flush=True)
    return min(walls)


# AR
eng = build(None)
seqs = eng.scheduler.running
st = make_sampling_tensors(seqs, cfg.vocab_size, None)
r = eng.runner
w = timeit(lambda: r.run_decode(seqs, st, num_steps=16),
           label="AR 16-step call")
print(f"AR per step {w/16*1000:.2f} ms", flush=True)

# ngram rounds=1 and rounds=4
for rounds in (1, 4):
    spec = SpeculativeConfig(num_speculative_tokens=12, rounds_per_step=rounds,
                             method="ngram", ngram_prompt_lookup_max=4)
    eng2 = build(spec)
    seqs2 = eng2.scheduler.running
    st2 = make_sampling_tensors(seqs2, cfg.vocab_size, None)
    r2 = eng2.runner
    for s in seqs2:
        eng2.block_manager.append_slots(s, lookahead=16 * rounds)
    w = timeit(lambda: r2.run_ngram_rounds(seqs2, st2, chain=1),
               label=f"ngram {rounds}-round call")
    print(f"ngram per round {w/rounds*1000:.2f} ms", flush=True)

# xprof trace of 3 ngram calls
import jax
with jax.profiler.trace("/tmp/xprof_ngram"):
    for _ in range(3):
        r2.run_ngram_rounds(seqs2, st2, chain=1)
print("trace written to /tmp/xprof_ngram", flush=True)
