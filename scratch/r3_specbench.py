"""Device-level A/B: spec_rounds vs multi_decode per-call walls on the
medium checkpoint (B=32, ctx ~700 via a 700-token prompt)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import load_trained
from qspec_tpu.config import (CacheConfig, EngineConfig, SchedulerConfig,
                              SpeculativeConfig)
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.engine.model_runner import make_sampling_tensors
from qspec_tpu.sampling_params import SamplingParams

cfg, params, train_seq = load_trained("induction_medium_v*")
B = 32
PROMPT = 704

rng = np.random.default_rng(0)
prompts = []
for _ in range(B):
    period = int(rng.integers(16, 65))
    seg = rng.integers(2, cfg.vocab_size, size=period)
    prompts.append([int(x) for x in np.tile(seg, PROMPT // period + 1)[:PROMPT]])


def build(spec):
    sched = SchedulerConfig(max_num_seqs=B, max_model_len=1024,
                            prefill_chunk_size=512,
                            max_num_batched_tokens=4096,
                            decode_batch_buckets=(B,),
                            prefill_token_buckets=(192, 512),
                            steps_per_decode_call=16)
    ec = EngineConfig(model=cfg, cache=CacheConfig(page_size=128),
                      scheduler=sched, speculative=spec)
    eng = LLMEngine(ec, params)
    for p in prompts:
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=256,
                                          ignore_eos=True))
    # prefill only: step until all seqs are decoding (prompt done)
    while any(s.num_computed_tokens < len(s.prompt_token_ids)
              for s in list(eng.scheduler.waiting) + eng.scheduler.running):
        eng.step()
        if not eng.scheduler.waiting and all(
                s.num_computed_tokens >= len(s.prompt_token_ids) - 1
                for s in eng.scheduler.running):
            break
    return eng


def time_calls(fn, n=6, label=""):
    walls = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    w = sorted(walls)[1:-1]
    print(f"{label}: mean {np.mean(w)*1000:.2f} ms  walls="
          f"{[f'{x*1000:.1f}' for x in walls]}", flush=True)
    return float(np.mean(w))


# ---- AR baseline: fused 16-step decode call
eng = build(None)
seqs = eng.scheduler.running
st = make_sampling_tensors(seqs, cfg.vocab_size, None)
runner = eng.runner
w_ar = time_calls(lambda: runner.run_decode(seqs, st, num_steps=16),
                  label="AR fused 16-step call")
print(f"AR per step: {w_ar/16*1000:.3f} ms -> {w_ar/16/B*1e6:.2f} us/token",
      flush=True)

# ---- spec rounds variants
for scheme, window in (("w4a8", 192), ("w4a8", None), ("w4a16", 192)):
    spec = SpeculativeConfig(num_speculative_tokens=8, rounds_per_step=4,
                             draft_scheme=scheme, method="qspec",
                             draft_kv_window=window)
    eng2 = build(spec)
    seqs2 = eng2.scheduler.running
    st2 = make_sampling_tensors(seqs2, cfg.vocab_size, None)
    r2 = eng2.runner
    # ensure lookahead pages exist for 4 rounds * 9 tokens
    for s in seqs2:
        eng2.block_manager.append_slots(s, lookahead=64)

    def spec_call():
        return r2.run_spec_rounds(seqs2, st2, 8, num_rounds=4, chain=1)

    w_sp = time_calls(spec_call,
                      label=f"spec 4-round call ({scheme}, win={window})")
    toks, accs, lps = spec_call()
    em = accs.sum()
    print(f"  emitted/call={em} (/seq {em/len(seqs2):.1f})  "
          f"{w_sp/max(em,1)*1e6:.2f} us/token  per-round "
          f"{w_sp/4*1000:.2f} ms", flush=True)
