"""exp34: on-TPU greedy invariant via the null-proposer oracle + ngram perf.

Runs the 8B engine three ways on the same prompts (greedy):
  AR (fast multi-step), null-oracle (AR through the ngram executable),
  ngram spec. Invariant: null == ngram transcripts BIT-EXACT (same compiled
  program). Also reports tok/s for each.
"""
import time
import numpy as np
import jax

from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig, SpeculativeConfig)
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.models.llama import init_params_device
from qspec_tpu.sampling_params import SamplingParams

cfg = ModelConfig.llama3_8b(quant="w4")
params = init_params_device(cfg, 0)
jax.device_get(jax.tree.leaves(params)[0][:1])
print("params ready", flush=True)

rng = np.random.default_rng(0)
N, PLEN, MAXTOK = 8, 700, 64
prompts = [list(map(int, rng.integers(1, 30000, size=PLEN))) for _ in range(N)]


def run(spec, tag, steps_per_call=16):
    sched = SchedulerConfig(max_num_seqs=8, max_model_len=PLEN + MAXTOK + 64,
                            prefill_chunk_size=512,
                            decode_batch_buckets=(8,),
                            prefill_token_buckets=(512, 1024),
                            steps_per_decode_call=steps_per_call)
    ec = EngineConfig(model=cfg, cache=CacheConfig(page_size=128),
                      scheduler=sched, speculative=spec)
    eng = LLMEngine(ec, params)
    for p in prompts:
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=MAXTOK,
                                          ignore_eos=True))
    # warmup pass compiles; then timed pass
    while eng.has_unfinished_requests():
        eng.step()
    eng2 = LLMEngine(ec, params)
    for p in prompts:
        eng2.add_request(p, SamplingParams(temperature=0.0, max_tokens=MAXTOK,
                                           ignore_eos=True))
    outs = {}
    t0 = time.perf_counter()
    while eng2.has_unfinished_requests():
        for o in eng2.step():
            if o.finished:
                outs[o.request_id] = o.output_token_ids
    wall = time.perf_counter() - t0
    ntok = sum(len(v) for v in outs.values())
    m = eng2.spec_metrics.summary() if spec else None
    print(f"{tag}: {ntok/wall:.1f} tok/s ({ntok} in {wall:.2f}s) {m}", flush=True)
    return outs


ar = run(None, "AR multi-step")
null = run(SpeculativeConfig(num_speculative_tokens=4, method="null",
                             rounds_per_step=8), "null-oracle")
ng = run(SpeculativeConfig(num_speculative_tokens=4, method="ngram",
                           rounds_per_step=8), "ngram spec")

mm_no = sum(1 for r in ng if ng[r] != null.get(r))
mm_na = sum(1 for r in null if null[r] != ar.get(r))
print(f"ngram vs null-oracle mismatches: {mm_no}/{len(ng)}  "
      f"(THE invariant: same executable)", flush=True)
print(f"null-oracle vs fast-AR mismatches: {mm_na}/{len(null)}  "
      f"(cross-executable shape numerics)", flush=True)
