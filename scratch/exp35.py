"""exp35: ngram acceptance at longer horizons (does greedy cycle?)."""
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
N, PLEN, MAXTOK = 8, 700, 256
prompts = [list(map(int, rng.integers(1, 30000, size=PLEN))) for _ in range(N)]

def run(spec, tag):
    sched = SchedulerConfig(max_num_seqs=8, max_model_len=PLEN + MAXTOK + 96,
                            prefill_chunk_size=512, decode_batch_buckets=(8,),
                            prefill_token_buckets=(512, 1024),
                            steps_per_decode_call=32)
    ec = EngineConfig(model=cfg, cache=CacheConfig(page_size=128),
                      scheduler=sched, speculative=spec)
    eng = LLMEngine(ec, params)
    for p in prompts:
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=MAXTOK,
                                          ignore_eos=True))
    outs = {}
    t0 = time.perf_counter()
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.output_token_ids
    wall = time.perf_counter() - t0
    ntok = sum(len(v) for v in outs.values())
    m = eng.spec_metrics.summary() if spec else None
    print(f"{tag}: {ntok/wall:.1f} tok/s ({ntok} in {wall:.2f}s) {m}", flush=True)
    return outs

ar = run(None, "AR (cold-compile incl.)")
# cycle analysis on AR outputs
for r, toks in sorted(ar.items())[:4]:
    t = toks
    per = None
    for p in range(2, 33):
        if len(t) > 2 * p and t[-p:] == t[-2*p:-p]:
            per = p; break
    print(f"  seq {r}: len {len(t)} cycle_period={per} tail={t[-12:]}")
ng = run(SpeculativeConfig(num_speculative_tokens=4, method="ngram",
                           rounds_per_step=8), "ngram spec")
