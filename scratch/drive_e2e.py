"""E2E drive: use qspec_tpu as a user would — tiny model, CPU, both modes."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
from qspec_tpu.config import EngineConfig, ModelConfig, CacheConfig, SchedulerConfig, SpeculativeConfig
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.models.llama import init_params
from qspec_tpu.sampling_params import SamplingParams

mc = ModelConfig.tiny(quant="w4")
params = init_params(mc, seed=0)
sched = SchedulerConfig(max_num_seqs=4, max_model_len=256, prefill_chunk_size=64,
                        decode_batch_buckets=(2, 4), prefill_token_buckets=(64,))

prompts = [list(np.random.default_rng(i).integers(1, 500, size=np.random.default_rng(i).integers(5, 30))) for i in range(4)]

def run(spec):
    cfg = EngineConfig(model=mc, cache=CacheConfig(page_size=16), scheduler=sched,
                       speculative=spec)
    eng = LLMEngine(cfg, params)
    for p in prompts:
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=20))
    outs = {}
    steps = 0
    while eng.has_unfinished_requests():
        for o in eng.step():
            outs[o.request_id] = o.output_token_ids
        steps += 1
        assert steps < 500, "engine did not converge"
    return outs, eng

print("=== autoregressive w4a16 ===", flush=True)
ar, _ = run(None)
for k in sorted(ar):
    print(k, ar[k], flush=True)

print("=== qspec draft+verify (k=3) ===", flush=True)
sp, eng = run(SpeculativeConfig(num_speculative_tokens=3))
for k in sorted(sp):
    print(k, sp[k], flush=True)
print("spec metrics:", eng.spec_metrics.summary(), flush=True)

match = all(ar[k] == sp[k] for k in ar)
print("GREEDY INVARIANT (spec == AR):", "PASS" if match else "FAIL", flush=True)
if not match:
    for k in ar:
        if ar[k] != sp[k]:
            print("MISMATCH", k, "\n ar:", ar[k], "\n sp:", sp[k])
