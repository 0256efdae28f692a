import os
os.environ["JAX_PLATFORMS"]="cpu"
import jax; jax.config.update("jax_platforms","cpu")
import numpy as np
from qspec_tpu.config import *
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.models.llama import init_params
from qspec_tpu.sampling_params import SamplingParams

mc = ModelConfig.tiny(quant="w4")
params = init_params(mc, seed=0)
sched = SchedulerConfig(max_num_seqs=4, max_model_len=256, prefill_chunk_size=64,
                        decode_batch_buckets=(2,4), prefill_token_buckets=(64,))
r = np.random.default_rng(7)
ps = [list(map(int, r.integers(1, 500, size=int(r.integers(5, 40))))) for _ in range(4)]

def run(spec, tag):
    cfg = EngineConfig(model=mc, cache=CacheConfig(page_size=16), scheduler=sched,
                       speculative=spec)
    eng = LLMEngine(cfg, params)
    for p in ps:
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=20))
    outs = {}
    step = 0
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished: outs[o.request_id] = o.output_token_ids
        step += 1
        if step < 12:
            print(tag, "after step", step, {s.seq_id: list(s.output_token_ids) for s in eng.scheduler.running if s.seq_id == 0})
    return outs

ar = run(None, "AR")
sp = run(SpeculativeConfig(num_speculative_tokens=3, rounds_per_step=4), "SP4")
for k in ar:
    print(k, "match" if ar[k]==sp[k] else f"DIFF\n ar={ar[k]}\n sp={sp[k]}")
