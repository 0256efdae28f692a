import os; os.environ["JAX_PLATFORMS"]="cpu"
import numpy as np
from qspec_tpu.config import *
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.models.llama import init_params
from qspec_tpu.sampling_params import SamplingParams

mc = ModelConfig.tiny(quant="w4")
params = init_params(mc, seed=0)
sched = SchedulerConfig(max_num_seqs=2, max_model_len=64, prefill_chunk_size=32,
                        decode_batch_buckets=(2,), prefill_token_buckets=(32,))
cfg = EngineConfig(model=mc, cache=CacheConfig(page_size=16), scheduler=sched,
                   speculative=SpeculativeConfig(num_speculative_tokens=2))
eng = LLMEngine(cfg, params, eos_token_id=7)

# probe 1: prompt longer than max_model_len -> clean abort
rid_long = eng.add_request(list(range(1, 200)), SamplingParams(max_tokens=5))
# probe 2: temperature sampling + stop tokens + eos
rid_t = eng.add_request([5, 6, 8], SamplingParams(temperature=0.8, top_k=40, top_p=0.9, max_tokens=30))
# probe 3: max_tokens=1 edge
rid_1 = eng.add_request([9, 10], SamplingParams(temperature=0.0, max_tokens=1))
# probe 4: more requests than max_num_seqs (queueing)
extra = [eng.add_request([11+i, 3], SamplingParams(temperature=0.0, max_tokens=8)) for i in range(4)]

outs = {}
steps = 0
while eng.has_unfinished_requests():
    for o in eng.step():
        outs[o.request_id] = o
    steps += 1
    assert steps < 400
print("steps:", steps)
for k in sorted(outs):
    o = outs[k]
    print(k, "len", len(o.output_token_ids), "reason", o.finish_reason)
assert outs[rid_long].finish_reason == "prompt_too_long" and outs[rid_long].output_token_ids == []
assert len(outs[rid_1].output_token_ids) == 1
assert all(len(outs[r].output_token_ids) <= 8 for r in extra)
print("PROBES PASS")
