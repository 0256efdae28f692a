import os; os.environ["JAX_PLATFORMS"]="cpu"
import jax; jax.config.update("jax_platforms","cpu")
import numpy as np
from qspec_tpu.config import *
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.models.llama import init_params
from qspec_tpu.sampling_params import SamplingParams

mc = ModelConfig.tiny(quant="w4", vocab_size=8192)
params = init_params(mc, seed=0)
sched = SchedulerConfig(max_num_seqs=4, max_model_len=256, prefill_chunk_size=64,
                        decode_batch_buckets=(4,), prefill_token_buckets=(64,))
r = np.random.default_rng(3)
ps = [list(map(int, r.integers(1, 8000, size=30))) for _ in range(4)]
for scheme in ["w4a4", "w4a8"]:
    cfg = EngineConfig(model=mc, cache=CacheConfig(page_size=16), scheduler=sched,
                       speculative=SpeculativeConfig(num_speculative_tokens=3,
                                                     draft_scheme=scheme))
    eng = LLMEngine(cfg, params)
    for p in ps:
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True))
    while eng.has_unfinished_requests():
        eng.step()
    print(scheme, eng.spec_metrics.summary(), flush=True)
