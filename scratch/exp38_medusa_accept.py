"""Isolate medusa serving acceptance: rotated-float vs int4 params.

If acceptance is high on rotated-float (bits=None) but low on int4, the
heads are quantization-fragile; if low on both, there's a train/serve
mismatch (indexing/basis bug)."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np

from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig, SpeculativeConfig)
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.model_loader.loader import quantize_float
from qspec_tpu.sampling_params import SamplingParams
from qspec_tpu.spec_decode.medusa import load_medusa

base = "/root/repo/checkpoints/induction_lm_v3"
import json
with open(base + ".json") as f:
    meta = json.load(f)
cfg0 = ModelConfig(**meta["cfg"])
sd = dict(np.load(base + ".npz"))

def run(bits, method, k):
    params, cfg = quantize_float(sd, cfg0, bits=bits)
    params = {**params, "medusa": load_medusa(
        "/root/repo/checkpoints/induction_medusa_v1.npz")}
    sched = SchedulerConfig(max_num_seqs=4, max_model_len=640,
                            prefill_chunk_size=256,
                            decode_batch_buckets=(4,),
                            prefill_token_buckets=(256,),
                            steps_per_decode_call=1)
    ec = EngineConfig(model=cfg, cache=CacheConfig(page_size=128),
                      scheduler=sched,
                      speculative=SpeculativeConfig(
                          num_speculative_tokens=k, rounds_per_step=4,
                          method=method))
    eng = LLMEngine(ec, params)
    rng = np.random.default_rng(0)
    for _ in range(4):
        period = int(rng.integers(16, 65))
        seg = rng.integers(2, cfg.vocab_size, size=period)
        p = [int(x) for x in np.tile(seg, 384 // period + 1)[:384]]
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=128,
                                          ignore_eos=True))
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.output_token_ids
    m = eng.spec_metrics
    print(f"bits={bits} method={method} k={k}: acceptance="
          f"{m.draft_acceptance_rate:.3f} rounds={m.num_spec_rounds} "
          f"emitted={m.num_emitted_tokens}", flush=True)
    return outs

run(None, "medusa", 7)
run(4, "medusa", 7)
run(None, "ngram", 7)
run(4, "ngram", 7)
