"""Layer-skip (self-speculative) draft experiment on the medium-2k model:
draft = first L_d layers of the target (sliced stacked params, shared
lm_head/final_norm), optionally with a KV window. Measures acceptance and
e2e tok/s vs AR."""
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import load_trained, induction_prompts
from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig, SpeculativeConfig)
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.sampling_params import SamplingParams

cfg, params, train_seq = load_trained("induction_medium_v*")
B = 32
PROMPT, MT = 512, 1504
prompts = induction_prompts(B, PROMPT, cfg.vocab_size)
ROUNDS, K = 8, 8


def run(spec, dparams=None, label=""):
    per_call = (K + 1) * ROUNDS if spec else ROUNDS * 4
    sched = SchedulerConfig(max_num_seqs=B,
                            max_model_len=PROMPT + MT + 8 * per_call,
                            prefill_chunk_size=512,
                            max_num_batched_tokens=4096,
                            decode_batch_buckets=(B,),
                            prefill_token_buckets=(256, 512, 1024),
                            steps_per_decode_call=1 if spec else ROUNDS * 4)
    ec = EngineConfig(model=cfg, cache=CacheConfig(page_size=128),
                      scheduler=sched, speculative=spec)

    def drive():
        eng = LLMEngine(ec, params, draft_params=dparams)
        for p in prompts:
            eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=MT,
                                              ignore_eos=True))
        outs = {}
        t0 = time.perf_counter()
        while eng.has_unfinished_requests():
            for o in eng.step():
                if o.finished:
                    outs[o.request_id] = o.output_token_ids
        return time.perf_counter() - t0, outs, eng

    drive()  # warmup (compiles at every ctx depth)
    wall, outs, eng = drive()
    n = sum(len(v) for v in outs.values())
    m = eng.spec_metrics.summary() if spec else None
    print(f"{label}: {n/wall:.1f} tok/s ({wall:.2f}s) metrics={m}",
          flush=True)
    return n / wall, outs


ar_tps, ar_out = run(None, label="AR")

for L_d, window in ((4, 192), (3, 192), (4, None)):
    dcfg = ModelConfig(**{**cfg.__dict__, "num_layers": L_d,
                          "sliding_window": window,
                          "sliding_window_pattern": 1})
    dparams = {**params,
               "layers": jax.tree.map(lambda a: a[:L_d], params["layers"])}
    spec = SpeculativeConfig(num_speculative_tokens=K, rounds_per_step=ROUNDS,
                             method="qspec", draft_scheme="w4a8",
                             draft_model=dcfg)
    tps, outs = run(spec, dparams, label=f"layerskip L={L_d} win={window}")
    mism = sum(1 for r in outs if outs[r] != ar_out.get(r))
    print(f"  vs_baseline {tps/ar_tps:.3f}  mismatches(vs fast AR) {mism}",
          flush=True)
