"""Why does a fused ngram round cost ~6x an AR step on the induction model?

Times the production executables directly with FIXED inputs (positions do
not advance across timing iterations, so shapes/ctx stay comparable):
  - multi_decode_step (32 steps/call) -> per-AR-step cost
  - ngram_rounds_step (8 rounds/call) at k in {12, 8, 4}, enable True/False
Run: python scratch/exp41_round_cost.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import load_induction, induction_prompts
from qspec_tpu.config import (CacheConfig, EngineConfig, SchedulerConfig,
                              SpeculativeConfig)
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.engine.model_runner import make_sampling_tensors, _pad_sampling
from qspec_tpu.sampling_params import SamplingParams

B = 4
PROMPT = 384
ROUNDS = 8


def build_engine(cfg, params, *, spec_method=None, k=12):
    sched = SchedulerConfig(max_num_seqs=B, max_model_len=1000,
                            prefill_chunk_size=512,
                            max_num_batched_tokens=4096,
                            decode_batch_buckets=(B,),
                            prefill_token_buckets=(256, 512, 1024),
                            steps_per_decode_call=32 if spec_method is None
                            else 1)
    spec = None
    if spec_method:
        spec = SpeculativeConfig(num_speculative_tokens=k,
                                 rounds_per_step=ROUNDS, method=spec_method)
    ec = EngineConfig(model=cfg, cache=CacheConfig(page_size=128),
                      scheduler=sched, speculative=spec)
    eng = LLMEngine(ec, params)
    prompts = induction_prompts(B, PROMPT, cfg.vocab_size)
    for p in prompts:
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=512,
                                          ignore_eos=True))
    while True:
        b = eng.scheduler.schedule()
        if b.kind != "prefill":
            break
        eng._run_prefill(b)
    return eng, b.seqs


def fixed_inputs(r, seqs):
    last = np.array([s.last_token() for s in seqs], np.int32)
    pos = np.array([s.num_tokens - 1 for s in seqs], np.int32)
    budget = np.full(B, 500, np.int32)
    tables = r._pad_block_tables([s.page_ids for s in seqs])
    return (jnp.asarray(last), jnp.asarray(pos), jnp.asarray(budget),
            jnp.asarray(tables))


def timeit(f, warmup=2, iters=10):
    for _ in range(warmup):
        jax.block_until_ready(f())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    cfg, params, train_seq = load_induction()
    assert cfg is not None
    print(f"platform={jax.default_backend()}")

    eng, seqs = build_engine(cfg, params, spec_method=None)
    st = _pad_sampling(make_sampling_tensors(seqs, cfg.vocab_size, None),
                       len(seqs), B)
    r = eng.runner
    last, pos, budget, tables = fixed_inputs(r, seqs)
    key = jax.random.PRNGKey(0)

    def ar_call():
        toks, lps, adv, r.cache = r.fns["multi_decode"](
            r.params, r.cache, last, pos, tables, budget, st, key, None)
        return toks
    t = timeit(ar_call)
    per_step = t / 32
    print(f"AR multi_decode(32): {t*1e3:.2f} ms/call -> "
          f"{per_step*1e6:.0f} us/step -> {B/per_step:.0f} tok/s")

    for k in (12, 4):
        eng, seqs = build_engine(cfg, params, spec_method="ngram", k=k)
        r = eng.runner
        st = _pad_sampling(make_sampling_tensors(seqs, cfg.vocab_size, None),
                           len(seqs), B)
        last, pos, budget, tables = fixed_inputs(r, seqs)
        # sync history rows once (mirrors run_ngram_rounds)
        for i, s in enumerate(seqs):
            toks = jnp.asarray(np.asarray(s.token_ids, np.int32))
            r._hist = r._hist.at[i, :len(s.token_ids)].set(toks)
        rows_d = jnp.asarray(np.arange(B, dtype=np.int32))
        hlen = jnp.asarray(np.array([s.num_tokens for s in seqs], np.int32))
        for enable in (True, False):
            en = jnp.asarray(bool(enable))

            def ng_call():
                toks, accs, lps, adv, r._hist, r.cache = r.fns["ngram_rounds"](
                    r.params, r.cache, r._hist, rows_d, hlen, last, pos,
                    tables, budget, en, st, key)
                return toks, accs
            t = timeit(ng_call)
            per_round = t / ROUNDS
            _, accs = jax.device_get(ng_call())
            acc_mean = float(np.mean(accs))
            print(f"ngram k={k} enable={enable}: {t*1e3:.2f} ms/call -> "
                  f"{per_round*1e6:.0f} us/round (= {per_round/per_step:.2f} "
                  f"AR steps) mean_acc={acc_mean:.2f} "
                  f"-> {B*acc_mean/per_round:.0f} tok/s")


if __name__ == "__main__":
    main()
